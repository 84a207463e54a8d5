r"""On-hardware validation batch 21: (a) the transforms.py one-hot-select
fix for the XLA:TPU take_along_axis miscompile (r19: regular-path density
off ~21 nats median at (16384, 43); `_full_math_T` via XLA was fine, so
the gather in `MonotonicRQSTransform._bin` was the culprit) — regular
path vs CPU f64 truth at the failing shape; (b) padded vs unpadded fused
kernel at D=43 (the padding was built against a phantom — the r16 error
was the XLA comparator — keep whichever is faster, both vs truth);
(c) fused-path training gradient at the failing batch vs CPU f64 truth
through the regular (fixed) path."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, named_parameters, partition
from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

D, T, HID, B = 43, 3, (64, 64), 16384
flow = NSF(D, transforms=T, hidden_features=HID, key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(3), (B, D))
SUB = 4096
cpu = jax.devices("cpu")[0]

fp, layout, cfg = nf._flatten_flow(flow)
fp64 = [jax.device_put(np.asarray(p, np.float64), cpu) for p in fp]
x64 = jax.device_put(np.asarray(x[:SUB], np.float64), cpu)
with jax.default_device(cpu):
    lp64 = np.asarray(nf._full_math_T(
        x64.T, fp64, layout, D, cfg["bins"], cfg["bound"], cfg["slope"],
        None, univ=cfg["univ"], base=cfg["base"])[0, :], np.float64)

# (a) regular path (one-hot select) on TPU at the failing batch
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
lp_xla = np.asarray(
    jax.jit(lambda v: flow(None).log_prob(v))(x), np.float64)[:SUB]
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
d = np.abs(lp_xla - lp64)
print(f"regular path (one-hot fix, b={B}) vs truth: max {d.max():.3e}"
      f" median {np.median(d):.3e} frac>1 {float((d > 1).mean()):.3f}",
      flush=True)

# (b) fused kernel, padded vs unpadded: accuracy + throughput
def bench(label):
    lp_f = np.asarray(
        jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(x), np.float64)
    d = np.abs(lp_f[:SUB] - lp64)

    def loop(v):
        def body(c, _):
            return c + jnp.sum(nf.fused_nsf_log_prob(flow, v + 1e-9 * c)), None
        return jax.lax.scan(body, 0.0, None, length=8)[0]

    j = jax.jit(loop)
    j(x).block_until_ready()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            out = j(x)
        out.block_until_ready()
        best = max(best, 3 * 8 * B / (time.perf_counter() - t0))
    print(f"{label}: {best:,.0f} evals/s  vs truth max {d.max():.3e}"
          f" median {np.median(d):.3e}", flush=True)


nf._FEATURE_PAD = True
bench("fused padded  ")
nf._FEATURE_PAD = False
bench("fused unpadded")
nf._FEATURE_PAD = True

# (c) fused-path training gradient vs CPU f64 (regular path, now fixed)
params, static = partition(flow)


def loss(p, xv):
    return -jnp.mean(combine(p, static)(None).log_prob(xv))


g_tpu = jax.jit(jax.grad(loss))(params, x)
params_cpu = jax.tree_util.tree_map(
    lambda a: jax.device_put(np.asarray(a, np.float64), cpu), params)
x_cpu = jax.device_put(np.asarray(x, np.float64), cpu)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
with jax.default_device(cpu):
    g_cpu = jax.grad(loss)(params_cpu, x_cpu)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

worst = 0.0
for (n, a), (_, b) in zip(named_parameters(g_tpu), named_parameters(g_cpu)):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    worst = max(worst, float(np.abs(a - b).max() / (np.abs(b).max() + 1e-6)))
print(f"fused grad (b={B}) vs CPU f64: worst rel {worst:.3e}", flush=True)

print("DONE", flush=True)
