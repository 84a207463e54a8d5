r"""On-hardware validation batch 20: blast radius of the XLA-path
miscompile (r19: `flow(None).log_prob` at D=43/t=3/h=64/b=16384 is off
by ~21 nats median vs f64 truth on TPU, while the fused kernel is at
1.5e-4). Checks: (a) the transposed fallback math `_full_math_T` run by
XLA on TPU (the custom-VJP backward differentiates THIS), (b) training
gradients through the fused path at the failing batch vs CPU f64,
(c) per-layer isolation of the regular path."""

import os
import sys

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

# truth (subset)
fp64 = [jax.device_put(np.asarray(p, np.float64), cpu) for p in fp]
x64 = jax.device_put(np.asarray(x[:SUB], np.float64), cpu)
with jax.default_device(cpu):
    lp64 = np.asarray(nf._full_math_T(
        x64.T, fp64, layout, D, cfg["bins"], cfg["bound"], cfg["slope"],
        None, univ=cfg["univ"], base=cfg["base"])[0, :], np.float64)

# (a) fallback math via XLA on TPU at full batch
fp32 = [jnp.asarray(p) for p in fp]
lp_fb = np.asarray(jax.jit(
    lambda v, ps: nf._full_math_T(
        v.T, list(ps), layout, D, cfg["bins"], cfg["bound"], cfg["slope"],
        None, univ=cfg["univ"], base=cfg["base"])[0, :]
)(x, fp32), np.float64)[:SUB]
d = np.abs(lp_fb - lp64)
print(f"_full_math_T (XLA, TPU, b={B}) vs truth: max {d.max():.3e}"
      f" median {np.median(d):.3e}", flush=True)

# (b) training gradient through the fused path at the failing batch
params, static = partition(flow)


def loss(p, xv):
    return -jnp.mean(combine(p, static)(None).log_prob(xv))


g_tpu = jax.jit(jax.grad(loss))(params, x)

params_cpu = jax.tree_util.tree_map(
    lambda a: jax.device_put(np.asarray(a, np.float64), cpu), params)
x_cpu = jax.device_put(np.asarray(x, np.float64), cpu)
with jax.default_device(cpu):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"  # fallback math on CPU
    g_cpu = jax.grad(loss)(params_cpu, x_cpu)
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

worst_rel = 0.0
for (n, a), (_, b) in zip(named_parameters(g_tpu), named_parameters(g_cpu)):
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-6)
    worst_rel = max(worst_rel, float(rel))
print(f"fused-path grad (TPU, b={B}) vs CPU f64: worst rel {worst_rel:.3e}",
      flush=True)

# (c) isolate the regular path per-layer: one MAT layer's call_and_ladj
try:
    lt = flow.transform.transforms[0]
    tr = lt(None)
    y64_list = []
    with jax.default_device(cpu):
        xx = jax.device_put(np.asarray(x[:SUB], np.float64), cpu)
        y64, ladj64 = tr.call_and_ladj(xx)
    y32, ladj32 = jax.jit(lambda v: tr.call_and_ladj(v))(x)
    d = np.abs(np.asarray(ladj32, np.float64)[:SUB] - np.asarray(ladj64))
    print(f"layer0 call_and_ladj (b={B}) ladj vs f64: max {d.max():.3e}"
          f" median {np.median(d):.3e}", flush=True)
except Exception as e:
    print("layer isolation failed:", e, flush=True)

print("DONE", flush=True)
