r"""On-hardware validation batch 38: (a) UNAF sampling with the GL-16
Newton value rule (parity + throughput vs the 96K/s GL-32 baseline);
(b) production-scale NSF through the fused dispatch — D=64, 5
transforms, hidden 256x2 (VMEM headroom check: ~all weights resident
per kernel) — density + train-step correctness and throughput."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

ks = jax.random.PRNGKey(7)
cpu = jax.devices("cpu")[0]

# ---- (a) UNAF ----
from zuko_tpu.flows import UNAF
from zuko_tpu.ops.naf_fused import fused_naf_sample

unaf = UNAF(6, transforms=3, signal=16, key=jax.random.PRNGKey(0))
with jax.default_matmul_precision("highest"):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    ref = jax.jit(lambda k: unaf(None).sample(k, (1024,)))(ks)
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
s = jax.jit(lambda k: fused_naf_sample(unaf, k, (1024,)))(ks)
print(f"(a) UNAF GL16-Newton parity: {float(jnp.abs(s - ref).max()):.3e}",
      flush=True)


def loop(k):
    def body(c, i):
        v = fused_naf_sample(unaf, jax.random.fold_in(k, i), (1024,))
        return c + jnp.sum(v), None
    out, _ = jax.lax.scan(body, 0.0, jnp.arange(4))
    return out


j = jax.jit(loop)
j(ks).block_until_ready()
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for i in range(3):
        out = j(jax.random.fold_in(ks, i))
    out.block_until_ready()
    best = max(best, 3 * 4 * 1024 / (time.perf_counter() - t0))
print(f"(a) UNAF sampling: {best:,.0f} samples/s (pipelined; was 96K)",
      flush=True)

# ---- (b) production-scale NSF ----
from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF
import optax

flow = NSF(64, transforms=5, hidden_features=(256, 256),
           key=jax.random.PRNGKey(1))
x = jax.random.normal(jax.random.PRNGKey(2), (16384, 64))
try:
    lp_t = np.asarray(jax.jit(lambda v: flow(None).log_prob(v))(x))[:1024]
    with jax.default_device(cpu):
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
        lp_c = np.asarray(flow(None).log_prob(jax.device_put(x[:1024], cpu)))
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
    d = np.abs(lp_t - lp_c)
    print(f"(b) big NSF density vs CPU: max {d.max():.3e} median"
          f" {np.median(d):.3e}", flush=True)

    def dloop(v):
        def body(c, _):
            return c + jnp.sum(flow(None).log_prob(v + 1e-9 * c)), None
        return jax.lax.scan(body, 0.0, None, length=4)[0]

    jd = jax.jit(dloop)
    jd(x).block_until_ready()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            out = jd(x)
        out.block_until_ready()
        best = max(best, 3 * 4 * 16384 / (time.perf_counter() - t0))
    print(f"(b) big NSF density: {best:,.0f} evals/s", flush=True)

    params, static = partition(flow)
    opt = optax.adam(1e-3)
    st = opt.init(params)

    @jax.jit
    def step(p, s, v):
        def loss(p):
            return -jnp.mean(combine(p, static)(None).log_prob(v))
        l, g = jax.value_and_grad(loss)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    p2, s2, l0 = step(params, st, x[:8192])
    p2, s2, l1 = step(p2, s2, x[:8192])
    print(f"(b) big NSF train steps: loss {float(l0):.2f} -> {float(l1):.2f}"
          f" finite={bool(jnp.isfinite(l1))}", flush=True)
except Exception as ex:
    print(f"(b) FAILED: {str(ex)[:400]}", flush=True)

print("DONE", flush=True)
