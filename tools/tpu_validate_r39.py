r"""On-hardware validation batch 39: production-scale NSF (D=64, 5
transforms, hidden 256x2) through the fused dispatch with the live-set-
aware batch tile (r38's fixed tb=1024 killed the compile service).
Density vs CPU, throughput, train steps; flagship regression check
(tb must stay 1024 there)."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import optax

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

cpu = jax.devices("cpu")[0]

flow = NSF(64, transforms=5, hidden_features=(256, 256),
           key=jax.random.PRNGKey(1))
fp, layout, _ = nf._flatten_flow(flow)
print("chosen tb:", nf._density_tb(fp, layout), flush=True)

fp6, layout6, _ = nf._flatten_flow(
    NSF(6, transforms=3, key=jax.random.PRNGKey(0)))
assert nf._density_tb(fp6, layout6) == 1024, "flagship tb regressed"
print("flagship tb: 1024 (unchanged)", flush=True)

x = jax.random.normal(jax.random.PRNGKey(2), (16384, 64))
# params as jit ARGUMENTS: closing over a big model's params embeds them
# as constants in the kernel MLIR (12.7MB at this config) and kills the
# compile service — the operand form is the production calling convention
params0, static0 = partition(flow)
lp_fn = jax.jit(
    lambda p, v: combine(p, static0)(None).log_prob(v))
lp_t = np.asarray(lp_fn(params0, x))[:1024]
with jax.default_device(cpu):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    lp_c = np.asarray(flow(None).log_prob(jax.device_put(x[:1024], cpu)))
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
d = np.abs(lp_t - lp_c)
print(f"big NSF density vs CPU: max {d.max():.3e} median"
      f" {np.median(d):.3e}", flush=True)


def dloop(p, v):
    def body(c, _):
        return c + jnp.sum(
            combine(p, static0)(None).log_prob(v + 1e-9 * c)), None
    return jax.lax.scan(body, 0.0, None, length=4)[0]


jd = jax.jit(lambda v: dloop(params0, v))
jd = jax.jit(dloop)
jd(params0, x).block_until_ready()
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(3):
        out = jd(params0, x)
    out.block_until_ready()
    best = max(best, 3 * 4 * 16384 / (time.perf_counter() - t0))
print(f"big NSF density: {best:,.0f} evals/s", flush=True)

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
print(f"big NSF train: loss {float(l0):.2f} -> {float(l1):.2f}"
      f" finite={bool(jnp.isfinite(l1))}", flush=True)

print("DONE", flush=True)
