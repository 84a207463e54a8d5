r"""On-hardware validation of the fused GF kernels: Mosaic lowering of the
in-kernel erf/erfinv polynomials, parity vs the XLA path (quantile contract —
see ops/gf_fused.py), and density/sampling throughput."""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import GF
from zuko_tpu.ops.gf_fused import fused_gf_log_prob, fused_gf_sample

key = jax.random.PRNGKey(0)
ks = jax.random.PRNGKey(7)
print("backend:", jax.default_backend(), flush=True)

flow = GF(6, transforms=3, key=key)
p, st = partition(flow)
flow = combine(jtu.tree_map(lambda a: a * 0.3, p), st)
x = jax.random.normal(jax.random.PRNGKey(1), (4096, 6))

# density kernel
t0 = time.perf_counter()
lp_k = jax.jit(lambda x: fused_gf_log_prob(flow, x))(x)
lp_k.block_until_ready()
print(f"gf density kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
lp_x = jax.jit(lambda x: flow(None).log_prob(x))(x)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
print("gf density kernel vs XLA |max|:", float(jnp.abs(lp_k - lp_x).max()),
      flush=True)

# sampling kernel
t0 = time.perf_counter()
s_k, lq_k = jax.jit(
    lambda k: fused_gf_sample(flow, k, (4096,), want_log_prob=True)
)(ks)
s_k.block_until_ready()
print(f"gf sample kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
s_x = jax.jit(lambda k: flow(None).sample(k, (4096,)))(ks)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
e = jnp.abs(s_k - s_x)
print("gf sample kernel vs XLA median:", float(jnp.median(e)),
      "q95:", float(jnp.quantile(e, 0.95)), "max:", float(e.max()), flush=True)
es = jnp.abs(lq_k - fused_gf_log_prob(flow, s_k))
print("gf logq self-consistency median:", float(jnp.median(es)), flush=True)

# ---- throughput ------------------------------------------------------------
B = 65536
REP = 10
xb = jax.random.normal(jax.random.PRNGKey(2), (B, 6))


@jax.jit
def loop(x):
    def body(carry, _):
        return carry + jnp.sum(fused_gf_log_prob(flow, x + 1e-9 * carry)), None
    out, _ = jax.lax.scan(body, 0.0, None, length=REP)
    return out


t0 = time.perf_counter()
loop(xb).block_until_ready()
print(f"gf density loop compile: {time.perf_counter()-t0:.1f}s", flush=True)
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(5):
        out = loop(xb)
    out.block_until_ready()
    best = max(best, B * REP * 5 / (time.perf_counter() - t0))
print(f"gf density: {best/1e6:.1f}M evals/s", flush=True)


@jax.jit
def sloop(k):
    def body(carry, i):
        s = fused_gf_sample(flow, jax.random.fold_in(k, i), (4096,))
        return carry + jnp.sum(s), None
    out, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
    return out


t0 = time.perf_counter()
sloop(ks).block_until_ready()
print(f"gf sample loop compile: {time.perf_counter()-t0:.1f}s", flush=True)
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for i in range(3):
        out = sloop(jax.random.fold_in(ks, i))
    out.block_until_ready()
    best = max(best, 4096 * 8 * 3 / (time.perf_counter() - t0))
print(f"gf sampling: {best/1e6:.2f}M samples/s", flush=True)

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"


@jax.jit
def xloop(k):
    def body(carry, i):
        s = flow(None).sample(jax.random.fold_in(k, i), (4096,))
        return carry + jnp.sum(s), None
    out, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
    return out


t0 = time.perf_counter()
xloop(ks).block_until_ready()
print(f"gf XLA sample loop compile: {time.perf_counter()-t0:.1f}s", flush=True)
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for i in range(3):
        out = xloop(jax.random.fold_in(ks, i))
    out.block_until_ready()
    best = max(best, 4096 * 8 * 3 / (time.perf_counter() - t0))
print(f"gf XLA sampling: {best/1e6:.2f}M samples/s", flush=True)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

print("DONE", flush=True)
