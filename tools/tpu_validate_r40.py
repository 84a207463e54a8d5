r"""On-hardware validation batch 40: GF sampling with the coarse/fine
solver (11-iter derivative-free bisection + 2 analytic-Newton steps,
replacing 29 full iterations). Parity vs XLA-highest via the family's
quantile contract + raw max; throughput vs the 3.08M/s baseline."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import GF
from zuko_tpu.core import combine, partition
import jax.tree_util as jtu

ks = jax.random.PRNGKey(7)
gf = GF(6, transforms=3, key=jax.random.PRNGKey(0))
pg, sg = partition(gf)
gf = combine(jtu.tree_map(lambda a: a * 0.3, pg), sg)

with jax.default_matmul_precision("highest"):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    ref = jax.jit(lambda k: gf(None).sample(k, (8192,)))(ks)
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
s = jax.jit(lambda k: gf(None).sample(k, (8192,)))(ks)
d = np.abs(np.asarray(s) - np.asarray(ref))
# quantile contract: fraction of points beyond tolerances
print(f"GF sample vs XLA-highest: max {d.max():.3e} p99 "
      f"{np.quantile(d, 0.99):.3e} median {np.median(d):.3e}", flush=True)

x, lq = jax.jit(
    lambda k: gf(None).sample_and_log_prob(k, (8192,)))(ks)
lp = jax.jit(lambda v: gf(None).log_prob(v))(x)
e = np.abs(np.asarray(lq, np.float64) - np.asarray(lp, np.float64))
print(f"GF logq self-consistency: max {e.max():.3e} median"
      f" {np.median(e):.3e}", flush=True)


def loop(k):
    def body(c, i):
        v = gf(None).sample(jax.random.fold_in(k, i), (8192,))
        return c + jnp.sum(v), None
    out, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
    return out


j = jax.jit(loop)
j(ks).block_until_ready()
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for i in range(3):
        out = j(jax.random.fold_in(ks, i))
    out.block_until_ready()
    best = max(best, 3 * 8 * 8192 / (time.perf_counter() - t0))
print(f"GF sampling: {best:,.0f} samples/s (was 3.08M)", flush=True)

print("DONE", flush=True)
