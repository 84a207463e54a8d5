r"""On-hardware validation batch 12: reverse-KL solves at split3.
`fused_nsf_sample(want_log_prob=True)` now runs ALL fixed-point sweeps at
the density precision via the hoisted "cat" presplit (r11 showed a
final-eval-only upgrade leaves ~8e-4 median z-mismatch error). Expect
log q vs the density kernel ~1e-5 (CPU f32 check: 1.2e-5), some
throughput cost vs the 12.07M/s 1-pass solve; plain sample() unchanged
(bit-parity with the premask path)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
ks = jax.random.PRNGKey(7)

from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

flow = NSF(6, transforms=3, key=jax.random.PRNGKey(0))

# (a) self-consistency
x, lq = jax.jit(
    lambda k: nf.fused_nsf_sample(flow, k, (8192,), want_log_prob=True)
)(ks)
lp = jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(x)
e = np.abs(np.asarray(lq, np.float64) - np.asarray(lp, np.float64))
print(f"log q vs density kernel (split3 solve): max {e.max():.3e} "
      f"median {np.median(e):.3e}", flush=True)

# (b) throughput
N = 65536


def slp_loop(k):
    def body(c, i):
        _, l = nf.fused_nsf_sample(
            flow, jax.random.fold_in(k, i), (N,), want_log_prob=True)
        return c + jnp.sum(l), None
    out, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
    return out


j = jax.jit(slp_loop)
j(ks).block_until_ready()
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for i in range(3):
        out = j(jax.random.fold_in(ks, i))
    out.block_until_ready()
    best = max(best, 3 * 8 * N / (time.perf_counter() - t0))
print(f"sample_and_log_prob (split3 solve, pipelined): {best:,.0f}"
      " samples/s", flush=True)

# (c) plain sampling untouched: bit-parity + throughput
s = jax.jit(lambda k: nf.fused_nsf_sample(flow, k, (N,)))(ks)


def s_loop(k):
    def body(c, i):
        v = nf.fused_nsf_sample(flow, jax.random.fold_in(k, i), (N,))
        return c + jnp.sum(v), None
    out, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
    return out


j2 = jax.jit(s_loop)
j2(ks).block_until_ready()
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for i in range(3):
        out = j2(jax.random.fold_in(ks, i))
    out.block_until_ready()
    best = max(best, 3 * 8 * N / (time.perf_counter() - t0))
print(f"plain sample (pipelined): {best:,.0f} samples/s", flush=True)

print("DONE", flush=True)
