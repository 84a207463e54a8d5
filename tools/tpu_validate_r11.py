r"""On-hardware validation batch 11: (a) the sampler's final ladj
evaluation now runs split3 — log q from `fused_nsf_sample(want_log_prob)`
should agree with the split3 density kernel to ~1e-5 (was 1.06e-3 median
at 1-pass, r10); throughput cost should be one extra pass per layer.
(b) NAF default-config rebench in the r9 pipelined harness (r10's
blocking harness read 686K/s where r9's read 1.14M/s — measure both)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
ks = jax.random.PRNGKey(7)

from zuko_tpu.flows import NSF, NAF
from zuko_tpu.ops import nsf_fused as nf
from zuko_tpu.ops.naf_fused import fused_naf_sample

flow = NSF(6, transforms=3, key=jax.random.PRNGKey(0))

# (a) log q self-consistency + sample_and_log_prob throughput
x, lq = jax.jit(
    lambda k: nf.fused_nsf_sample(flow, k, (8192,), want_log_prob=True)
)(ks)
lp = jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(x)
e = np.abs(np.asarray(lq, np.float64) - np.asarray(lp, np.float64))
print(f"log q vs density kernel (split3 final eval): max {e.max():.3e} "
      f"median {np.median(e):.3e}", flush=True)

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
for _ in range(3):
    t0 = time.perf_counter()
    j(ks).block_until_ready()
    best = max(best, 8 * N / (time.perf_counter() - t0))
print(f"sample_and_log_prob: {best:,.0f} samples/s", flush=True)


# (b) NAF rebench, r9 pipelined harness (3 unblocked calls per timing)
naf = NAF(6, transforms=3, signal=16, key=jax.random.PRNGKey(0))


def scan_samples(k):
    def body(c, i):
        s = fused_naf_sample(naf, jax.random.fold_in(k, i), (4096,))
        return c + jnp.sum(s), None
    out, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
    return out


jn = jax.jit(scan_samples)
jn(ks).block_until_ready()
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for i in range(3):
        out = jn(jax.random.fold_in(ks, i))
    out.block_until_ready()
    best = max(best, 3 * 8 * 4096 / (time.perf_counter() - t0))
print(f"naf default (pipelined x3): {best:,.0f} samples/s", flush=True)

best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    jn(ks).block_until_ready()
    best = max(best, 8 * 4096 / (time.perf_counter() - t0))
print(f"naf default (blocking): {best:,.0f} samples/s", flush=True)

print("DONE", flush=True)
