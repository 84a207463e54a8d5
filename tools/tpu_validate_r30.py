r"""On-hardware validation batch 30: the rolled (fori_loop) fused-sampler
sweeps at F=43 — the Python unroll produced a compile-service-killing
program (r29's D=43 fused sampling took >15 min to compile). Parity vs
the chunked regular path + compile wall-clock + throughput; plus a D=6
regression (unrolled path must be untouched)."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

ks = jax.random.PRNGKey(7)

# D=43: compile time + self-consistency + throughput
flow = NSF(43, transforms=3, hidden_features=(64, 64),
           key=jax.random.PRNGKey(0))
t0 = time.perf_counter()
x, lq = jax.jit(
    lambda k: nf.fused_nsf_sample(flow, k, (8192,), want_log_prob=True)
)(ks)
x.block_until_ready()
print(f"D=43 fused sample_and_log_prob compile+run: "
      f"{time.perf_counter()-t0:.0f}s", flush=True)
lp = jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(x)
e = np.abs(np.asarray(lq, np.float64) - np.asarray(lp, np.float64))
print(f"D=43 rolled-sweep logq vs density: max {e.max():.3e} median"
      f" {np.median(e):.3e}", flush=True)

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
s_ref = jax.jit(lambda k: flow(None).sample(k, (2048,)))(ks)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
s = jax.jit(lambda k: nf.fused_nsf_sample(flow, k, (2048,)))(ks)
print(f"D=43 rolled-sweep sample vs chunked XLA: max"
      f" {float(jnp.abs(s - s_ref).max()):.3e}", flush=True)


def loop(k):
    def body(c, i):
        v = nf.fused_nsf_sample(flow, jax.random.fold_in(k, i), (8192,))
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
    best = max(best, 3 * 4 * 8192 / (time.perf_counter() - t0))
print(f"D=43 fused sampling: {best:,.0f} samples/s (pipelined)", flush=True)

# D=6 regression (unrolled path)
flow6 = NSF(6, transforms=3, key=jax.random.PRNGKey(0))
s6 = jax.jit(lambda k: nf.fused_nsf_sample(flow6, k, (4096,)))(ks)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
s6r = jax.jit(lambda k: flow6(None).sample(k, (4096,)))(ks)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
print(f"D=6 sample parity: max {float(jnp.abs(s6 - s6r).max()):.3e}",
      flush=True)

print("DONE", flush=True)
