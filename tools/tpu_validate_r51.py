r"""On-hardware batch 51: dissect the IFT reverse-KL step (r49 read 0.51M
samples/s — 2.5x SLOWER than the round-2 XLA-backward baseline, not the
>=5M target). Time each stage separately at the flagship config:

  1. fused rsample_and_log_prob forward alone (kernel; r2: 19.2M/s)
  2. density custom-VJP fwd+bwd alone (the MLE step analog; r2: 15.7M/s)
  3. the full IFT grad (fwd + density vjp + triangular solves + pullbacks)
  4. IFT grad WITHOUT the bwd row-chunking (is lax.map the overhead?)
  5. IFT grad with fori-rolled solves (program-size/pipelining check)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF
from zuko_tpu.ops import ift, nsf_fused as nf

flow = NSF(6, 0, transforms=3, key=jax.random.PRNGKey(0))
params, static = partition(flow)
k = jax.random.PRNGKey(7)
B = 65536


def timeit(label, fn, *args, scale=B):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(3)]
        jax.block_until_ready(outs[-1])
        best = max(best, scale * 3 / (time.perf_counter() - t0))
    print(f"{label}: {best / 1e6:.2f}M/s", flush=True)
    return best


# 1. forward only
fwd = jax.jit(lambda p: ift.fused_nsf_rsample(
    combine(p, static), k, (B,), want_log_prob=True))
timeit("1 fused rsample+logq fwd", fwd, params)

# 2. density fwd+bwd (reference point)
x = jax.random.normal(jax.random.PRNGKey(1), (B, 6))
dgrad = jax.jit(jax.grad(
    lambda p, v: jnp.sum(nf.fused_nsf_log_prob(combine(p, static), v))))
timeit("2 density custom-VJP grad", dgrad, params, x)


def make_loss():
    def loss(p):
        d = combine(p, static)(None)
        xs, lq = d.rsample_and_log_prob(k, (B,))
        return jnp.mean(lq) + jnp.mean(jnp.sum(xs * xs, -1))

    return loss


import os

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

# 3. full IFT grad
g3 = jax.jit(jax.grad(make_loss()))
timeit("3 IFT full grad (chunked bwd)", g3, params)

# 4. without bwd chunking
old_chunk = nf._BWD_CHUNK
nf._BWD_CHUNK = 1 << 30
try:
    g4 = jax.jit(jax.grad(make_loss()))
    timeit("4 IFT full grad (monolithic bwd)", g4, params)
finally:
    nf._BWD_CHUNK = old_chunk

# 5. xbar-only IFT (no log q cotangent -> no density vjp inside the bwd)
g5 = jax.jit(jax.grad(lambda p: jnp.mean(jnp.sum(
    ift.fused_nsf_rsample(combine(p, static), k, (B,)) ** 2, -1))))
timeit("5 IFT rsample-only grad", g5, params)

print("done", flush=True)
