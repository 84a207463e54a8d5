r"""On-hardware validation batch 14: UNAF coarse-phase quadrature.
The coarse bisection now integrates with an 8-point Gauss-Legendre rule
(the full 32-point rule only needs to hold in the Newton polish, whose
roots define parity with the XLA path). Expect ~2-4x UNAF sampling
throughput at unchanged ~1e-5 parity; NAF is untouched (re-confirm)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import os

print("backend:", jax.default_backend(), flush=True)
key = jax.random.PRNGKey(0)
ks = jax.random.PRNGKey(7)

from zuko_tpu.flows import NAF, UNAF
from zuko_tpu.ops.naf_fused import fused_naf_sample

naf = NAF(6, transforms=3, signal=16, key=key)
unaf = UNAF(6, transforms=3, signal=16, key=key)

with jax.default_matmul_precision("highest"):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    naf_ref = jax.jit(lambda k: naf(None).sample(k, (4096,)))(ks)
    unaf_ref = jax.jit(lambda k: unaf(None).sample(k, (1024,)))(ks)
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

s = jax.jit(lambda k: fused_naf_sample(naf, k, (4096,)))(ks)
print("naf |max| vs XLA-highest:", float(jnp.abs(s - naf_ref).max()),
      flush=True)
su = jax.jit(lambda k: fused_naf_sample(unaf, k, (1024,)))(ks)
print("unaf |max| vs XLA-highest:", float(jnp.abs(su - unaf_ref).max()),
      flush=True)


def bench(sampler, label, n, rep):
    def loop(k):
        def body(c, i):
            v = sampler(jax.random.fold_in(k, i))
            return c + jnp.sum(v), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(rep))
        return out

    j = jax.jit(loop)
    j(ks).block_until_ready()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(3):
            out = j(jax.random.fold_in(ks, i))
        out.block_until_ready()
        best = max(best, 3 * rep * n / (time.perf_counter() - t0))
    print(f"{label}: {best:,.0f} samples/s (pipelined)", flush=True)


bench(lambda k: fused_naf_sample(naf, k, (4096,)), "naf", 4096, 8)
bench(lambda k: fused_naf_sample(unaf, k, (1024,)), "unaf", 1024, 4)

print("DONE", flush=True)
