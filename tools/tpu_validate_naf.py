r"""On-hardware validation of the precision-fixed, block-diagonal NAF/UNAF
sampling kernels: parity against the XLA path at matched matmul precision,
plus throughput."""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from zuko_tpu.flows import NAF, UNAF
from zuko_tpu.ops.naf_fused import fused_naf_sample

key = jax.random.PRNGKey(0)
ks = jax.random.PRNGKey(7)
print("backend:", jax.default_backend(), flush=True)

naf = NAF(6, transforms=3, signal=16, key=key)

t0 = time.perf_counter()
n_k = jax.jit(lambda k: fused_naf_sample(naf, k, (4096,)))(ks)
n_k.block_until_ready()
print(f"naf kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
# XLA path at DEFAULT matmul precision (single bf16 pass)
n_x = jax.jit(lambda k: naf(None).sample(k, (4096,)))(ks)
# XLA path at HIGHEST (f32-exact) — the ground-truth comparison
with jax.default_matmul_precision("highest"):
    n_xh = jax.jit(lambda k: naf(None).sample(k, (4096,)))(ks)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

print("naf kernel vs XLA(default bf16) |max|:",
      float(jnp.abs(n_k - n_x).max()), flush=True)
print("naf kernel vs XLA(highest f32)  |max|:",
      float(jnp.abs(n_k - n_xh).max()), flush=True)
print("XLA default vs XLA highest      |max|:",
      float(jnp.abs(n_x - n_xh).max()), flush=True)

# UNAF kernel
unaf = UNAF(6, transforms=3, signal=16, key=key)
t0 = time.perf_counter()
u_k = jax.jit(lambda k: fused_naf_sample(unaf, k, (1024,)))(ks)
u_k.block_until_ready()
print(f"unaf kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
with jax.default_matmul_precision("highest"):
    u_xh = jax.jit(lambda k: unaf(None).sample(k, (1024,)))(ks)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
print("unaf kernel vs XLA(highest) |max|:",
      float(jnp.abs(u_k - u_xh).max()), flush=True)

# ---- throughput ------------------------------------------------------------
B = 4096
REP = 8


def bench(fn, label, per_call):
    jfn = jax.jit(fn)
    jfn(ks).block_until_ready()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(3):
            out = jfn(jax.random.fold_in(ks, i))
        out.block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, 3 * per_call / dt)
    print(f"{label}: {best:,.0f}/s", flush=True)


def scan_samples(sampler, rep=REP):
    def fn(k):
        def body(carry, i):
            s = sampler(jax.random.fold_in(k, i))
            return carry + jnp.sum(s), None

        out, _ = jax.lax.scan(body, 0.0, jnp.arange(rep))
        return out

    return fn


bench(scan_samples(lambda k: fused_naf_sample(naf, k, (B,))),
      "naf fused samples", B * REP)
bench(scan_samples(lambda k: fused_naf_sample(unaf, k, (1024,)), rep=4),
      "unaf fused samples", 1024 * 4)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
bench(scan_samples(lambda k: unaf(None).sample(k, (1024,)), rep=4),
      "unaf XLA samples", 1024 * 4)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

print("DONE", flush=True)
