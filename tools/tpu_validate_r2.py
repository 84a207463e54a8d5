r"""Round-2 on-hardware validation: feature-vectorized NSF kernels and the
fused NAF sampling kernel — numerics vs the jnp/XLA paths, plus throughput.

Run on the tunneled TPU: ``python tools/tpu_validate_r2.py`` (remote compiles
take minutes; run in background).
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from zuko_tpu.flows import NAF, NSF
from zuko_tpu.ops.naf_fused import fused_naf_sample
from zuko_tpu.ops.nsf_fused import (
    fused_nsf_log_prob,
    fused_nsf_sample,
    fused_nsf_sample_and_log_prob,
)

key = jax.random.PRNGKey(0)
print("backend:", jax.default_backend(), flush=True)

# ---- NSF log_prob: Pallas kernel vs jnp fallback on hardware -------------
flow = NSF(6, 0, transforms=3, key=key)
x = jax.random.normal(jax.random.PRNGKey(1), (4096, 6))

t0 = time.perf_counter()
lp_k = jax.jit(lambda x: fused_nsf_log_prob(flow, x))(x)
lp_k.block_until_ready()
print(f"nsf log_prob kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

os.environ["ZUKO_TPU_FUSED_NSF"] = "0"
lp_j = jax.jit(lambda x: fused_nsf_log_prob(flow, x))(x)
os.environ["ZUKO_TPU_FUSED_NSF"] = "1"
print("nsf log_prob kernel vs jnp |max|:", float(jnp.abs(lp_k - lp_j).max()), flush=True)

# also vs the pure XLA path through the public API (dispatch off)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
lp_x = jax.jit(lambda x: flow(None).log_prob(x))(x)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
print("nsf log_prob kernel vs XLA |max|:", float(jnp.abs(lp_k - lp_x).max()), flush=True)

# ---- NSF sampling kernel ---------------------------------------------------
ks = jax.random.PRNGKey(7)
t0 = time.perf_counter()
s_k = jax.jit(lambda k: fused_nsf_sample(flow, k, (4096,)))(ks)
s_k.block_until_ready()
print(f"nsf sample kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
os.environ["ZUKO_TPU_FUSED_NSF"] = "0"
s_j = jax.jit(lambda k: fused_nsf_sample(flow, k, (4096,)))(ks)
os.environ["ZUKO_TPU_FUSED_NSF"] = "1"
print("nsf sample kernel vs jnp |max|:", float(jnp.abs(s_k - s_j).max()), flush=True)

xs, lq = jax.jit(lambda k: fused_nsf_sample_and_log_prob(flow, k, (4096,)))(ks)
print("nsf s&lp consistency |max|:",
      float(jnp.abs(lq - fused_nsf_log_prob(flow, xs)).max()), flush=True)

# ---- NAF sampling kernel ---------------------------------------------------
naf = NAF(6, transforms=3, signal=16, key=key)

t0 = time.perf_counter()
n_k = jax.jit(lambda k: fused_naf_sample(naf, k, (4096,)))(ks)
n_k.block_until_ready()
print(f"naf sample kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

os.environ["ZUKO_TPU_FUSED_NSF"] = "0"
n_j = jax.jit(lambda k: fused_naf_sample(naf, k, (4096,)))(ks)
os.environ["ZUKO_TPU_FUSED_NSF"] = "1"
print("naf sample kernel vs jnp |max|:", float(jnp.abs(n_k - n_j).max()), flush=True)

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
t0 = time.perf_counter()
n_x = jax.jit(lambda k: naf(None).sample(k, (4096,)))(ks)
n_x.block_until_ready()
print(f"naf XLA sample compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
print("naf sample kernel vs XLA |max|:", float(jnp.abs(n_k - n_x).max()), flush=True)

# ---- throughput (amortized in-jit) ----------------------------------------
B = 4096
REP = 8


def bench(fn, label, per_call):
    jfn = jax.jit(fn)
    jfn(ks).block_until_ready()  # compile
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(3):
            out = jfn(jax.random.fold_in(ks, i))
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, 3 * per_call / dt)
    print(f"{label}: {best:,.0f}/s", flush=True)


def scan_samples(sampler):
    def fn(k):
        def body(carry, i):
            s = sampler(jax.random.fold_in(k, i))
            return carry + jnp.sum(s), None

        out, _ = jax.lax.scan(body, 0.0, jnp.arange(REP))
        return out

    return fn


bench(scan_samples(lambda k: fused_naf_sample(naf, k, (B,))),
      "naf fused samples", B * REP)

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
bench(scan_samples(lambda k: naf(None).sample(k, (B,))),
      "naf XLA samples", B * REP)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

bench(scan_samples(lambda k: fused_nsf_sample(flow, k, (B,))),
      "nsf fused samples", B * REP)

print("DONE", flush=True)
