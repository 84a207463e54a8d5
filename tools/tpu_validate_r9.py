r"""On-hardware validation batch 9: NAF/UNAF solver tuning A/B.
Knobs: coarse bisection depth (via _COARSE_XTOL), Newton polish count,
and Newton evaluation matmul mode (6-pass HIGHEST vs 3-pass split).
Parity is vs the XLA path at matmul-highest; throughput scan-amortized."""

import os
import sys
import time
import traceback

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
key = jax.random.PRNGKey(0)
ks = jax.random.PRNGKey(7)


def xla(fn):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        return fn()
    finally:
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]


def scan_samples(sampler, rep=8):
    def fn(k):
        def body(carry, i):
            s = sampler(jax.random.fold_in(k, i))
            return carry + jnp.sum(s), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(rep))
        return out
    return fn


def bench(fn, label, per_call, reps=3):
    jfn = jax.jit(fn)
    jfn(ks).block_until_ready()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(reps):
            out = jfn(jax.random.fold_in(ks, i))
        out.block_until_ready()
        best = max(best, reps * per_call / (time.perf_counter() - t0))
    print(f"  {label}: {best:,.0f}/s", flush=True)
    return best


from zuko_tpu.flows import NAF, UNAF
from zuko_tpu.ops import naf_fused as nfa
from zuko_tpu.ops.naf_fused import fused_naf_sample

naf = NAF(6, transforms=3, signal=16, key=key)
unaf = UNAF(6, transforms=3, signal=16, key=key)

with jax.default_matmul_precision("highest"):
    naf_ref = xla(lambda: jax.jit(
        lambda k: naf(None).sample(k, (4096,)))(ks))
    unaf_ref = xla(lambda: jax.jit(
        lambda k: unaf(None).sample(k, (1024,)))(ks))

_orig_dot_hi = nfa._dot_hi


def _dot_hi_split(W, u, prec=jax.lax.Precision.HIGHEST):
    from zuko_tpu.ops.nsf_fused import _dot_split3
    if prec is jax.lax.Precision.HIGHEST:
        return _dot_split3(W, u)
    return _orig_dot_hi(W, u, prec)


VARIANTS = [
    ("xtol4e-3 n5 hi6", 4e-3, 5, False),
    ("xtol4e-3 n3 hi6", 4e-3, 3, False),
    ("xtol2e-2 n3 hi6", 2e-2, 3, False),
    ("xtol2e-2 n3 split3", 2e-2, 3, True),
    ("xtol4e-3 n5 split3", 4e-3, 5, True),
]

for label, xtol, n_newton, split in VARIANTS:
    nfa._COARSE_XTOL = xtol
    nfa._N_NEWTON = n_newton
    nfa._dot_hi = _dot_hi_split if split else _orig_dot_hi
    try:
        s = jax.jit(lambda k: fused_naf_sample(naf, k, (4096,)))(ks)
        e = float(jnp.abs(s - naf_ref).max())
        su = jax.jit(lambda k: fused_naf_sample(unaf, k, (1024,)))(ks)
        eu = float(jnp.abs(su - unaf_ref).max())
        print(f"[{label}] naf |max| {e:.2e}  unaf |max| {eu:.2e}", flush=True)
        bench(scan_samples(lambda k: fused_naf_sample(naf, k, (4096,))),
              f"naf {label}", 4096 * 8)
        bench(scan_samples(lambda k: fused_naf_sample(unaf, k, (1024,)),
                           rep=4),
              f"unaf {label}", 1024 * 4)
    except Exception:
        print(f"[{label}] FAILED:", flush=True)
        traceback.print_exc()
    finally:
        nfa._COARSE_XTOL = 4e-3
        nfa._N_NEWTON = 5
        nfa._dot_hi = _orig_dot_hi

print("DONE", flush=True)
