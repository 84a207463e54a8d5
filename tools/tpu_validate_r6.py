r"""On-hardware validation batch 6 (sectioned — one failure does not kill
the run): the redesigned NAF/UNAF sampling kernel (per-feature slabs with
the first monotone layer hoisted out of the bisection loop, replacing the
block-diagonal layout that VMEM-OOMed the UNAF variant by 172KB and left
NAF at 157K samples/s), plus a BPF f64 ground-truth comparison
(who owns the r5 1.8e-2 gap)."""

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


def section(name):
    def deco(fn):
        t0 = time.perf_counter()
        try:
            fn()
            print(f"[{name}] ok ({time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception:
            print(f"[{name}] FAILED:", flush=True)
            traceback.print_exc()
        return fn
    return deco


def xla(fn):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        return fn()
    finally:
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]


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
    print(f"{label}: {best:,.0f}/s", flush=True)


def scan_samples(sampler, rep=8):
    def fn(k):
        def body(carry, i):
            s = sampler(jax.random.fold_in(k, i))
            return carry + jnp.sum(s), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(rep))
        return out
    return fn


from zuko_tpu.flows import NAF, UNAF

from zuko_tpu.ops.naf_fused import fused_naf_sample

naf = NAF(6, transforms=3, signal=16, key=key)
unaf = UNAF(6, transforms=3, signal=16, key=key)

with jax.default_matmul_precision("highest"):
    naf_ref = xla(lambda: jax.jit(
        lambda k: naf(None).sample(k, (4096,)))(ks))
    unaf_ref = xla(lambda: jax.jit(
        lambda k: unaf(None).sample(k, (1024,)))(ks))


@section("naf-hoisted-highest")
def _():
    t0 = time.perf_counter()
    s = jax.jit(lambda k: fused_naf_sample(naf, k, (4096,)))(ks)
    s.block_until_ready()
    print(f"naf hoisted compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    print("naf hoisted vs XLA(highest) |max|:",
          float(jnp.abs(s - naf_ref).max()), flush=True)
    bench(scan_samples(lambda k: fused_naf_sample(naf, k, (4096,))),
          "naf fused samples (HIGHEST)", 4096 * 8)


@section("unaf-hoisted-highest")
def _():
    t0 = time.perf_counter()
    s = jax.jit(lambda k: fused_naf_sample(unaf, k, (1024,)))(ks)
    s.block_until_ready()
    print(f"unaf hoisted compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    print("unaf hoisted vs XLA(highest) |max|:",
          float(jnp.abs(s - unaf_ref).max()), flush=True)
    bench(scan_samples(lambda k: fused_naf_sample(unaf, k, (1024,)), rep=4),
          "unaf fused samples (HIGHEST)", 1024 * 4)


@section("bpf-vs-f64-truth")
def _():
    # decides who owns the r5 1.8e-2 BPF gap: both TPU paths are compared
    # against CPU f64 ground truth (tools/bpf_truth_f64.npz, same flow
    # init key / inputs). On CPU f32 the kernel math is ~10x CLOSER to
    # truth than the XLA f32 path (2.2e-5 vs 1.9e-4 max).
    import numpy as np

    from zuko_tpu.flows import BPF
    from zuko_tpu.ops.nsf_fused import fused_nsf_log_prob

    d = np.load("tools/bpf_truth_f64.npz")
    x, lp64 = jnp.asarray(d["x"]), d["lp"]
    bpf = BPF(6, transforms=3, key=jax.random.PRNGKey(0))
    lp_k = jax.jit(lambda x: fused_nsf_log_prob(bpf, x))(x)
    with jax.default_matmul_precision("highest"):
        lp_x = xla(lambda: jax.jit(lambda x: bpf(None).log_prob(x))(x))
    for name, lp in [("kernel", lp_k), ("xla-highest", lp_x)]:
        e = jnp.abs(jnp.asarray(np.asarray(lp, np.float64) - lp64))
        print(f"bpf {name} vs f64 truth |max|: {float(e.max()):.3e} "
              f"median {float(jnp.median(e)):.3e}", flush=True)


@section("xla-baselines")
def _():
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        bench(scan_samples(lambda k: naf(None).sample(k, (4096,))),
              "naf XLA samples", 4096 * 8)
        bench(scan_samples(lambda k: unaf(None).sample(k, (1024,)), rep=4),
              "unaf XLA samples", 1024 * 4)
    finally:
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]


print("DONE", flush=True)
