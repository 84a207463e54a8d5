r"""On-hardware validation batch 7 (sectioned — one failure does not kill
the run): the accurate bit-twiddle log (`_log_acc`) in every fused ladj
(TPU's hardware f32 log carries ~1e-4 max abs error — measured in batch 6
— which was the accuracy floor of all on-device log-densities), plus the
coarse-bisection + Newton-polish NAF/UNAF solver."""

import os
import sys
import time
import traceback

sys.path.insert(0, ".")

import numpy as np

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


def truth_check(label, flow, path, fused_fn):
    d = np.load(path)
    x, lp64 = jnp.asarray(d["x"]), d["lp"]
    lp_k = jax.jit(lambda x: fused_fn(flow, x))(x)
    with jax.default_matmul_precision("highest"):
        lp_x = xla(lambda: jax.jit(lambda x: flow(None).log_prob(x))(x))
    for name, lp in [("kernel", lp_k), ("xla-highest", lp_x)]:
        e = np.abs(np.asarray(lp, np.float64) - lp64)
        print(f"{label} {name} vs f64 truth |max|: {e.max():.3e} "
              f"median {np.median(e):.3e}", flush=True)


from zuko_tpu.flows import BPF, NAF, NSF, UNAF
from zuko_tpu.ops.naf_fused import fused_naf_sample
from zuko_tpu.ops.nsf_fused import _log_acc, fused_nsf_log_prob


@section("log-acc-lowering")
def _():
    v = np.random.default_rng(0).uniform(1e-6, 1e6, (1 << 16,)).astype(np.float32)
    o = np.asarray(jax.jit(_log_acc)(jnp.asarray(v)), np.float64)
    e = np.abs(o - np.log(v.astype(np.float64)))
    print(f"_log_acc on TPU: max {e.max():.3e} median {np.median(e):.3e}",
          flush=True)


@section("bpf-truth")
def _():
    truth_check("bpf", BPF(6, transforms=3, key=jax.random.PRNGKey(0)),
                "tools/bpf_truth_f64.npz", fused_nsf_log_prob)


@section("nsf-truth")
def _():
    truth_check("nsf", NSF(6, transforms=3, key=jax.random.PRNGKey(0)),
                "tools/nsf_truth_f64.npz", fused_nsf_log_prob)


@section("naf-newton")
def _():
    naf = NAF(6, transforms=3, signal=16, key=key)
    unaf = UNAF(6, transforms=3, signal=16, key=key)
    with jax.default_matmul_precision("highest"):
        naf_ref = xla(lambda: jax.jit(
            lambda k: naf(None).sample(k, (4096,)))(ks))
        unaf_ref = xla(lambda: jax.jit(
            lambda k: unaf(None).sample(k, (1024,)))(ks))
    s = jax.jit(lambda k: fused_naf_sample(naf, k, (4096,)))(ks)
    print("naf newton vs XLA(highest) |max|:",
          float(jnp.abs(s - naf_ref).max()), flush=True)
    su = jax.jit(lambda k: fused_naf_sample(unaf, k, (1024,)))(ks)
    print("unaf newton vs XLA(highest) |max|:",
          float(jnp.abs(su - unaf_ref).max()), flush=True)
    bench(scan_samples(lambda k: fused_naf_sample(naf, k, (4096,))),
          "naf fused samples (newton)", 4096 * 8)
    bench(scan_samples(lambda k: fused_naf_sample(unaf, k, (1024,)), rep=4),
          "unaf fused samples (newton)", 1024 * 4)


@section("flagship-bench-guard")
def _():
    flow = NSF(6, transforms=3, key=key)
    x = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))

    def nll(x):
        return -jnp.mean(fused_nsf_log_prob(flow, x))
    j = jax.jit(nll)
    j(x).block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            o = j(x)
        o.block_until_ready()
        best = max(best, 5 * 65536 / (time.perf_counter() - t0))
    print(f"flagship fused density: {best:,.0f} evals/s", flush=True)


print("DONE", flush=True)
