r"""On-hardware validation batch 5 (sectioned — one failure does not kill the
run): chunked-quadrature UNAF sampling kernel, polynomial densities at
f32-exact precision, GF rolled sampling parity, and solver-kernel
throughput."""

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


from zuko_tpu.flows import BPF, GF, NAF, SOSPF, UNAF
from zuko_tpu.ops.naf_fused import fused_naf_sample
from zuko_tpu.ops.nsf_fused import fused_nsf_log_prob

naf = NAF(6, transforms=3, signal=16, key=key)
unaf = UNAF(6, transforms=3, signal=16, key=key)


@section("unaf-chunked")
def _():
    t0 = time.perf_counter()
    u_k = jax.jit(lambda k: fused_naf_sample(unaf, k, (1024,)))(ks)
    u_k.block_until_ready()
    print(f"unaf chunked kernel compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    with jax.default_matmul_precision("highest"):
        u_xh = xla(lambda: jax.jit(
            lambda k: unaf(None).sample(k, (1024,)))(ks))
    print("unaf chunked vs XLA(highest) |max|:",
          float(jnp.abs(u_k - u_xh).max()), flush=True)


@section("poly-highest")
def _():
    for cls, name in [(SOSPF, "sospf"), (BPF, "bpf")]:
        flow = cls(6, transforms=3, key=key)
        x = jax.random.normal(jax.random.PRNGKey(1), (4096, 6))
        lp_k = jax.jit(lambda x, f=flow: fused_nsf_log_prob(f, x))(x)
        with jax.default_matmul_precision("highest"):
            lp_x = xla(lambda f=flow: jax.jit(
                lambda x: f(None).log_prob(x))(x))
        print(f"{name} kernel vs XLA(highest) |max|:",
              float(jnp.abs(lp_k - lp_x).max()), flush=True)


@section("gf-rolled-sampling")
def _():
    import jax.tree_util as jtu

    from zuko_tpu.core import combine, partition
    from zuko_tpu.ops.gf_fused import fused_gf_log_prob, fused_gf_sample

    gf = GF(6, transforms=3, key=key)
    p, st = partition(gf)
    gf = combine(jtu.tree_map(lambda a: a * 0.3, p), st)
    g_k, g_lq = jax.jit(
        lambda k: fused_gf_sample(gf, k, (4096,), want_log_prob=True)
    )(ks)
    g_x = xla(lambda: jax.jit(lambda k: gf(None).sample(k, (4096,)))(ks))
    e = jnp.abs(g_k - g_x)
    print("gf rolled sample vs XLA median:", float(jnp.median(e)),
          "q95:", float(jnp.quantile(e, 0.95)), flush=True)
    es = jnp.abs(g_lq - fused_gf_log_prob(gf, g_k))
    print("gf logq self-consistency median:", float(jnp.median(es)),
          flush=True)
    bench(scan_samples(lambda k: fused_gf_sample(gf, k, (4096,))),
          "gf fused samples", 4096 * 8)


@section("naf-throughput")
def _():
    bench(scan_samples(lambda k: fused_naf_sample(naf, k, (4096,))),
          "naf fused samples", 4096 * 8)
    bench(scan_samples(lambda k: fused_naf_sample(unaf, k, (1024,)), rep=4),
          "unaf fused samples", 1024 * 4)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    bench(scan_samples(lambda k: naf(None).sample(k, (4096,))),
          "naf XLA samples", 4096 * 8)
    bench(scan_samples(lambda k: unaf(None).sample(k, (1024,)), rep=4),
          "unaf XLA samples", 1024 * 4)
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]


print("DONE", flush=True)
