r"""On-hardware validation batch 10: hoisting weight-only work out of the
fused kernels. The grid re-runs the kernel body per batch tile, so the
MADE mask multiply and the bf16 hi/lo split of `_dot_split3` repeat
grid-many times; `_presplit_params` moves both into the wrapper.
A/B: density _PRESPLIT_DENSITY off/pair/cat (throughput + err vs f64
truth), sampling _PREMASK_SAMPLE off/on (throughput + bit parity)."""

import sys
import time
import traceback

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)


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


from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

d = np.load("tools/nsf_truth_f64.npz")
X, LP64 = jnp.asarray(d["x"]), d["lp"]
BIG = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))
REPS = 20
ks = jax.random.PRNGKey(7)


def bench_density(flow, label):
    lp = jax.jit(lambda x: nf.fused_nsf_log_prob(flow, x))(X)
    e = np.abs(np.asarray(lp, np.float64) - LP64)

    def loop(x):
        def body(c, i):
            return c + jnp.sum(nf.fused_nsf_log_prob(flow, x + 0.0 * i)), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(REPS))
        return out

    j = jax.jit(loop)
    j(BIG).block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        j(BIG).block_until_ready()
        best = max(best, REPS * BIG.shape[0] / (time.perf_counter() - t0))
    print(f"{label}: err max {e.max():.3e} median {np.median(e):.3e}  "
          f"throughput {best:,.0f} evals/s", flush=True)


@section("density-presplit-ab")
def _():
    flow = NSF(6, transforms=3, key=jax.random.PRNGKey(0))
    for mode in ["off", "pair", "cat"]:
        nf._PRESPLIT_DENSITY = mode
        try:
            bench_density(flow, f"nsf split3 presplit={mode}")
        finally:
            nf._PRESPLIT_DENSITY = "cat"


@section("sample-premask-ab")
def _():
    flow = NSF(6, transforms=3, key=jax.random.PRNGKey(0))
    N = 65536
    outs = {}
    for premask in [False, True]:
        nf._PREMASK_SAMPLE = premask
        try:
            outs[premask] = np.asarray(
                jax.jit(lambda k: nf.fused_nsf_sample(flow, k, (N,)))(ks)
            )

            def loop(k):
                def body(c, i):
                    s = nf.fused_nsf_sample(
                        flow, jax.random.fold_in(k, i), (N,))
                    return c + jnp.sum(s), None
                out, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
                return out

            j = jax.jit(loop)
            j(ks).block_until_ready()
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                j(ks).block_until_ready()
                best = max(best, 8 * N / (time.perf_counter() - t0))
            print(f"sample premask={premask}: {best:,.0f} samples/s",
                  flush=True)
        finally:
            nf._PREMASK_SAMPLE = True
    diff = np.abs(outs[False] - outs[True]).max()
    print(f"sample premask bit-parity: max abs diff {diff:.3e}", flush=True)


@section("samplelp-premask")
def _():
    # fused reverse-KL quantity with premask on: self-consistency of
    # log q vs the density kernel at the sampled points
    flow = NSF(6, transforms=3, key=jax.random.PRNGKey(0))
    x, lq = jax.jit(
        lambda k: nf.fused_nsf_sample(flow, k, (8192,), want_log_prob=True)
    )(ks)
    lp = jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(x)
    e = np.abs(np.asarray(lq, np.float64) - np.asarray(lp, np.float64))
    print(f"log q vs density kernel: max {e.max():.3e} "
          f"median {np.median(e):.3e}", flush=True)


@section("naf-default-confirm")
def _():
    # r9's winning solver config is now the module default — confirm the
    # committed code path (not the monkeypatched A/B) hits the numbers
    from zuko_tpu.flows import NAF
    from zuko_tpu.ops.naf_fused import fused_naf_sample

    naf = NAF(6, transforms=3, signal=16, key=jax.random.PRNGKey(0))

    def loop(k):
        def body(c, i):
            s = fused_naf_sample(naf, jax.random.fold_in(k, i), (4096,))
            return c + jnp.sum(s), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
        return out

    j = jax.jit(loop)
    j(ks).block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        j(ks).block_until_ready()
        best = max(best, 8 * 4096 / (time.perf_counter() - t0))
    print(f"naf default config: {best:,.0f} samples/s", flush=True)


print("DONE", flush=True)
