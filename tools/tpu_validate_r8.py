r"""On-hardware validation batch 8: hyper-matmul precision A/B for the
fused density kernels. The single bf16 MXU pass costs ~2e-3 median on NSF
log-densities vs f64 truth (batch 7); `_dot_split3` (3 explicit bf16
passes) should recover ~1e-5 at little cost if the kernel is VPU-bound as
PERF.md's roofline says. Throughput is measured scan-amortized (one jit
dispatch per measurement) exactly like bench.py."""

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


from zuko_tpu.flows import BPF, NSF, SOSPF
from zuko_tpu.ops import nsf_fused as nf

d = np.load("tools/nsf_truth_f64.npz")
X, LP64 = jnp.asarray(d["x"]), d["lp"]
BIG = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))
REPS = 20


def measure(flow, prec, label):
    nf._DENSITY_HYPER_PREC = prec
    try:
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
    finally:
        nf._DENSITY_HYPER_PREC = "split3"


@section("nsf-precision-ab")
def _():
    flow = NSF(6, transforms=3, key=jax.random.PRNGKey(0))
    for prec, label in [
        (None, "nsf 1-pass"),
        ("split3", "nsf split3"),
        (jax.lax.Precision.HIGHEST, "nsf 6-pass"),
    ]:
        measure(flow, prec, label)


@section("poly-split3")
def _():
    # polynomials currently force 6-pass; can they drop to split3?
    bd = np.load("tools/bpf_truth_f64.npz")
    xb, lpb = jnp.asarray(bd["x"]), bd["lp"]
    bpf = BPF(6, transforms=3, key=jax.random.PRNGKey(0))
    for prec in ["split3", jax.lax.Precision.HIGHEST]:
        orig = nf._full_math_T.__defaults__
        # monkeypatch via the univ gate: temporarily evaluate with the
        # density prec forced for polynomials too
        src_prec = prec

        def patched(flow, x, prec=src_prec):
            flat, layout, cfg = nf._flatten_flow(flow)
            xT = x.T
            acc = None
            for entry in nf._split_layers(list(flat), layout):
                if entry[0] == "softclip":
                    xT, ladj = nf._softclip_forward_F(xT, entry[1])
                else:
                    _, ps, _ = entry
                    h = nf._hyper_T(xT, None, ps, precision=prec)
                    xT, ladj = nf._univ_forward_F(
                        xT, h, 6, cfg["bins"], float(cfg["bound"]),
                        float(cfg["slope"]), cfg["univ"])
                acc = ladj if acc is None else acc + ladj
            import math as m
            lp = jnp.sum(acc - 0.5 * xT**2, axis=0) \
                - 0.5 * 6 * m.log(2 * m.pi)
            return lp
        lp = jax.jit(lambda x: patched(bpf, x))(xb)
        e = np.abs(np.asarray(lp, np.float64) - lpb)
        print(f"bpf jnp-math {prec}: max {e.max():.3e} "
              f"median {np.median(e):.3e}", flush=True)


print("DONE", flush=True)
