r"""On-hardware validation batch 50: the round-3 roofline levers, one session.

A) Flagship density A/B: `_spline_forward_F` (materialized knot lists +
   separate searchsorted/bin-select) vs `_spline_forward_fused_F` (constraint
   pass, membership, and bin-parameter selection fused into one running sweep
   over the K bins — the round-2 PERF.md named lever). bench.py's exact loop,
   accuracy vs the pinned f64 truth (tools/nsf_truth_f64.npz).

B) UNAF sampling quadrature sweep (round-2 floor: 137.7K samples/s at
   8-pt coarse / 16-pt Newton): lower-order rules, fewer Newton steps —
   or a journaled proof the solver is quadrature-bound.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF, UNAF
from zuko_tpu.ops import naf_fused as nafm, nsf_fused as nf

# ------------------------------------------------------------- A) binsel A/B
d = np.load("tools/nsf_truth_f64.npz")
X, LP64 = jnp.asarray(d["x"]), d["lp"]

flow = NSF(6, 0, transforms=3, hidden_features=(64, 64), bins=8,
           key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))
REPS = 10


def bench_density(label):
    lp = jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(X)
    e = np.abs(np.asarray(lp, np.float64) - LP64)

    def loop(x):
        def body(carry, _):
            return carry + jnp.sum(
                nf.fused_nsf_log_prob(flow, x + 1e-9 * carry)), None
        out, _ = lax.scan(body, 0.0, None, length=REPS)
        return out

    j = jax.jit(loop)
    j(x).block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = j(x)
        out.block_until_ready()
        best = max(best, 65536 * REPS * 5 / (time.perf_counter() - t0))
    print(f"A {label}: {best:,.0f} evals/s  err max {e.max():.3e}"
          f" median {np.median(e):.3e}", flush=True)
    return best


for fused_binsel in [False, True, False]:  # control / lever / re-control
    nf._FUSED_BINSEL = fused_binsel
    try:
        bench_density(f"binsel_fused={fused_binsel}")
    finally:
        nf._FUSED_BINSEL = False

# ------------------------------------------------------- B) UNAF quadrature
uflow = UNAF(6, 0, transforms=3, signal=8, key=jax.random.PRNGKey(2))
NS = 16384


def bench_unaf(label):
    j = jax.jit(lambda k: nafm.fused_naf_sample(uflow, k, (NS,)))
    j(jax.random.PRNGKey(0)).block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [j(jax.random.PRNGKey(i)) for i in range(3)]  # pipelined
        outs[-1].block_until_ready()
        best = max(best, NS * 3 / (time.perf_counter() - t0))
    # parity: the default-config XLA comparison is done by tpu_regression;
    # here pin self-consistency via the fused density at the draws
    xs = j(jax.random.PRNGKey(9))
    lp = jax.jit(lambda v: nafm.fused_naf_log_prob(uflow, v))(xs)
    print(f"B {label}: {best / 1e3:.1f}K samples/s  density finite "
          f"{bool(jnp.all(jnp.isfinite(lp)))}", flush=True)
    return best


defaults = (
    nafm._UMNN_COARSE_N, nafm._UMNN_NEWTON_N, nafm._N_NEWTON,
    nafm._COARSE_XTOL,
)
GRID = [
    ("default 8c/16n/3N", 8, 16, 3, 2e-2),
    ("4c/16n/3N", 4, 16, 3, 2e-2),
    ("8c/8n/3N", 8, 8, 3, 2e-2),
    ("4c/8n/4N", 4, 8, 4, 2e-2),
    ("8c/16n/2N xtol5e-2", 8, 16, 2, 5e-2),
]
results = {}
for label, cn, nn, n_newton, xtol in GRID:
    nafm._UMNN_COARSE_N = cn
    nafm._GL_NODES_C, nafm._GL_WEIGHTS_C = np.polynomial.legendre.leggauss(cn)
    nafm._UMNN_NEWTON_N = nn
    nafm._GL_NODES_N, nafm._GL_WEIGHTS_N = np.polynomial.legendre.leggauss(nn)
    nafm._N_NEWTON = n_newton
    nafm._COARSE_XTOL = xtol
    try:
        results[label] = bench_unaf(label)
    except Exception as e:  # journal failures, keep sweeping
        print(f"B {label}: FAILED {type(e).__name__}: {e}", flush=True)

(nafm._UMNN_COARSE_N, nafm._UMNN_NEWTON_N, nafm._N_NEWTON,
 nafm._COARSE_XTOL) = defaults
nafm._GL_NODES_C, nafm._GL_WEIGHTS_C = np.polynomial.legendre.leggauss(
    defaults[0])
nafm._GL_NODES_N, nafm._GL_WEIGHTS_N = np.polynomial.legendre.leggauss(
    defaults[1])

# accuracy check at the best non-default config happens in a follow-up
# batch once the winner is known (single-session A/B discipline).
print("done", flush=True)
