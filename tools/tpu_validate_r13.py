r"""On-hardware validation batch 13: flagship density A/B in ONE session
(tunnel variance makes cross-session comparisons untrustworthy; bench.py
read 62.0M for split3/no-presplit at 21:0x but 47.4M for split3/cat at
22:2x). Grid: presplit {off, cat} x dimension_semantics {None, parallel},
bench.py's exact loop (batch 65536, REPS=10, carry dependency)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

d = np.load("tools/nsf_truth_f64.npz")
X, LP64 = jnp.asarray(d["x"]), d["lp"]

flow = NSF(6, 0, transforms=3, hidden_features=(64, 64), bins=8,
           key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))
REPS = 10


def bench(label):
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
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(5):
            out = j(x)
        out.block_until_ready()
        best = max(best, 65536 * REPS * 5 / (time.perf_counter() - t0))
    print(f"{label}: {best:,.0f} evals/s  err max {e.max():.3e}"
          f" median {np.median(e):.3e}", flush=True)
    return best


for presplit in ["cat", "off"]:
    for sem in ["parallel", None]:
        nf._PRESPLIT_DENSITY = presplit
        nf._GRID_SEMANTICS = sem
        try:
            bench(f"presplit={presplit} sem={sem}")
        except Exception as ex:
            print(f"presplit={presplit} sem={sem} FAILED: {ex}", flush=True)
        finally:
            nf._PRESPLIT_DENSITY = "cat"
            nf._GRID_SEMANTICS = "parallel"

print("DONE", flush=True)
