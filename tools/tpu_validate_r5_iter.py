r"""Round-5 iteration-level dissection of the iterative samplers (NAF).

VERDICT r4 item 4: the iterative families' sampling throughput argument was
throughput-level, not iteration-level. This driver measures WHERE the NAF
sampling time goes — hyper sweeps vs bisection evals vs Newton polish — by
re-tracing fresh jits with module constants monkeypatched (the r56/r88
flag-at-trace-time dissection pattern), and A/Bs the r5 warm-started-sweep
variant (ZUKO_TPU_NAF_WARM: later sweeps bracket around the previous
sweep's root, cutting coarse bisection evals ~2x).

Variants (all at b=1M, blocked best-of-3, fresh compiles):
  full         baseline (10 coarse evals + 2+1 Newton per sweep)
  warm         warm sweeps (2 validity + 4 local-bisect evals per sweep>=1)
  shallow      _COARSE_XTOL=2.5 -> 3 coarse evals (accuracy floor probe)
  no-newton    _N_NEWTON=1 (final fine step only)
  min-solve    shallow + no-newton (approaches the hyper-only floor)

Accuracy per variant: log q self-consistency (fused log q at the draws vs
the fused density there) and draw deviation vs the full baseline.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import zuko_tpu.ops.naf_fused as nf

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NAF
from zuko_tpu.ops.naf_fused import fused_naf_log_prob, fused_naf_sample

B = 1 << 20
CHECK_B = 16384

flow = NAF(5, 0, transforms=3, signal=8, key=jax.random.PRNGKey(0))
params, static = partition(flow)
print("backend:", jax.default_backend(), flush=True)

VARIANTS = {
    "full": {},
    "warm": {"_WARM_SWEEPS": True},
    "shallow": {"_COARSE_XTOL": 2.5},
    "no-newton": {"_N_NEWTON": 1},
    "min-solve": {"_COARSE_XTOL": 2.5, "_N_NEWTON": 1},
}

defaults = {k: getattr(nf, k) for k in
            ("_WARM_SWEEPS", "_COARSE_XTOL", "_N_NEWTON")}
results = {}
x_ref = None

for name, patch in VARIANTS.items():
    for k, v in defaults.items():
        setattr(nf, k, patch.get(k, v))

    # fresh function objects -> fresh trace under the patched constants
    @jax.jit
    def sample_1m(params, key):
        f = combine(params, static)
        xs, lp = fused_naf_sample(f, key, (B,), want_log_prob=True)
        return jnp.sum(lp) + jnp.sum(xs[:, 0])

    @jax.jit
    def draws(params, key):
        f = combine(params, static)
        xs, lq = fused_naf_sample(f, key, (CHECK_B,), want_log_prob=True)
        return xs, lq, fused_naf_log_prob(f, xs)

    jax.block_until_ready(sample_1m(params, jax.random.PRNGKey(2)))
    best = None
    for r in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(sample_1m(params, jax.random.PRNGKey(2)))
        dt = time.perf_counter() - t0
        print(f"# {name} run {r}: {1e3 * dt:.1f} ms -> "
              f"{B / dt / 1e6:.2f}M samples/s", flush=True)
        best = dt if best is None else min(best, dt)

    xs, lq, lp = jax.block_until_ready(draws(params, jax.random.PRNGKey(3)))
    selfc = float(jnp.median(jnp.abs(lq - lp)))
    if x_ref is None:
        x_ref = np.asarray(xs)
        dev = 0.0
    else:
        dev = float(np.median(np.abs(np.asarray(xs) - x_ref)))
    results[name] = {
        "ms": round(1e3 * best, 1),
        "Msamples_per_s": round(B / best / 1e6, 2),
        "logq_selfcons_median": selfc,
        "draw_dev_vs_full_median": dev,
    }
    print(f"{name}: {results[name]}", flush=True)

for k, v in defaults.items():
    setattr(nf, k, v)

print(json.dumps(results))
