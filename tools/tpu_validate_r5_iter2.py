r"""Round-5 warm-start follow-up: tail accuracy + UNAF + radius sweep.

tools/tpu_validate_r5_iter.py showed warm-started sweeps give +25% NAF
sampling at unchanged MEDIAN accuracy. Before making warm the default:
(a) tail stats (p99/max draw deviation and log q self-consistency — the
pegged/plateau rows a median hides), (b) the UNAF family through the same
solver, (c) _WARM_R 0.25 vs 0.0625 (2 fewer bisect evals).
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
from zuko_tpu.flows import NAF, UNAF
from zuko_tpu.ops.naf_fused import fused_naf_log_prob, fused_naf_sample

B_NAF = 1 << 20
B_UNAF = 1 << 17
CHECK_B = 65536

flows = {
    "naf": (NAF(5, 0, transforms=3, signal=8, key=jax.random.PRNGKey(0)),
            B_NAF),
    "unaf": (UNAF(5, 0, transforms=3, signal=8, key=jax.random.PRNGKey(0)),
             B_UNAF),
}
print("backend:", jax.default_backend(), flush=True)

CONFIGS = [("full", False, None), ("warm25", True, 0.25),
           ("warm06", True, 0.0625)]
results = {}

for fname, (flow, B) in flows.items():
    params, static = partition(flow)
    ref_draws = None
    for tag, warm, r in CONFIGS:
        nf._WARM_SWEEPS = warm
        if r is not None:
            nf._WARM_R = r

        @jax.jit
        def sample_big(params, key):
            f = combine(params, static)
            xs, lp = fused_naf_sample(f, key, (B,), want_log_prob=True)
            return jnp.sum(lp) + jnp.sum(xs[:, 0])

        @jax.jit
        def draws(params, key):
            f = combine(params, static)
            xs, lq = fused_naf_sample(f, key, (CHECK_B,), want_log_prob=True)
            return xs, lq, fused_naf_log_prob(f, xs)

        jax.block_until_ready(sample_big(params, jax.random.PRNGKey(2)))
        best = None
        for i in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(sample_big(params, jax.random.PRNGKey(2)))
            dt = time.perf_counter() - t0
            print(f"# {fname}/{tag} run {i}: {1e3 * dt:.1f} ms -> "
                  f"{B / dt / 1e6:.2f}M/s", flush=True)
            best = dt if best is None else min(best, dt)

        xs, lq, lp = jax.block_until_ready(
            draws(params, jax.random.PRNGKey(3)))
        sc = np.abs(np.asarray(lq) - np.asarray(lp))
        if ref_draws is None:
            ref_draws = np.asarray(xs)
            dev = np.zeros(1)
        else:
            dev = np.abs(np.asarray(xs) - ref_draws)
        results[f"{fname}/{tag}"] = {
            "Msamples_per_s": round(B / best / 1e6, 3),
            "selfcons_med": float(np.median(sc)),
            "selfcons_p99": float(np.quantile(sc, 0.99)),
            "selfcons_max": float(sc.max()),
            "dev_med": float(np.median(dev)),
            "dev_p99": float(np.quantile(dev, 0.99)),
            "dev_max": float(dev.max()),
        }
        print(f"{fname}/{tag}: {results[f'{fname}/{tag}']}", flush=True)

nf._WARM_SWEEPS = False
nf._WARM_R = 0.25
print(json.dumps(results))
