r"""Round-5 follow-up: can warm-started UNAF drop its 4th Newton step?

The r50 rationale for _N_NEWTON_UMNN=4 was the noisy GL-4 coarse bracket;
warm sweeps enter much closer. A/B at b=131K with accuracy tails.
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
from zuko_tpu.flows import UNAF
from zuko_tpu.ops.naf_fused import fused_naf_log_prob, fused_naf_sample

B = 1 << 17
CHECK_B = 65536

flow = UNAF(5, 0, transforms=3, signal=8, key=jax.random.PRNGKey(0))
params, static = partition(flow)
print("backend:", jax.default_backend(), flush=True)

results = {}
ref_draws = None
for tag, n_newton in (("newton4", 4), ("newton3", 3)):
    nf._N_NEWTON_UMNN = n_newton

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
        print(f"# {tag} run {i}: {1e3 * dt:.1f} ms -> "
              f"{B / dt / 1e6:.3f}M/s", flush=True)
        best = dt if best is None else min(best, dt)

    xs, lq, lp = jax.block_until_ready(draws(params, jax.random.PRNGKey(3)))
    sc = np.abs(np.asarray(lq) - np.asarray(lp))
    if ref_draws is None:
        ref_draws = np.asarray(xs)
        dev = np.zeros(1)
    else:
        dev = np.abs(np.asarray(xs) - ref_draws)
    results[tag] = {
        "Msamples_per_s": round(B / best / 1e6, 3),
        "selfcons_med": float(np.median(sc)),
        "selfcons_p99": float(np.quantile(sc, 0.99)),
        "dev_p99": float(np.quantile(dev, 0.99)),
        "dev_max": float(dev.max()),
    }
    print(f"{tag}: {results[tag]}", flush=True)

nf._N_NEWTON_UMNN = 4
print(json.dumps(results))
