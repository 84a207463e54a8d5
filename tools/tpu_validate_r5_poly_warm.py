r"""Round-5 poly-solver warm-start A/B on hardware (SOSPF/BPF sampling).

Mirrors tools/tpu_validate_r5_iter2.py for the polynomial iterative
inverse (`nsf_fused._poly_inverse_F`): full-bracket baseline vs the
warm-started later sweeps (ZUKO_TPU_POLY_WARM default), with tail accuracy
(p99/max draw deviation + log q self-consistency).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import zuko_tpu.ops.nsf_fused as nsf

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import BPF, SOSPF
from zuko_tpu.ops.nsf_fused import fused_nsf_log_prob, fused_nsf_sample

B = 1 << 20
CHECK_B = 65536

flows = {
    "sospf": SOSPF(5, 0, transforms=3, key=jax.random.PRNGKey(0)),
    "bpf": BPF(5, 0, transforms=3, key=jax.random.PRNGKey(0)),
}
print("backend:", jax.default_backend(), flush=True)

results = {}
for fname, flow in flows.items():
    params, static = partition(flow)
    ref_draws = None
    for tag, warm in (("full", False), ("warm", True)):
        nsf._POLY_WARM = warm

        @jax.jit
        def sample_big(params, key):
            f = combine(params, static)
            xs, lp = fused_nsf_sample(f, key, (B,), want_log_prob=True)
            return jnp.sum(lp) + jnp.sum(xs[:, 0])

        @jax.jit
        def draws(params, key):
            f = combine(params, static)
            xs, lq = fused_nsf_sample(f, key, (CHECK_B,), want_log_prob=True)
            return xs, lq, fused_nsf_log_prob(f, xs)

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
            "Msamples_per_s": round(B / best / 1e6, 2),
            "selfcons_med": float(np.median(sc)),
            "selfcons_p99": float(np.quantile(sc, 0.99)),
            "selfcons_max": float(sc.max()),
            "dev_p99": float(np.quantile(dev, 0.99)),
            "dev_max": float(dev.max()),
        }
        print(f"{fname}/{tag}: {results[f'{fname}/{tag}']}", flush=True)

nsf._POLY_WARM = True
print(json.dumps(results))
