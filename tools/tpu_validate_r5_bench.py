r"""Round-5 probe: the physically-impossible BENCH_r04 sample_and_log_prob row.

BENCH_r04.json recorded the flagship NSF ``sample_and_log_prob`` at 14.0B/s
(0.7-1.0 ms for 10x1M rows) while ``sample`` took 273 ms and density 72 ms on
the same flow — impossible, since sample_and_log_prob does strictly more work
than sample. This script reproduces the exact bench program shapes on the
real chip and cross-checks values, to decide between:

  (a) degenerate compile / elision of the want_log_prob=True scanned program;
  (b) silently wrong values on the TPU kernel path;
  (c) harness artifact.

Probes (all blocked, per-run prints — PERF.md timing discipline):
  A. single jitted sample_and_log_prob call at b=1M (no scan)
  B. single jitted sample call at b=1M
  C. the exact bench.py scan loops (REPEATS=10) for both
  D. value check at b=8192: lp from sample_and_log_prob vs log_prob(x) on
     device, and host dump for CPU f64 ground-truth comparison
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax

sys.path.insert(0, "/root/repo")

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF

BATCH = 1048576
FEATURES = 6
REPEATS = 10

flow = NSF(
    FEATURES, 0, transforms=3, hidden_features=(64, 64), bins=8,
    key=jax.random.PRNGKey(0),
)
params, static = partition(flow)
key = jax.random.PRNGKey(2)


def timed(tag, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    best = None
    for r in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        dt = time.perf_counter() - t0
        print(f"# {tag} run {r}: {1e3 * dt:.1f} ms", file=sys.stderr, flush=True)
        best = dt if best is None else min(best, dt)
    return best


# ---- A/B: single calls at b=1M ----
@jax.jit
def single_slp(params, key):
    model = combine(params, static)
    xs, lp = model(None).sample_and_log_prob(key, (BATCH,))
    return jnp.sum(lp) + jnp.sum(xs[:, 0])


@jax.jit
def single_s(params, key):
    model = combine(params, static)
    xs = model(None).sample(key, (BATCH,))
    return jnp.sum(xs[:, 0])


dt_slp = timed("A single sample_and_log_prob b=1M", single_slp, params, key)
dt_s = timed("B single sample b=1M", single_s, params, key)
print(f"A: {BATCH / dt_slp / 1e6:.2f}M/s  B: {BATCH / dt_s / 1e6:.2f}M/s",
      flush=True)


# ---- C: the exact bench.py scan loops ----
def make_loop(want_log_prob):
    @jax.jit
    def loop(params, key):
        def body(carry, i):
            model = combine(params, static)
            k = jax.random.fold_in(key, i)
            if want_log_prob:
                xs, lp = model(None).sample_and_log_prob(k, (BATCH,))
                return carry + jnp.sum(lp) + jnp.sum(xs[:, 0]), None
            xs = model(None).sample(k, (BATCH,))
            return carry + jnp.sum(xs[:, 0]), None

        out, _ = lax.scan(body, 0.0, jnp.arange(REPEATS))
        return out

    return loop


dt_scan_slp = timed("C scan sample_and_log_prob 10x1M", make_loop(True),
                    params, key)
dt_scan_s = timed("C scan sample 10x1M", make_loop(False), params, key)
print(
    f"C slp: {BATCH * REPEATS / dt_scan_slp / 1e6:.2f}M/s  "
    f"C s: {BATCH * REPEATS / dt_scan_s / 1e6:.2f}M/s", flush=True,
)

# ---- D: value check at b=8192 ----
b = 8192


@jax.jit
def pair(params, key):
    model = combine(params, static)
    d = model(None)
    xs, lp = d.sample_and_log_prob(key, (b,))
    lp2 = d.log_prob(xs)
    return xs, lp, lp2


xs, lp, lp2 = jax.block_until_ready(pair(params, key))
err = jnp.max(jnp.abs(lp - lp2))
print(f"D: max |lp - log_prob(x)| on device = {float(err):.3e}", flush=True)
np.savez(
    "/tmp/r5_bench_probe.npz",
    xs=np.asarray(xs), lp=np.asarray(lp), lp2=np.asarray(lp2),
)

print(json.dumps({
    "single_slp_ms": round(1e3 * dt_slp, 2),
    "single_s_ms": round(1e3 * dt_s, 2),
    "scan_slp_ms": round(1e3 * dt_scan_slp, 2),
    "scan_s_ms": round(1e3 * dt_scan_s, 2),
    "slp_vs_logprob_maxerr": float(err),
}))
