r"""Serving latency tier: p50/p90/p99 per-call latency at serving batches.

All round-4 perf rows are throughput-at-1M-rows; serving cares about
per-call latency at b=1K-256K where the tunnel-dispatch-bound regime lives
(PERF.md r72/r77: the fixed cost is the dispatch RTT — 2.5 ms quiet, ~25 ms
congested — not device-side launch overhead). This driver measures, for the
flagship NSF density and sample_and_log_prob:

* per-call BLOCKED latency percentiles (the serving p50/p99 contract);
* depth-2 double-buffered throughput (submit call i+1 before blocking
  call i — hides one dispatch RTT behind device compute; every call uses
  DISTINCT inputs, so this is NOT the identical-queued-dispatch hazard of
  PERF.md r59, and every result is blocked on before the clock stops).

Run on a QUIET host (nothing else on the tunnel or the chip).

Usage: python tools/serving_latency.py [--calls 50]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

p = argparse.ArgumentParser()
p.add_argument("--calls", type=int, default=50)
p.add_argument("--batches", type=int, nargs="*",
               default=[1024, 4096, 16384, 65536, 262144])
args = p.parse_args()

import jax
import jax.numpy as jnp
import numpy as np

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF

FEATURES, TRANSFORMS, HIDDEN, BINS = 6, 3, (64, 64), 8

flow = NSF(FEATURES, 0, transforms=TRANSFORMS, hidden_features=HIDDEN,
           bins=BINS, key=jax.random.PRNGKey(0))
params, static = partition(flow)
print("backend:", jax.default_backend(), flush=True)


def pct(ts):
    a = 1e3 * np.asarray(ts)
    return {
        "p50_ms": round(float(np.percentile(a, 50)), 2),
        "p90_ms": round(float(np.percentile(a, 90)), 2),
        "p99_ms": round(float(np.percentile(a, 99)), 2),
    }


rows = []
for b in args.batches:
    x = jax.random.normal(jax.random.PRNGKey(1), (b, FEATURES))

    @jax.jit
    def density(params, x, i):
        model = combine(params, static)
        # fold the call index in so every dispatch is distinct
        return jnp.sum(model(None).log_prob(x + 1e-12 * i))

    @jax.jit
    def slp(params, key):
        model = combine(params, static)
        xs, lp = model(None).sample_and_log_prob(key, (b,))
        return jnp.sum(lp) + jnp.sum(xs[:, 0])

    for name, call in (
        ("density", lambda i: density(params, x, jnp.float32(i))),
        ("sample_and_log_prob",
         lambda i: slp(params, jax.random.fold_in(jax.random.PRNGKey(2), i))),
    ):
        call(0).block_until_ready()  # compile

        # blocked per-call latency
        ts = []
        for i in range(args.calls):
            t0 = time.perf_counter()
            call(i).block_until_ready()
            ts.append(time.perf_counter() - t0)

        # depth-2 double-buffered throughput: keep one call in flight
        t0 = time.perf_counter()
        prev = call(args.calls)
        for i in range(args.calls + 1, 2 * args.calls):
            nxt = call(i)
            prev.block_until_ready()
            prev = nxt
        prev.block_until_ready()
        piped = (time.perf_counter() - t0) / args.calls

        row = {
            "op": name, "batch": b, **pct(ts),
            "blocked_rows_per_s_M": round(b / np.median(ts) / 1e6, 2),
            "piped_rows_per_s_M": round(b / piped / 1e6, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

print(json.dumps({"table": rows}))
