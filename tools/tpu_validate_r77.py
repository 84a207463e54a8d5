r"""Batch 77 (round 4): dissect the per-call fixed cost that makes the
fused density launch-bound below ~100K rows (r72/r73: ~0.5ms fixed per
call at quiet host; 23.5M evals/s at b=65536 vs 143.8M at b=1M).

Three measurements, one session:
  (a) single-call t(B) for B = 2^12..2^20 -> linear fit (fixed, slope);
  (b) the weight-prep stage alone (mask multiply + bf16 presplit + cat,
      `nsf_fused._presplit_params`) as its own jit program;
  (c) the same t(B) with REPEATS=10 scanned in-jit (weight prep is
      loop-invariant -> hoisted once per call): if (a)-fixed ~= 10x
      (c)-fixed-per-repeat, the fixed cost is per-KERNEL-LAUNCH, not
      per-dispatch.
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

from zuko_tpu import flows
from zuko_tpu.core import combine, partition
from zuko_tpu.ops import nsf_fused

flow = flows.NSF(6, 0, transforms=3, key=jax.random.PRNGKey(0))
params, static = partition(flow)


def timeit(fn, *args, runs=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


# (a) single-call density
print("--- (a) single un-scanned call", flush=True)
rows_a = []
for lb in (12, 14, 16, 18, 20):
    B = 1 << lb
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 6))
    fn = jax.jit(lambda p, v: combine(p, static)(None).log_prob(v))
    t = timeit(fn, params, x)
    rows_a.append((B, t))
    print(f"  b=2^{lb}: {1e3*t:.2f} ms -> {B/t/1e6:.1f}M evals/s", flush=True)
Bs = np.array([r[0] for r in rows_a], float)
ts = np.array([r[1] for r in rows_a], float)
slope, fixed = np.polyfit(Bs, ts, 1)
print(f"  fit: fixed {1e3*fixed:.2f} ms/call, slope {1e9*slope:.2f} ns/row "
      f"(asymptote {1/slope/1e6:.0f}M evals/s)", flush=True)

# (b) weight prep alone
print("--- (b) weight-prep stage alone", flush=True)
flat_params, layout, cfg = nsf_fused._flatten_flow(flow)


@jax.jit
def prep(fp):
    kp, _ = nsf_fused._presplit_params(list(fp), layout, "cat")
    return [p.sum() for p in kp]


t = timeit(prep, flat_params)
print(f"  presplit(cat): {1e6*t:.0f} us/call", flush=True)

# (c) scanned calls (prep hoisted, kernel launched REPEATS times)
print("--- (c) 10 scanned kernel launches per dispatch", flush=True)
for lb in (14, 16, 18):
    B = 1 << lb
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 6))

    def loop(p, v):
        def body(carry, _):
            d = combine(p, static)(None)
            return carry + jnp.sum(d.log_prob(v + 1e-9 * carry)), None
        o, _ = jax.lax.scan(body, 0.0, None, length=10)
        return o
    fn = jax.jit(loop)
    t = timeit(fn, params, x)
    print(f"  b=2^{lb} x10: {1e3*t:.2f} ms -> {B*10/t/1e6:.1f}M evals/s "
          f"({1e3*t/10:.2f} ms/launch-equiv)", flush=True)

print("done", flush=True)
