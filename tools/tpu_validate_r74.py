r"""Batch 74 (round 4): per-family throughput re-pins at PRODUCTION batch.

The r72/r73 discovery: the fused kernels are launch-overhead-bound below
~100K rows (flagship 23.5M evals/s @65K vs 143.8M @1M, same values), so
every per-family number recorded at b=16-65K understates the kernel.
This sweep re-pins density / fused sample / sample_and_log_prob for the
whole zoo at b=1M (spline/coupling/GF families) or the largest
VMEM-feasible batch (NAF/UNAF/CNF), with BLOCKED per-run timings (the
r59/r73 harness rule: no queued identical dispatches, no compile cache).
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

from zuko_tpu import flows
from zuko_tpu.core import combine, partition

D = 6
KEY = jax.random.PRNGKey(0)


def bench_family(name, flow, B, do_density=True, do_sample=True,
                 do_slp=True, runs=3):
    params, static = partition(flow)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    out = {}

    if do_density:
        def dens(p, v):
            def body(carry, _):
                d = combine(p, static)(None)
                return carry + jnp.sum(d.log_prob(v + 1e-9 * carry)), None
            o, _ = jax.lax.scan(body, 0.0, None, length=5)
            return o
        fn = jax.jit(dens)
        fn(params, x).block_until_ready()
        best = 0.0
        for r in range(runs):
            t0 = time.perf_counter()
            fn(params, x).block_until_ready()
            dt = time.perf_counter() - t0
            rate = B * 5 / dt / 1e6
            best = max(best, rate)
            print(f"  {name} density b={B} run {r}: {1e3*dt:.0f} ms -> "
                  f"{rate:.1f}M evals/s", flush=True)
        out["density"] = best

    if do_sample:
        def samp(p, k):
            def body(carry, i):
                f = combine(p, static)
                xs = f(None).sample(jax.random.fold_in(k, i), (B,))
                # consume EVERY row: a carry on xs[0] alone let XLA
                # slice-push the whole solve down to one row for families
                # whose sampler is jnp-level (BPF read 2.4G samples/s)
                return carry + jnp.sum(xs) * 1e-9, None
            o, _ = jax.lax.scan(body, 0.0, jnp.arange(3))
            return o
        fn = jax.jit(samp)
        fn(params, KEY).block_until_ready()
        best = 0.0
        for r in range(runs):
            t0 = time.perf_counter()
            fn(params, jax.random.fold_in(KEY, r)).block_until_ready()
            dt = time.perf_counter() - t0
            rate = B * 3 / dt / 1e6
            best = max(best, rate)
            print(f"  {name} sample b={B} run {r}: {1e3*dt:.0f} ms -> "
                  f"{rate:.2f}M samples/s", flush=True)
        out["sample"] = best

    if do_slp:
        def slp(p, k):
            def body(carry, i):
                f = combine(p, static)
                xs, lq = f(None).sample_and_log_prob(
                    jax.random.fold_in(k, i), (B,))
                return carry + 1e-9 * (jnp.sum(xs) + jnp.sum(lq)), None
            o, _ = jax.lax.scan(body, 0.0, jnp.arange(3))
            return o
        fn = jax.jit(slp)
        fn(params, KEY).block_until_ready()
        best = 0.0
        for r in range(runs):
            t0 = time.perf_counter()
            fn(params, jax.random.fold_in(KEY, r)).block_until_ready()
            dt = time.perf_counter() - t0
            rate = B * 3 / dt / 1e6
            best = max(best, rate)
            print(f"  {name} sample+logq b={B} run {r}: {1e3*dt:.0f} ms -> "
                  f"{rate:.2f}M samples/s", flush=True)
        out["slp"] = best
    return out


results = {}
M1 = 1 << 20
fams = [
    ("MAF", lambda: flows.MAF(D, 0, transforms=3, key=KEY), M1),
    ("NCSF", lambda: flows.NCSF(D, 0, transforms=3, key=KEY), M1),
    ("NICE", lambda: flows.NICE(D, 0, transforms=3, key=KEY), M1),
    ("SOSPF", lambda: flows.SOSPF(D, 0, transforms=3, key=KEY), M1),
    ("BPF", lambda: flows.BPF(D, 0, transforms=3, key=KEY), M1),
    ("GF", lambda: flows.GF(D, 0, transforms=3, key=KEY), M1),
    ("NAF", lambda: flows.NAF(D, 0, transforms=3, key=KEY), 1 << 18),
    ("UNAF", lambda: flows.UNAF(D, 0, transforms=3, key=KEY), 1 << 16),
    ("CNF", lambda: flows.CNF(D, 0, key=KEY), 1 << 18),
]
for name, mk, B in fams:
    try:
        results[name] = bench_family(name, mk(), B)
    except Exception as e:
        print(f"  {name} FAILED: {type(e).__name__}: {e}", flush=True)

print(flush=True)
for name, r in results.items():
    row = "  ".join(f"{k} {v:.2f}M" for k, v in r.items())
    print(f"{name:>6}: {row}", flush=True)
print("done", flush=True)
