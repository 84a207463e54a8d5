r"""Benchmark: NSF log_prob + sampling throughput per chip vs the reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

The primary metric is NSF density-evaluation throughput (log_prob evals/s on
one chip, UCI-POWER-shaped inputs: D=6, 3 transforms, hidden 64x64, 8 bins).
``vs_baseline`` is the speedup over the reference implementation
(probabilists/zuko on torch-CPU, the only hardware the reference supports
here), measured in-process on the same host. ``extra`` carries the sampling
tier on the same flow: fused ``sample`` and ``sample_and_log_prob``
(the reverse-KL quantity, reference: zuko/distributions.py:129-138)
samples/s, each with its own torch-CPU comparison.
"""

import json
import os
import sys
import time

# Throughput is measured at the production batch: the fused kernels are
# per-LAUNCH-overhead-bound below ~100K rows (r72: the flagship reads 23M
# evals/s at b=65536 but 144M at b=1M in the same session, bit-identical
# values row-for-row), so the per-chip capability is the large-batch rate.
# The torch reference is measured at its own throughput-flat batch (65536;
# bigger batches only slow it down via allocator churn).
BATCH = 1048576
REF_BATCH = 65536
FEATURES = 6
TRANSFORMS = 3
HIDDEN = (64, 64)
BINS = 8
REPEATS = 10  # amortized inside one jit call (the tunnel adds ~3.5 ms/call)


def bench_ours():
    import jax
    import jax.numpy as jnp

    from jax import lax

    # NO persistent compile cache here: a cached AOT blob compiled while the
    # remote compile service was under load ran the same program 6x slower
    # (24.6M vs 143.6M evals/s) forever after — every bench run pays a fresh
    # compile (~minutes) and gets a fresh roll; the per-run stderr timings
    # expose a bad one.

    from zuko_tpu.core import combine, partition
    from zuko_tpu.flows import NSF

    flow = NSF(
        FEATURES, 0, transforms=TRANSFORMS, hidden_features=HIDDEN,
        bins=BINS, key=jax.random.PRNGKey(0),
    )
    params, static = partition(flow)

    @jax.jit
    def log_prob_loop(params, x):
        def body(carry, _):
            model = combine(params, static)
            # public API: on TPU this auto-dispatches to the fused Pallas
            # kernel (zuko_tpu/ops/dispatch.py); verified equivalent to the
            # XLA path to float32 roundoff
            return carry + jnp.sum(model(None).log_prob(x + 1e-9 * carry)), None

        out, _ = lax.scan(body, 0.0, None, length=REPEATS)
        return out

    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, FEATURES))

    # warmup / compile
    log_prob_loop(params, x).block_until_ready()

    # Per-run BLOCKED timings, best of 3 (congestion spikes), printed to
    # stderr for sanity (the r59 lesson: an unblocked-dispatch aggregate
    # once read 180x the physical rate at this batch — identical queued
    # dispatches are not a safe harness; at b=1M one program runs ~70 ms,
    # so the ~3 ms tunnel round-trip it pays per run is noise).
    best = 0.0
    for r in range(3):
        t0 = time.perf_counter()
        log_prob_loop(params, x).block_until_ready()
        dt = time.perf_counter() - t0
        print(f"# density run {r}: {1e3 * dt:.1f} ms -> "
              f"{BATCH * REPEATS / dt / 1e6:.1f}M evals/s", file=sys.stderr)
        best = max(best, BATCH * REPEATS / dt)

    # sampling tier: fused sample / sample_and_log_prob through the public
    # API (same dispatch as log_prob), keys folded in-loop so every draw set
    # is distinct, loop amortized inside one jit call
    def make_sampling_loop(want_log_prob):
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

    extra = {}
    key = jax.random.PRNGKey(2)
    for name, want in (("sample", False), ("sample_and_log_prob", True)):
        loop = make_sampling_loop(want)
        loop(params, key).block_until_ready()
        rate = 0.0
        for r in range(3):
            t0 = time.perf_counter()
            loop(params, key).block_until_ready()
            dt = time.perf_counter() - t0
            print(f"# {name} run {r}: {1e3 * dt:.1f} ms -> "
                  f"{BATCH * REPEATS / dt / 1e6:.1f}M/s", file=sys.stderr)
            rate = max(rate, BATCH * REPEATS / dt)
        extra[name] = rate
    return best, extra


def bench_reference():
    try:
        import torch

        sys.path.insert(0, "/root/reference")
        from zuko.flows import NSF as TorchNSF

        torch.manual_seed(0)
        flow = TorchNSF(
            FEATURES, 0, transforms=TRANSFORMS, hidden_features=HIDDEN,
            bins=BINS,
        )
        flow.eval()
        x = torch.randn(REF_BATCH, FEATURES)

        with torch.no_grad():
            flow(None).log_prob(x)  # warmup
            n_iters = 5
            t0 = time.perf_counter()
            for _ in range(n_iters):
                flow(None).log_prob(x)
            dt = time.perf_counter() - t0
            density = REF_BATCH * n_iters / dt

            # the sampling tier: torch draws fewer rows per call — the AR
            # inverse is `features` sequential hyper sweeps (reference:
            # zuko/transforms.py:994-1000) and a 65536-row batch takes
            # minutes on CPU
            sb = 8192
            extra = {}
            d = flow(None)
            d.sample((sb,))  # warmup
            t0 = time.perf_counter()
            d.sample((sb,))
            extra["sample"] = sb / (time.perf_counter() - t0)
            d.rsample_and_log_prob((sb,))  # warmup
            t0 = time.perf_counter()
            d.rsample_and_log_prob((sb,))
            extra["sample_and_log_prob"] = sb / (time.perf_counter() - t0)
        return density, extra
    except Exception as e:  # pragma: no cover
        print(f"# reference bench failed: {e}", file=sys.stderr)
        return None, {}


def main():
    ours, ours_extra = bench_ours()
    ref, ref_extra = bench_reference()
    vs = (ours / ref) if ref else None
    extra = {}
    for name, rate in ours_extra.items():
        extra[f"{name}_per_s"] = round(rate, 1)
        if ref_extra.get(name):
            extra[f"{name}_vs_baseline"] = round(rate / ref_extra[name], 2)
    print(json.dumps({
        "metric": "nsf_log_prob_evals_per_s_per_chip",
        "value": round(ours, 1),
        "unit": "evals/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
