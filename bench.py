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

Self-validation (the round-4 lesson): BENCH_r04.json shipped a physically
impossible ``sample_and_log_prob`` row (14.0B/s — 480x ``sample`` on the same
flow) from a degenerate remote-service compile that a round-5 re-measure
could not reproduce (tools/tpu_validate_r5_bench.py: 28.8M/s, values correct
vs CPU f64). The physical ordering ``rate(sample_and_log_prob) <=
rate(sample) <= rate(log_prob)`` is now asserted after measuring; a violation
triggers ONE re-measure through a freshly traced jit (a fresh compile roll),
and a persistent violation ships ``"invalid"`` markers instead of numbers.
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

# rate(sample_and_log_prob) <= rate(sample): strictly more work per row.
# 1.05 absorbs run-to-run tunnel noise between the two best-of-3 readings.
SANITY_MARGIN = 1.05


def _timed_best(tag, fn, args, total_rows, n=3):
    """Blocked per-run timings, best-of-n, with per-run stderr prints (the
    r59 lesson: an unblocked-dispatch aggregate once read 180x the physical
    rate at this batch — identical queued dispatches are not a safe
    harness). Returns (best_rate, per_run_times)."""
    fn(*args).block_until_ready()  # warmup / compile
    times = []
    for r in range(n):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        dt = time.perf_counter() - t0
        print(f"# {tag} run {r}: {1e3 * dt:.1f} ms -> "
              f"{total_rows / dt / 1e6:.1f}M/s", file=sys.stderr)
        times.append(dt)
    return total_rows / min(times), times


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

    def make_density_loop():
        @jax.jit
        def log_prob_loop(params, x):
            def body(carry, _):
                model = combine(params, static)
                # public API: on TPU this auto-dispatches to the fused Pallas
                # kernel (zuko_tpu/ops/dispatch.py); verified equivalent to
                # the XLA path to float32 roundoff
                return carry + jnp.sum(model(None).log_prob(x + 1e-9 * carry)), None

            out, _ = lax.scan(body, 0.0, None, length=REPEATS)
            return out

        return log_prob_loop

    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, FEATURES))
    key = jax.random.PRNGKey(2)

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

    rows = BATCH * REPEATS

    def measure_all():
        rates, runs = {}, {}
        rates["density"], runs["density"] = _timed_best(
            "density", make_density_loop(), (params, x), rows
        )
        for name, want in (("sample", False), ("sample_and_log_prob", True)):
            rates[name], runs[name] = _timed_best(
                name, make_sampling_loop(want), (params, key), rows
            )
        return rates, runs

    def violations(rates):
        out = []
        if rates["sample_and_log_prob"] > SANITY_MARGIN * rates["sample"]:
            out.append("sample_and_log_prob faster than sample")
        if rates["sample"] > SANITY_MARGIN * rates["density"]:
            out.append("sample faster than density")
        return out

    rates, runs = measure_all()
    bad = violations(rates)
    if bad:
        # one full re-measure through freshly traced jits — a fresh compile
        # roll for every program (jit caches per function object)
        print(f"# SANITY VIOLATION {bad}; re-measuring with fresh compiles",
              file=sys.stderr)
        rates, runs = measure_all()
        bad = violations(rates)

    return rates, runs, bad


def bench_reference():
    try:
        import torch

        # pin threads: the denominator must not wobble with host load
        torch.set_num_threads(min(8, os.cpu_count() or 8))

        sys.path.insert(0, "/root/reference")
        from zuko.flows import NSF as TorchNSF

        torch.manual_seed(0)
        flow = TorchNSF(
            FEATURES, 0, transforms=TRANSFORMS, hidden_features=HIDDEN,
            bins=BINS,
        )
        flow.eval()
        x = torch.randn(REF_BATCH, FEATURES)

        rates, runs = {}, {}
        with torch.no_grad():
            flow(None).log_prob(x)  # warmup
            flow(None).log_prob(x)
            n_iters = 5
            times = []
            # best-of-5: the denominator's residual round-to-round wobble
            # is HOST variance (the raw ref_runs_ms in the JSON shows each
            # run set internally consistent but sets ~30% apart), so take
            # the best the host showed
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(n_iters):
                    flow(None).log_prob(x)
                times.append((time.perf_counter() - t0) / n_iters)
            rates["density"] = REF_BATCH / min(times)
            runs["density"] = times

            # the sampling tier: torch draws fewer rows per call — the AR
            # inverse is `features` sequential hyper sweeps (reference:
            # zuko/transforms.py:994-1000) and a 65536-row batch takes
            # minutes on CPU
            sb = 8192
            d = flow(None)
            for name, call in (
                ("sample", lambda: d.sample((sb,))),
                ("sample_and_log_prob", lambda: d.rsample_and_log_prob((sb,))),
            ):
                call()  # warmup
                times = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    call()
                    times.append(time.perf_counter() - t0)
                rates[name] = sb / min(times)
                runs[name] = times
        return rates, runs
    except Exception as e:  # pragma: no cover
        print(f"# reference bench failed: {e}", file=sys.stderr)
        return {}, {}


def main():
    rates, runs, bad = bench_ours()
    ref_rates, ref_runs = bench_reference()

    density_invalid = "sample faster than density" in bad
    slp_invalid = bad != []

    vs = None
    if ref_rates.get("density") and not density_invalid:
        vs = rates["density"] / ref_rates["density"]

    extra = {}
    for name in ("sample", "sample_and_log_prob"):
        invalid = slp_invalid if name == "sample_and_log_prob" else density_invalid
        if invalid:
            extra[f"{name}_per_s"] = "invalid"
            continue
        extra[f"{name}_per_s"] = round(rates[name], 1)
        if ref_rates.get(name):
            extra[f"{name}_vs_baseline"] = round(rates[name] / ref_rates[name], 2)
    if bad:
        extra["sanity_violations"] = bad
    # raw per-run times, both sides (honest-baseline record: the ratio's
    # round-to-round wobble is diagnosable from the JSON alone)
    extra["runs_ms"] = {
        k: [round(1e3 * t, 2) for t in v] for k, v in runs.items()
    }
    if ref_runs:
        extra["ref_runs_ms"] = {
            k: [round(1e3 * t, 2) for t in v] for k, v in ref_runs.items()
        }

    print(json.dumps({
        "metric": "nsf_log_prob_evals_per_s_per_chip",
        "value": "invalid" if density_invalid else round(rates["density"], 1),
        "unit": "evals/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
