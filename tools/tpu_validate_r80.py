r"""r80: is the b=1M flagship headline still per-iteration-overhead-bound?

The r73 fit said ~4.6 ns/row asymptotic (218M evals/s) with ~2.5 ms fixed
per DISPATCH — but bench.py amortizes 10 iterations inside one jit scan,
yet still reads 143.6M, implying ~2.4 ms of per-ITERATION overhead inside
the scan (weight prep + launch + carry). If that is real, growing the
per-iteration batch amortizes it directly: b=4M should read ~190M.

Measures the bench.py loop (same program construction, fresh compile, no
cache) at b = 1M / 2M / 4M, REPEATS scaled to hold total rows at 12M
per call. Blocked per-run timings, one session, printed per run.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

BATCHES = [(1048576, 12), (2097152, 6), (4194304, 3)]
FEATURES = 6
TRANSFORMS = 3
HIDDEN = (64, 64)
BINS = 8


def main():
    import jax
    import jax.numpy as jnp

    from jax import lax

    from zuko_tpu.core import combine, partition
    from zuko_tpu.flows import NSF

    print(f"# devices: {jax.devices()}", flush=True)

    flow = NSF(
        FEATURES, 0, transforms=TRANSFORMS, hidden_features=HIDDEN,
        bins=BINS, key=jax.random.PRNGKey(0),
    )
    params, static = partition(flow)

    results = {}
    for batch, repeats in BATCHES:
        @jax.jit
        def log_prob_loop(params, x, repeats=repeats):
            def body(carry, _):
                model = combine(params, static)
                return carry + jnp.sum(
                    model(None).log_prob(x + 1e-9 * carry)), None

            out, _ = lax.scan(body, 0.0, None, length=repeats)
            return out

        x = jax.random.normal(jax.random.PRNGKey(1), (batch, FEATURES))
        t0 = time.perf_counter()
        log_prob_loop(params, x).block_until_ready()
        print(f"# b={batch}: compile+warmup {time.perf_counter()-t0:.1f}s",
              flush=True)

        best = 0.0
        times = []
        for r in range(4):
            t0 = time.perf_counter()
            log_prob_loop(params, x).block_until_ready()
            dt = time.perf_counter() - t0
            times.append(dt)
            rate = batch * repeats / dt
            print(f"# b={batch} run {r}: {1e3*dt:.1f} ms -> "
                  f"{rate/1e6:.1f}M evals/s "
                  f"({1e3*dt/repeats:.2f} ms/iter, "
                  f"{1e9*dt/(batch*repeats):.2f} ns/row)", flush=True)
            best = max(best, rate)
        results[batch] = (best, min(times))

    # fit per-iteration fixed cost from the best (min-time) runs:
    # t/iter = fixed + ns_per_row * batch
    import numpy as np

    bs = np.array([b for b, _ in BATCHES], dtype=np.float64)
    t_iter = np.array(
        [results[b][1] / r for b, r in BATCHES], dtype=np.float64)
    A = np.stack([np.ones_like(bs), bs], axis=1)
    (fixed, per_row), *_ = np.linalg.lstsq(A, t_iter, rcond=None)
    print(f"\n# fit: {1e3*fixed:.2f} ms fixed/iter + "
          f"{1e9*per_row:.2f} ns/row (asymptote "
          f"{1/per_row/1e6:.0f}M evals/s)")
    for b, _ in BATCHES:
        print(f"b={b}: best {results[b][0]/1e6:.1f}M evals/s")


if __name__ == "__main__":
    main()
