r"""On-hardware validation batch 45: fused NAF/UNAF sample_and_log_prob
(the reverse-KL quantity, analytic forward ladj at the solved x) —
self-consistency vs the fused sampler's own density path + throughput."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NAF, UNAF

ks = jax.random.PRNGKey(7)

for cls, N, tol_note in [(NAF, 4096, "exact"), (UNAF, 1024, "quadrature")]:
    flow = cls(6, transforms=3, signal=16, key=jax.random.PRNGKey(0))
    d = flow(None)
    x, lq = jax.jit(lambda k, d=d: d.sample_and_log_prob(k, (N,)))(ks)
    lp = jax.jit(lambda v, d=d: d.log_prob(v))(x)
    e = np.abs(np.asarray(lq, np.float64) - np.asarray(lp, np.float64))
    print(f"{cls.__name__} logq vs density ({tol_note}): max {e.max():.3e}"
          f" median {np.median(e):.3e}", flush=True)

    def loop(k, d=d, N=N):
        def body(c, i):
            _, l = d.sample_and_log_prob(jax.random.fold_in(k, i), (N,))
            return c + jnp.sum(l), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(4))
        return out

    j = jax.jit(loop)
    j(ks).block_until_ready()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(3):
            out = j(jax.random.fold_in(ks, i))
        out.block_until_ready()
        best = max(best, 3 * 4 * N / (time.perf_counter() - t0))
    print(f"{cls.__name__} sample_and_log_prob: {best:,.0f} samples/s",
          flush=True)

print("DONE", flush=True)
