r"""On-hardware validation batch 47: fused polynomial (SOSPF/BPF)
sampling — coarse bisection + free-derivative Newton (the forward's own
log f'). Parity vs the XLA newton_bisection path, log q
self-consistency, throughput. This closes the LAST family gap: every
fused family now carries log_prob + sample + sample_and_log_prob."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import BPF, SOSPF

ks = jax.random.PRNGKey(7)

for cls, N in [(SOSPF, 2048), (BPF, 2048)]:
    flow = cls(6, transforms=3, key=jax.random.PRNGKey(0))
    d = flow(None)
    s = jax.jit(lambda k, d=d: d.sample(k, (N,)))(ks)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    with jax.default_matmul_precision("highest"):
        s_ref = jax.jit(lambda k: flow(None).sample(k, (N,)))(ks)
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
    ds = np.abs(np.asarray(s) - np.asarray(s_ref))
    print(f"{cls.__name__} sample vs XLA-highest: max {ds.max():.3e} p99"
          f" {np.quantile(ds, 0.99):.3e}", flush=True)

    xs, lq = jax.jit(lambda k, d=d: d.sample_and_log_prob(k, (N,)))(ks)
    lp = jax.jit(lambda v, d=d: d.log_prob(v))(xs)
    e = np.abs(np.asarray(lq, np.float64) - np.asarray(lp, np.float64))
    print(f"{cls.__name__} logq self-consistency: max {e.max():.3e} median"
          f" {np.median(e):.3e}", flush=True)

    def loop(k, d=d, N=N):
        def body(c, i):
            v = d.sample(jax.random.fold_in(k, i), (N,))
            return c + jnp.sum(v), None
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
    print(f"{cls.__name__} fused sampling: {best:,.0f} samples/s", flush=True)

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    j2 = jax.jit(loop)
    try:
        j2(ks).block_until_ready()
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            for i in range(3):
                out = j2(jax.random.fold_in(ks, i))
            out.block_until_ready()
            best = max(best, 3 * 4 * N / (time.perf_counter() - t0))
        print(f"{cls.__name__} XLA sampling: {best:,.0f} samples/s",
              flush=True)
    finally:
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

print("DONE", flush=True)
