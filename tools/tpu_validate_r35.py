r"""On-hardware validation batch 35: the MultivariateNormal
triangular-inverse reformulation (r34: the data-batched triangular solve
computed garbage for full-covariance GMM at b=65536 on TPU). Full-cov
GMM across batch sizes vs CPU + throughput."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.mixtures import GMM

cpu = jax.devices("cpu")[0]
gmm = GMM(43, components=10, covariance_type="full",
          key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 43))
with jax.default_device(cpu):
    lp_c = np.asarray(gmm(None).log_prob(jax.device_put(x[:2048], cpu)))

for b in [2048, 16384, 65536]:
    lp_t = np.asarray(jax.jit(lambda v: gmm(None).log_prob(v))(x[:b]))[:2048]
    d = np.abs(lp_t - lp_c)
    print(f"full-cov GMM b={b}: max {d.max():.3e} median {np.median(d):.3e}"
          f" frac>1 {float((d > 1).mean()):.3f}", flush=True)


def loop(v):
    def body(c, _):
        return c + jnp.sum(gmm(None).log_prob(v + 1e-9 * c)), None
    return jax.lax.scan(body, 0.0, None, length=8)[0]


j = jax.jit(loop)
j(x).block_until_ready()
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(3):
        out = j(x)
    out.block_until_ready()
    best = max(best, 3 * 8 * 65536 / (time.perf_counter() - t0))
print(f"full-cov GMM log_prob: {best:,.0f} evals/s", flush=True)

print("DONE", flush=True)
