r"""On-hardware validation batch 34: is the big-batch XLA miscompile
confined to composed flow graphs, or does the mixture family (GMM /
Mixture: logsumexp over component densities, no layer composition) also
need the chunk guard? GMM diag and full at D=43, b=65536 vs CPU."""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.mixtures import GMM

cpu = jax.devices("cpu")[0]

for cov in ["diagonal", "full"]:
    gmm = GMM(43, components=10, covariance_type=cov,
              key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (65536, 43))
    lp_t = np.asarray(jax.jit(lambda v: gmm(None).log_prob(v))(x))[:2048]
    with jax.default_device(cpu):
        lp_c = np.asarray(gmm(None).log_prob(jax.device_put(x[:2048], cpu)))
    d = np.abs(lp_t - lp_c)
    print(f"GMM {cov} D=43 b=65536: max {d.max():.3e} median"
          f" {np.median(d):.3e} frac>1 {float((d > 1).mean()):.3f}",
          flush=True)

print("DONE", flush=True)
