r"""Gaussian mixture modeling with k-means++ initialization and gradient
refinement (reference capability: zuko/mixtures.py).

Run: python examples/gmm.py
"""

import sys

sys.path.insert(0, ".")

import jax

# honor an explicit JAX_PLATFORMS request: this environment pre-imports
# jax from sitecustomize, which freezes platform selection before the env
# var can act — re-assert it so `JAX_PLATFORMS=cpu python examples/...`
# (the documented invocation) actually runs on CPU
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np
import optax

from zuko_tpu.core import combine, partition
from zuko_tpu.data import two_moons
from zuko_tpu.mixtures import GMM


def main():
    x, _ = two_moons(8192, seed=0)

    gmm = GMM(2, components=8, covariance_type="full", key=jax.random.PRNGKey(0))
    gmm = gmm.initialize(x, "kmeans++", key=jax.random.PRNGKey(1))

    lp0 = float(gmm(None).log_prob(jnp.asarray(x)).mean())
    print(f"after k-means++ init: mean log-likelihood {lp0:.4f}")

    params, static = partition(gmm)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    data = jnp.asarray(x)

    @jax.jit
    def epoch(params, opt_state):
        def body(carry, xb):
            params, opt_state = carry

            def loss_fn(p):
                return -jnp.mean(combine(p, static)(None).log_prob(xb))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        batches = data.reshape(32, -1, 2)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), batches
        )
        return params, opt_state, losses.mean()

    for e in range(20):
        params, opt_state, loss = epoch(params, opt_state)
    print(f"after EM-by-SGD refinement: mean log-likelihood {-float(loss):.4f}")


if __name__ == "__main__":
    main()
