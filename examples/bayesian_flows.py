r"""Bayesian normalizing flow on two-moons (reference tutorial:
docs/tutorials/bayesian_flows.ipynb; final-epoch loss anchor ~= 0.46 with
loss = NLL + 1e-6 * KL).

Run: python examples/bayesian_flows.py
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

from zuko_tpu.bayesian import BayesianModel
from zuko_tpu.core import combine, partition
from zuko_tpu.data import two_moons
from zuko_tpu.flows import NSF


def main():
    key = jax.random.PRNGKey(0)
    x, label = two_moons(16384, seed=0)
    x = jnp.asarray(x)
    c = jnp.asarray(label)[:, None]

    # variational last hyper layer only, conditional on the moon label —
    # the tutorial's configuration (bayesian_flows.ipynb cell 21)
    flow = NSF(2, context=1, transforms=3, hidden_features=(64, 64), key=key)
    model = BayesianModel(
        flow, init_logvar=-9.0, include_params=["**.hyper.layers.4"], key=key
    )

    params, static = partition(model)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def step(carry, batch):
        params, opt_state = carry
        xb, cb, k = batch

        def loss_fn(p):
            m = combine(p, static)
            rflow = m.reparameterize(k)
            nll = -jnp.mean(rflow(cb).log_prob(xb))
            return nll + 1e-6 * m.kl_divergence()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    batch, n = 64, x.shape[0]
    n_batches = n // batch

    @jax.jit
    def epoch_fn(params, opt_state, k):
        kp, ks = jax.random.split(k)
        perm = jax.random.permutation(kp, n)
        xs = x[perm[: n_batches * batch]].reshape(n_batches, batch, -1)
        cs = c[perm[: n_batches * batch]].reshape(n_batches, batch, -1)
        keys = jax.random.split(ks, n_batches)
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (xs, cs, keys)
        )
        return params, opt_state, losses

    for epoch in range(8):
        key, sub = jax.random.split(key)
        params, opt_state, losses = epoch_fn(params, opt_state, sub)
        losses = np.asarray(losses)
        print(f"epoch {epoch}: loss {losses.mean():.4f} ± {losses.std():.3f}")

    print("reference anchor: 0.4636 ± 0.122")


if __name__ == "__main__":
    main()
