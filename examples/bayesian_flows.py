r"""Bayesian normalizing flow on two-moons (reference tutorial:
docs/tutorials/bayesian_flows.ipynb; final-epoch loss anchor ~= 0.46 with
loss = NLL + 1e-6 * KL).

Run: python examples/bayesian_flows.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from zuko_tpu.bayesian import BayesianModel
from zuko_tpu.core import combine, partition
from zuko_tpu.data import two_moons
from zuko_tpu.flows import NSF


def main():
    key = jax.random.PRNGKey(0)
    x, _ = two_moons(16384, seed=0)
    x = jnp.asarray(x)

    flow = NSF(2, 0, transforms=3, key=key)
    model = BayesianModel(flow, key=key)

    params, static = partition(model)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, k):
        def loss_fn(p):
            m = combine(p, static)
            rflow = m.reparameterize(k)
            nll = -jnp.mean(rflow(None).log_prob(xb))
            return nll + 1e-6 * m.kl_divergence()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(0)
    for epoch in range(8):
        perm = rng.permutation(x.shape[0])
        losses = []
        for i in range(0, x.shape[0] - 64 + 1, 64):
            key, sub = jax.random.split(key)
            xb = x[perm[i : i + 64]]
            params, opt_state, loss = step(params, opt_state, xb, sub)
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} ± {np.std(losses):.3f}")

    print("reference anchor: 0.4636 ± 0.122")


if __name__ == "__main__":
    main()
