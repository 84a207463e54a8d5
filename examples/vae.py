r"""Variational autoencoder with a MAF prior (reference tutorial:
docs/tutorials/vae.ipynb — MNIST VAE, MAF(16 feat, 3 transforms, 256x2)
prior, Bernoulli decoder, final -ELBO anchor ~= 65.8).

MNIST is not available offline; this example runs on a synthetic binarized
dataset of the same dimensionality so the full pipeline (encoder,
Bernoulli decoder, flow prior, ELBO with analytic-free Monte-Carlo KL) is
exercised end-to-end. Point ``--mnist-path`` at an ``mnist.npz`` to use the
real data.

Run: python examples/vae.py [--epochs 8]
"""

import argparse
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

from zuko_tpu.core import Module, combine, partition
from zuko_tpu.distributions import Bernoulli, DiagNormal, Independent
from zuko_tpu.flows import MAF
from zuko_tpu.nn import MLP

LATENT = 16
PIXELS = 784


class VAE(Module):
    def __init__(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        self.encoder = MLP(PIXELS, 2 * LATENT, (1024,), key=k1)
        self.decoder = MLP(LATENT, PIXELS, (1024,), key=k2)
        self.prior = MAF(
            LATENT, 0, transforms=3, hidden_features=(256, 256), key=k3
        )

    def encode(self, x):
        phi = self.encoder(x)
        mu, log_sigma = jnp.split(phi, 2, axis=-1)
        return DiagNormal(mu, jnp.exp(log_sigma) + 1e-6)

    def decode(self, z):
        return Independent(Bernoulli(logits=self.decoder(z)), 1)

    def elbo(self, x, key):
        q = self.encode(x)
        z, log_q = q.rsample_and_log_prob(key)
        log_p = self.decode(z).log_prob(x)
        log_prior = self.prior(None).log_prob(z)
        return log_p + log_prior - log_q


def synthetic_mnist(n, seed=0):
    rng = np.random.RandomState(seed)
    # blobs of correlated pixels, binarized
    basis = rng.randn(32, PIXELS)
    codes = rng.randn(n, 32) * (rng.rand(n, 32) < 0.3)
    logits = codes @ basis - 2.0
    return (1 / (1 + np.exp(-logits)) > rng.rand(n, PIXELS)).astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=8)
    parser.add_argument("--samples", type=int, default=16384)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--mnist-path", type=str, default=None)
    parser.add_argument(
        "--synthetic", action="store_true",
        help="use the 784-pixel synthetic set instead of real digits",
    )
    args = parser.parse_args()

    global PIXELS
    if args.mnist_path:
        with np.load(args.mnist_path) as d:
            x = (d["x_train"].reshape(-1, PIXELS) / 255.0 > 0.5).astype(
                np.float32
            )
    elif args.synthetic:
        x = synthetic_mnist(args.samples)
    else:
        # REAL data by default: binarized UCI digits (64 pixels). The
        # reference-protocol head-to-head lives in
        # tools/real_data_vae_parity.py (-ELBO 20.25 vs torch 20.17).
        from zuko_tpu.data import digits_binary

        x, _, _ = digits_binary()
        PIXELS = x.shape[1]

    key = jax.random.PRNGKey(0)
    vae = VAE(key)
    params, static = partition(vae)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, k):
        def loss_fn(p):
            return -jnp.mean(combine(p, static).elbo(xb, k))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(0)
    n = x.shape[0]
    for epoch in range(args.epochs):
        perm = rng.permutation(n)
        losses = []
        for i in range(0, n - args.batch + 1, args.batch):
            key, sub = jax.random.split(key)
            xb = jnp.asarray(x[perm[i : i + args.batch]])
            params, opt_state, loss = step(params, opt_state, xb, sub)
            losses.append(float(loss))
        print(f"epoch {epoch}: -ELBO {np.mean(losses):.2f} ± {np.std(losses):.2f}")

    if args.mnist_path or args.synthetic:
        print("reference anchor (real MNIST): -ELBO ~= 65.8 after 64 epochs")
    else:
        print("reference-protocol anchor (binarized digits, 64 epochs,"
              " 512-wide encoder/decoder): -ELBO ~= 20.2 on test"
              " (tools/real_data_vae_parity.py)")


if __name__ == "__main__":
    main()
