r"""Datasets and target energies for the benchmark/tutorial tasks.

The reference uses ``sklearn.datasets.make_moons`` and a ring energy in its
tutorials (docs/tutorials/forward_kl.ipynb cell 3, reverse_kl.ipynb cell 3);
both are re-implemented here without external dependencies. The UCI loaders
read preprocessed ``.npy`` files when available and otherwise synthesize a
surrogate with matched dimensionality (the real UCI numbers must be measured
with the downloaded datasets — they are not shipped in either repo).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

__all__ = ["two_moons", "ring_energy", "uci_power"]


def two_moons(n: int, sigma: float = 1e-1, seed: int = 0):
    """Two-moons dataset, exactly the reference tutorial's generator
    (docs/tutorials/forward_kl.ipynb cell 3):

    ``theta ~ U(0, 2pi)``, ``label = theta > pi``,
    ``x = (cos t + label - 1/2, sin t + label/2 - 1/4) + N(0, sigma)``.
    """
    rng = np.random.RandomState(seed)
    theta = 2 * np.pi * rng.rand(n)
    label = (theta > np.pi).astype(np.float64)

    x = np.stack(
        [
            np.cos(theta) + label - 1 / 2,
            np.sin(theta) + label / 2 - 1 / 4,
        ],
        axis=-1,
    )
    x = x + sigma * rng.randn(n, 2)
    return x.astype(np.float32), label.astype(np.float32)


def ring_energy(x):
    r"""The reference reverse-KL tutorial's multi-modal log-energy
    (docs/tutorials/reverse_kl.ipynb cell 3):
    :math:`\log U(x) = \sin(\pi x_1) - 2 (x_1^2 + x_2^2 - 2)^2`."""
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.sin(jnp.pi * x1) - 2 * (x1**2 + x2**2 - 2) ** 2


def uci_power(path: str = None, n: int = 65536, seed: int = 0):
    """UCI POWER (D=6). Loads ``{path}/power_{split}.npy`` when present;
    otherwise returns a synthetic surrogate of matched dimensionality so the
    pipeline and benchmarks run hermetically."""
    if path is not None:
        train = np.load(os.path.join(path, "power_train.npy"))
        val = np.load(os.path.join(path, "power_val.npy"))
        test = np.load(os.path.join(path, "power_test.npy"))
        return train, val, test

    rng = np.random.RandomState(seed)
    D = 6

    # one fixed generative structure shared by all splits
    centers = rng.randn(3, D) * 1.5
    A = rng.randn(D, D) * 0.3 + np.eye(D)

    def make(m):
        z = rng.randn(m, D)
        mix = rng.randint(0, 3, m)
        x = (z * 0.6 + centers[mix]) @ A
        return x.astype(np.float32)

    train = make(n)
    mu, sd = train.mean(0), train.std(0)
    return tuple(((s - mu) / sd).astype(np.float32) for s in (train, make(n // 8), make(n // 8)))
