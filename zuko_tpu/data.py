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

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["two_moons", "ring_energy", "uci_power"]


def two_moons(n: int, noise: float = 0.05, seed: int = 0):
    """Two interleaving half-circles with Gaussian noise, standardized like
    the reference tutorial (labels returned as the conditioning variable)."""
    rng = np.random.RandomState(seed)
    n_out = n // 2
    n_in = n - n_out

    theta_out = rng.uniform(0, np.pi, n_out)
    theta_in = rng.uniform(0, np.pi, n_in)

    outer = np.stack([np.cos(theta_out), np.sin(theta_out)], axis=-1)
    inner = np.stack([1 - np.cos(theta_in), 1 - np.sin(theta_in) - 0.5], axis=-1)

    x = np.concatenate([outer, inner], axis=0)
    x = x + noise * rng.randn(*x.shape)
    y = np.concatenate([np.zeros(n_out), np.ones(n_in)])

    perm = rng.permutation(n)
    return x[perm].astype(np.float32), y[perm].astype(np.float32)


def ring_energy(x, radius: float = 2.0, width: float = 0.25):
    """Log-energy of a ring target (reverse-KL tutorial's energy analog):
    ``log E(x) = -((|x| - r) / w)^2 / 2``."""
    r = jnp.linalg.norm(x, axis=-1)
    return -(((r - radius) / width) ** 2) / 2


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

    def make(m):
        # correlated, multi-modal surrogate
        z = rng.randn(m, D)
        mix = rng.randint(0, 3, m)
        centers = rng.randn(3, D) * 1.5
        x = z * 0.6 + centers[mix]
        A = rng.randn(D, D) * 0.3 + np.eye(D)
        x = x @ A
        x = (x - x.mean(0)) / x.std(0)
        return x.astype(np.float32)

    return make(n), make(n // 8), make(n // 8)
