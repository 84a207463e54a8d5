r"""Mixture models.

Capability parity with the reference's ``zuko/mixtures.py`` (286 LoC):
conditional/unconditional :class:`GMM` with full/diagonal/spherical (optionally
tied) covariances, and random / k-means / k-means++ initialization with
moment-matched covariances.

Initialization is host-side NumPy (it is init-time only — reference:
zuko/mixtures.py:100-157) and *functional*: ``initialize`` returns a new
module instead of mutating in place.
"""

from __future__ import annotations

__all__ = ["GMM"]

import jax
import jax.numpy as jnp
import numpy as np


from .core import tree_replace
from .distributions import DiagNormal, Mixture, MultivariateNormal
from .lazy import LazyDistribution
from .nn import MLP
from .utils import unpack


def _prod(s) -> int:
    return int(np.prod(s, dtype=int))


def _get_gmm_shapes(components, features, covariance_type, tied):
    # reference: zuko/mixtures.py:160-189
    leading = 1 if tied else components
    shapes = [
        (components,),  # logits
        (components, features),  # means
    ]
    if covariance_type == "full":
        shapes += [
            (leading, features),  # log-diagonal
            (leading, features * (features - 1) // 2),  # strict lower triangle
        ]
    elif covariance_type == "diagonal":
        shapes += [(leading, features)]
    elif covariance_type == "spherical":
        shapes += [(leading, 1)]
    else:
        raise NotImplementedError(
            f"Unknown covariance type '{covariance_type}'."
        )
    return shapes


class GMM(LazyDistribution):
    r"""Gaussian mixture model
    :math:`p(X | c) = \sum_i w_i(c) \mathcal{N}(X | \mu_i(c), \Sigma_i(c))`
    (reference: zuko/mixtures.py:25-157).

    Arguments:
        features: The number of features.
        context: The number of context features.
        components: The number of components :math:`K`.
        covariance_type: ``full`` | ``diagonal`` | ``spherical``.
        tied: Whether covariance parameters are shared across components.
        epsilon: Numerical stability term.
        key: PRNG key for initialization.

    Example:
        >>> gmm = GMM(2, components=3, key=jax.random.PRNGKey(0))
        >>> d = gmm(None)
        >>> d.event_shape
        (2,)
        >>> d.sample(jax.random.PRNGKey(1), (5,)).shape
        (5, 2)
    """

    def __init__(
        self,
        features: int,
        context: int = 0,
        components: int = 2,
        covariance_type: str = "full",
        tied: bool = False,
        epsilon: float = 1e-6,
        key: jax.Array = None,
        **kwargs,
    ):
        key = jax.random.PRNGKey(0) if key is None else key
        self.features = int(features)
        self.components = int(components)
        self.covariance_type = str(covariance_type)
        self.tied = bool(tied)
        self.epsilon = float(epsilon)

        shapes = _get_gmm_shapes(components, features, covariance_type, tied)
        self.shapes = tuple(tuple(s) for s in shapes)
        self.total = sum(_prod(s) for s in self.shapes)

        if context > 0:
            self.hyper = MLP(context, self.total, key=key, **kwargs)
            self.phi = None
        else:
            self.hyper = None
            keys = jax.random.split(key, len(self.shapes))
            self.phi = [
                jax.random.normal(k, s) for k, s in zip(keys, self.shapes)
            ]

    def forward(self, c: jax.Array = None):
        if c is None:
            phi = self.phi
        else:
            phi = self.hyper(c)
            phi = unpack(phi, self.shapes)

        if self.covariance_type == "full":
            return self._forward_full(*phi)
        elif self.covariance_type in ("diagonal", "spherical"):
            return self._forward_diagonal(*phi)
        raise NotImplementedError(
            f"Unknown covariance type '{self.covariance_type}'."
        )

    def _forward_full(self, logits, loc, diag, tril):
        # scale_tril = diag_embed(exp(diag) + eps) with strict lower triangle
        # scattered from tril (reference: zuko/mixtures.py:86-93)
        D = self.features
        d = jnp.exp(diag) + self.epsilon
        scale = jnp.zeros(d.shape + (D,), d.dtype)
        i = np.arange(D)
        scale = scale.at[..., i, i].set(d)
        rows, cols = np.tril_indices(D, k=-1)
        scale = scale.at[..., rows, cols].set(tril)
        return Mixture(MultivariateNormal(loc, scale_tril=scale), logits)

    def _forward_diagonal(self, logits, loc, diag):
        scale = jnp.exp(diag) + self.epsilon
        return Mixture(DiagNormal(loc, jnp.broadcast_to(scale, loc.shape)), logits)

    def initialize(self, x, strategy: str = "kmeans", key: jax.Array = None) -> "GMM":
        r"""Returns a copy of the model with components initialized by
        clustering the samples ``x`` of shape ``(N, D)``
        (reference: zuko/mixtures.py:100-157). Host-side NumPy.
        """
        key = jax.random.PRNGKey(0) if key is None else key
        rng = np.random.RandomState(int(jax.random.randint(key, (), 0, 2**31 - 1)))
        x = np.asarray(x, np.float64)
        N, D = x.shape
        K = self.components

        assert N > K, (
            f"The number of samples ({N}) should be larger than the number of"
            f" components ({K})."
        )

        if strategy == "random":
            centers = _cluster_random(rng, x, K)
        elif strategy == "kmeans":
            centers = _cluster_kmeans(rng, x, K)
        elif strategy == "kmeans++":
            centers = _cluster_kmeans_pp(rng, x, K)
        else:
            raise NotImplementedError(f"Unknown clustering strategy '{strategy}'.")

        match = _one_hot(_cdist(x, centers).argmin(axis=-1), K)

        probs = match.sum(axis=0) / match.sum()
        means = (match[:, :, None] * x[:, None, :]).sum(axis=0) / match.sum(
            axis=0
        )[:, None]

        if self.covariance_type == "full":
            covs = _estimate_full_cov(x, match, self.tied)
        elif self.covariance_type == "diagonal":
            covs = (_estimate_diagonal_cov(x, match, self.tied),)
        elif self.covariance_type == "spherical":
            covs = (_estimate_spherical_cov(x, match, self.tied),)
        else:
            raise NotImplementedError(
                f"Unknown covariance type '{self.covariance_type}'."
            )

        params = (np.log(probs), means, *covs)
        assert all(
            p.shape == s for p, s in zip(params, self.shapes)
        ), [p.shape for p in params]

        dtype = jnp.zeros(0).dtype
        if self.hyper is not None:
            # write params into the last hyper layer, damping its weights
            # (reference: zuko/mixtures.py:152-154)
            last = self.hyper.layers[-1]
            flat = jnp.concatenate(
                [jnp.asarray(p, dtype).reshape(-1) for p in params]
            )
            new_last = tree_replace(
                last, weight=last.weight * 1e-2, bias=flat
            )
            new_hyper = tree_replace(
                self.hyper, layers=self.hyper.layers[:-1] + [new_last]
            )
            return tree_replace(self, hyper=new_hyper)
        else:
            return tree_replace(
                self, phi=[jnp.asarray(p, dtype) for p in params]
            )


def _one_hot(idx, K):
    return np.eye(K)[idx]


def _cdist(x, y):
    return np.linalg.norm(x[:, None, :] - y[None, :, :], axis=-1)


def _estimate_full_cov(x, match, tied):
    _, D = x.shape
    _, K = match.shape
    covs = np.stack([
        np.atleast_2d(np.cov(x.T, aweights=match[:, k] + 1e-12)) for k in range(K)
    ])
    if tied:
        covs = covs.mean(axis=0, keepdims=True)
    lower = np.linalg.cholesky(covs)
    diag = np.diagonal(lower, axis1=-2, axis2=-1)
    rows, cols = np.tril_indices(D, k=-1)
    tril = lower[..., rows, cols]
    return np.log(diag), tril


def _estimate_diagonal_cov(x, match, tied):
    _, D = x.shape
    _, K = match.shape
    diag = np.stack([
        np.stack([
            np.cov(x[:, d], aweights=match[:, k] + 1e-12) for d in range(D)
        ])
        for k in range(K)
    ]).reshape(K, D)
    if tied:
        diag = diag.mean(axis=0, keepdims=True)
    return np.log(diag)


def _estimate_spherical_cov(x, match, tied):
    diag = _estimate_diagonal_cov(x, match, tied)
    return np.log(np.exp(diag).mean(axis=-1, keepdims=True))


def _cluster_random(rng, x, K):
    idx = rng.choice(x.shape[0], K, replace=False)
    return x[idx]


def _cluster_kmeans(rng, x, K, iterations: int = 7):
    # k-means with empty-cluster resampling (reference: zuko/mixtures.py:248-265)
    N, _ = x.shape
    centers = _cluster_kmeans_pp(rng, x, K)
    for _ in range(iterations):
        match = _one_hot(_cdist(x, centers).argmin(axis=-1), K)
        idx = rng.choice(N, K, replace=False)
        counts = match.sum(axis=0)[:, None]
        means = (match[:, :, None] * x[:, None, :]).sum(axis=0) / np.maximum(
            counts, 1e-12
        )
        centers = np.where(counts > 0, means, x[idx])
    return centers


def _cluster_kmeans_pp(rng, x, K):
    # reference: zuko/mixtures.py:268-286
    N, _ = x.shape
    idx = rng.choice(N, K, replace=False)
    centers = x[idx].copy()
    mask = np.zeros((N, K), bool)
    mask[idx[0], 0] = True
    for k in range(1, K):
        dist = _cdist(x, centers[:k])
        dist[mask[:, :k]] = 0
        dist = dist.min(axis=-1)
        w = dist**2
        w = w / w.sum()
        j = rng.choice(N, p=w)
        centers[k] = x[j]
        mask[j, k] = True
    return centers
