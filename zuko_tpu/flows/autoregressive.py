r"""Autoregressive flows and transformations.

Capability parity with the reference's ``zuko/flows/autoregressive.py``:
the MADE conditioner (order/passes grouping, custom adjacency with DAG
diameter, context columns), and the MAF recipe with alternating orders.
"""

from __future__ import annotations

__all__ = ["MAF", "MaskedAutoregressiveTransform"]

import math

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial
from typing import Callable, Sequence

from .gaussianization import ElementWiseTransform
from ..distributions import DiagNormal
from ..lazy import Flow, LazyTransform, UnconditionalDistribution
from ..nn import MaskedMLP
from ..transforms import (
    AutoregressiveTransform,
    DependentTransform,
    MonotonicAffineTransform,
)
from ..utils import broadcast, unpack


def _prod(shape) -> int:
    return int(np.prod(shape, dtype=int))


def dag_diameter(adjacency: np.ndarray) -> int:
    r"""Diameter of a DAG via topological generations; raises on cycles
    (reference: zuko/flows/autoregressive.py:154-185)."""
    adjacency = np.asarray(adjacency, bool)
    generations = 0
    indegree = adjacency.sum(axis=1).tolist()
    zero_indegree = [n for n, d in enumerate(indegree) if d == 0]
    while zero_indegree:
        this_generation, zero_indegree = zero_indegree, []
        for node in this_generation:
            for child in np.nonzero(adjacency[:, node])[0]:
                indegree[child] -= 1
                if indegree[child] == 0:
                    zero_indegree.append(int(child))
        generations += 1
    assert all(d == 0 for d in indegree), "The graph contains cycles."
    return generations


class MaskedAutoregressiveTransform(LazyTransform):
    r"""Lazy masked autoregressive transformation (MADE conditioner).

    Reference semantics (zuko/flows/autoregressive.py:24-218):

    * ``features <= 1`` dispatches to :class:`ElementWiseTransform`
      (zuko/flows/autoregressive.py:73-86).
    * ``order`` is grouped into ``passes`` blocks via
      ``floor(order / ceil(F / passes))``; the adjacency is
      ``order[:, None] > order`` (zuko/flows/autoregressive.py:121-124).
    * A custom ``adjacency`` of shape ``(F, F)`` or ``(F, F + context)`` may be
      given; it must have ones on the diagonal, be acyclic, and ``passes``
      becomes the DAG diameter (zuko/flows/autoregressive.py:127-152).
    * Adjacency rows are repeated ``total`` times and fed to
      :class:`~zuko_tpu.nn.MaskedMLP`.

    Example:
        >>> t = MaskedAutoregressiveTransform(3, 4, key=jax.random.PRNGKey(0))
        >>> x = jnp.asarray([1.7, -1.6, -0.9])
        >>> c = jnp.ones(4)
        >>> y = t(c)(x)
        >>> bool(jnp.allclose(t(c).inv(y), x, atol=1e-5))
        True
    
    References:
        | Masked Autoregressive Flow for Density Estimation (Papamakarios et al., 2017)
        | https://arxiv.org/abs/1705.07057
    """

    def __new__(
        cls,
        features: int = None,
        context: int = 0,
        passes: int = None,
        order=None,
        adjacency=None,
        *args,
        **kwargs,
    ):
        if features is None or features > 1:
            return super().__new__(cls)
        return ElementWiseTransform(features, context, *args, **kwargs)

    def __init__(
        self,
        features: int,
        context: int = 0,
        passes: int = None,
        order=None,
        adjacency=None,
        univariate: Callable = MonotonicAffineTransform,
        shapes: Sequence = ((), ()),
        key: jax.Array = None,
        **kwargs,
    ):
        self.univariate = univariate
        self.shapes = tuple(tuple(s) for s in shapes)
        self.total = sum(_prod(s) for s in self.shapes)

        self.order = None

        if adjacency is None:
            if passes is None:
                passes = features
            if order is None:
                order = np.arange(features)
            else:
                order = np.asarray(order, int)

            assert order.ndim == 1, "'order' should be a vector."
            assert order.shape[0] == features, f"'order' should have {features} elements."

            self.passes = min(max(passes, 1), features)
            order = order // int(math.ceil(features / self.passes))
            self.order = tuple(int(i) for i in order)

            adjacency = order[:, None] > order
            adjacency_context = None
        else:
            adjacency = np.asarray(adjacency, bool)

            assert adjacency.ndim == 2, "'adjacency' should be a matrix."
            assert adjacency.shape[0] == features, (
                f"'adjacency' should have {features} rows."
            )
            assert adjacency.shape[1] in (features, features + context), (
                f"'adjacency' should have {features} or {features + context} columns."
            )

            adjacency_context = (
                adjacency[:, features:] if adjacency.shape[1] > features else None
            )
            adjacency = adjacency[:, :features]

            assert adjacency.diagonal().all(), (
                "'adjacency' should have ones on the diagonal."
            )

            adjacency = adjacency & ~np.eye(features, dtype=bool)
            self.passes = dag_diameter(adjacency)

        if context > 0:
            if adjacency_context is None:
                adjacency_context = np.ones((features, context), bool)
            adjacency = np.concatenate([adjacency, adjacency_context], axis=1)

        adjacency = np.repeat(adjacency, repeats=self.total, axis=0)

        self.hyper = MaskedMLP(adjacency, key=key, **kwargs)

    def meta(self, c, x):
        # reference: zuko/flows/autoregressive.py:207-215
        if c is not None:
            x = jnp.concatenate(broadcast(x, c, ignore=1), axis=-1)

        phi = self.hyper(x)
        phi = phi.reshape(phi.shape[:-1] + (-1, self.total))
        phi = unpack(phi, self.shapes)

        return DependentTransform(self.univariate(*phi), 1)

    def forward(self, c: jax.Array = None):
        return AutoregressiveTransform(partial(self.meta, c), self.passes)


class MAF(Flow):
    r"""Masked autoregressive flow (Papamakarios et al., 2017).

    Orders alternate ascending/descending between transformations, or are
    random permutations with ``randperm=True``
    (reference: zuko/flows/autoregressive.py:221-316).

    Example:
        >>> flow = MAF(3, 4, transforms=2, key=jax.random.PRNGKey(0))
        >>> c = jnp.ones(4)
        >>> x = flow(c).sample(jax.random.PRNGKey(1))
        >>> flow(c).log_prob(x).shape
        ()
    
    References:
        | Masked Autoregressive Flow for Density Estimation (Papamakarios et al., 2017)
        | https://arxiv.org/abs/1705.07057
    """

    def __init__(
        self,
        features: int,
        context: int = 0,
        transforms: int = 3,
        randperm: bool = False,
        key: jax.Array = None,
        **kwargs,
    ):
        key = jax.random.PRNGKey(0) if key is None else key
        keys = jax.random.split(key, transforms)
        rng = np.random.RandomState(int(jax.random.randint(key, (), 0, 2**31 - 1)))

        orders = [np.arange(features), np.arange(features)[::-1]]

        layers = [
            MaskedAutoregressiveTransform(
                features=features,
                context=context,
                order=rng.permutation(features) if randperm else orders[i % 2],
                key=keys[i],
                **kwargs,
            )
            for i in range(transforms)
        ]

        base = UnconditionalDistribution(
            DiagNormal,
            jnp.zeros(features),
            jnp.ones(features),
            buffer=True,
        )

        super().__init__(layers, base)
