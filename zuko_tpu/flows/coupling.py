r"""Coupling flows (NICE / RealNVP).

Capability parity with the reference's ``zuko/flows/coupling.py``.
"""

from __future__ import annotations

__all__ = ["GeneralCouplingTransform", "NICE", "RealNVP"]

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial
from typing import Callable, Sequence

from .gaussianization import ElementWiseTransform
from ..distributions import DiagNormal
from ..lazy import Flow, LazyTransform, UnconditionalDistribution
from ..nn import MLP
from ..transforms import (
    CouplingTransform,
    DependentTransform,
    MonotonicAffineTransform,
)
from ..utils import broadcast, unpack


def _prod(shape) -> int:
    return int(np.prod(shape, dtype=int))


class GeneralCouplingTransform(LazyTransform):
    r"""Lazy general coupling transformation with a checkered default mask
    (reference: zuko/flows/coupling.py:25-139). The hyper network is a plain
    ``MLP(features_a + context, features_b * total)``.

    Example:
        >>> t = GeneralCouplingTransform(3, 4, key=jax.random.PRNGKey(0))
        >>> x = jnp.asarray([-0.7, -0.3, -1.3])
        >>> c = jnp.ones(4)
        >>> y = t(c)(x)
        >>> bool(jnp.allclose(t(c).inv(y), x, atol=1e-5))
        True
    
    References:
        | NICE: Non-linear Independent Components Estimation (Dinh et al., 2014)
        | https://arxiv.org/abs/1410.8516
    """

    def __new__(
        cls,
        features: int = None,
        context: int = 0,
        mask=None,
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
        mask=None,
        univariate: Callable = MonotonicAffineTransform,
        shapes: Sequence = ((), ()),
        key: jax.Array = None,
        **kwargs,
    ):
        self.univariate = univariate
        self.shapes = tuple(tuple(s) for s in shapes)
        self.total = sum(_prod(s) for s in self.shapes)

        if mask is None:
            mask = np.arange(features) % 2 == 1
        else:
            mask = np.asarray(mask, bool)

        assert mask.ndim == 1, "'mask' should be a vector."
        assert mask.shape[0] == features, f"'mask' should have {features} elements."

        features_a = int(mask.sum())
        features_b = features - features_a

        assert features_a > 0
        assert features_b > 0

        self.mask = tuple(bool(m) for m in mask)

        self.hyper = MLP(
            features_a + context, features_b * self.total, key=key, **kwargs
        )

    def meta(self, c, x):
        if c is not None:
            x = jnp.concatenate(broadcast(x, c, ignore=1), axis=-1)

        phi = self.hyper(x)
        phi = phi.reshape(phi.shape[:-1] + (-1, self.total))
        phi = unpack(phi, self.shapes)

        return DependentTransform(self.univariate(*phi), 1)

    def forward(self, c: jax.Array = None):
        return CouplingTransform(partial(self.meta, c), np.asarray(self.mask))


class NICE(Flow):
    r"""NICE / RealNVP flow: coupling layers with alternating checkered masks
    (or random masks). Affine transformations by default, as in RealNVP
    (reference: zuko/flows/coupling.py:142-200).

    Example:
        >>> flow = NICE(4, transforms=2, key=jax.random.PRNGKey(0))
        >>> x = flow(None).sample(jax.random.PRNGKey(1), (5,))
        >>> flow(None).log_prob(x).shape
        (5,)
    
    References:
        | NICE: Non-linear Independent Components Estimation (Dinh et al., 2014)
        | https://arxiv.org/abs/1410.8516
    """

    def __init__(
        self,
        features: int,
        context: int = 0,
        transforms: int = 3,
        randmask: bool = False,
        key: jax.Array = None,
        **kwargs,
    ):
        key = jax.random.PRNGKey(0) if key is None else key
        keys = jax.random.split(key, transforms)
        rng = np.random.RandomState(int(jax.random.randint(key, (), 0, 2**31 - 1)))

        layers = []
        for i in range(transforms):
            if randmask:
                mask = rng.permutation(features) % 2 == i % 2
            else:
                mask = np.arange(features) % 2 == i % 2

            layers.append(
                GeneralCouplingTransform(
                    features=features,
                    context=context,
                    mask=mask,
                    key=keys[i],
                    **kwargs,
                )
            )

        base = UnconditionalDistribution(
            DiagNormal,
            jnp.zeros(features),
            jnp.ones(features),
            buffer=True,
        )

        super().__init__(layers, base)


class RealNVP(NICE):
    r"""Alias of :class:`NICE` with affine couplings
    (reference: zuko/flows/coupling.py:199-200)."""

    pass
