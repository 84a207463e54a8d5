r"""Gaussianization flows.

Capability parity with the reference's ``zuko/flows/gaussianization.py``:
:class:`ElementWiseTransform` (the per-feature conditioner every other builder
dispatches to for ``features <= 1``) and the :class:`GF` recipe with trainable
rotations interleaved.
"""

from __future__ import annotations

__all__ = ["GF", "ElementWiseTransform"]

import jax
import jax.numpy as jnp
import numpy as np

from typing import Callable, Sequence

from ..distributions import DiagNormal
from ..lazy import (
    Flow,
    LazyTransform,
    UnconditionalDistribution,
    UnconditionalTransform,
)
from ..nn import MLP
from ..transforms import (
    DependentTransform,
    GaussianizationTransform,
    MonotonicAffineTransform,
    RotationTransform,
)
from ..utils import unpack


def _prod(shape) -> int:
    return int(np.prod(shape, dtype=int))


class ElementWiseTransform(LazyTransform):
    r"""Lazy element-wise transformation: per-feature univariate parameters
    come from ``MLP(context, F * total)`` if conditional, else from bare
    trainable arrays (reference: zuko/flows/gaussianization.py:28-94).

    Example:
        >>> t = ElementWiseTransform(3, 4, key=jax.random.PRNGKey(0))
        >>> x = jnp.asarray([0.1, 0.3, -1.1])
        >>> c = jnp.ones(4)
        >>> y = t(c)(x)
        >>> bool(jnp.allclose(t(c).inv(y), x, atol=1e-5))
        True
    """

    def __init__(
        self,
        features: int,
        context: int = 0,
        univariate: Callable = MonotonicAffineTransform,
        shapes: Sequence = ((), ()),
        key: jax.Array = None,
        **kwargs,
    ):
        key = jax.random.PRNGKey(0) if key is None else key
        self.univariate = univariate
        self.shapes = tuple(tuple(s) for s in shapes)
        self.total = sum(_prod(s) for s in self.shapes)

        if context > 0:
            self.hyper = MLP(context, features * self.total, key=key, **kwargs)
            self.phi = None
        else:
            self.hyper = None
            keys = jax.random.split(key, max(len(self.shapes), 1))
            self.phi = [
                jax.random.normal(k, (features,) + s)
                for k, s in zip(keys, self.shapes)
            ]

    def forward(self, c: jax.Array = None):
        if c is None:
            phi = self.phi
        else:
            phi = self.hyper(c)
            phi = phi.reshape(phi.shape[:-1] + (-1, self.total))
            phi = unpack(phi, self.shapes)
        return DependentTransform(self.univariate(*phi), 1)


class GF(Flow):
    r"""Gaussianization flow (Meng et al., 2020): element-wise
    :class:`~zuko_tpu.transforms.GaussianizationTransform` layers with
    trainable :class:`~zuko_tpu.transforms.RotationTransform` interleaved
    (reference: zuko/flows/gaussianization.py:97-155).

    Example:
        >>> flow = GF(3, transforms=2, key=jax.random.PRNGKey(0))
        >>> x = flow(None).sample(jax.random.PRNGKey(1), (5,))
        >>> flow(None).log_prob(x).shape
        (5,)
    
    References:
        | Gaussianization Flows (Meng et al., 2020)
        | https://arxiv.org/abs/2003.01941
    """

    def __init__(
        self,
        features: int,
        context: int = 0,
        transforms: int = 3,
        components: int = 8,
        key: jax.Array = None,
        **kwargs,
    ):
        key = jax.random.PRNGKey(0) if key is None else key
        keys = jax.random.split(key, 2 * transforms)

        layers = [
            ElementWiseTransform(
                features=features,
                context=context,
                univariate=GaussianizationTransform,
                shapes=[(components,), (components,)],
                key=keys[i],
                **kwargs,
            )
            for i in range(transforms)
        ]

        for i in reversed(range(1, len(layers))):
            layers.insert(
                i,
                UnconditionalTransform(
                    RotationTransform,
                    jax.random.normal(keys[transforms + i], (features, features)),
                ),
            )

        base = UnconditionalDistribution(
            DiagNormal,
            jnp.zeros(features),
            jnp.ones(features),
            buffer=True,
        )

        super().__init__(layers, base)
