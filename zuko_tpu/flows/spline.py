r"""Spline flows (NSF / NCSF).

Capability parity with the reference's ``zuko/flows/spline.py``.
"""

from __future__ import annotations

__all__ = ["NCSF", "NSF", "CircularRQSTransform"]

import jax
import jax.numpy as jnp

from functools import partial
from math import pi

from .autoregressive import MAF
from ..distributions import BoxUniform
from ..lazy import UnconditionalDistribution
from ..transforms import (
    CircularShiftTransform,
    ComposedTransform,
    MonotonicRQSTransform,
)


class NSF(MAF):
    r"""Neural spline flow (Durkan et al., 2019): MAF with monotonic
    rational-quadratic spline transformations, ``K = 8`` bins by default;
    coupling via ``passes=2`` (reference: zuko/flows/spline.py:21-62).

    Warning:
        Splines are defined over :math:`[-5, 5]`; features outside pass
        through untransformed. Standardize features before training.

    Example:
        >>> flow = NSF(3, 4, transforms=2, key=jax.random.PRNGKey(0))
        >>> c = jnp.ones(4)
        >>> x = flow(c).sample(jax.random.PRNGKey(1))
        >>> flow(c).log_prob(x).shape
        ()
    """

    def __init__(
        self,
        features: int,
        context: int = 0,
        bins: int = 8,
        slope: float = 1e-3,
        **kwargs,
    ):
        super().__init__(
            features=features,
            context=context,
            univariate=partial(MonotonicRQSTransform, slope=slope),
            shapes=[(bins,), (bins,), (bins - 1,)],
            **kwargs,
        )


def CircularRQSTransform(*phi, slope: float = 1e-3):
    r"""Circular RQS: circular shift composed with a spline on
    :math:`[-\pi, \pi]` (reference: zuko/flows/spline.py:65-72)."""
    return ComposedTransform(
        CircularShiftTransform(bound=pi),
        MonotonicRQSTransform(*phi, bound=pi, slope=slope),
    )


class NCSF(MAF):
    r"""Neural circular spline flow (Rezende et al., 2020): circular splines
    with a :class:`~zuko_tpu.distributions.BoxUniform` base on
    :math:`[-\pi - 10^{-5}, \pi + 10^{-5}]`
    (reference: zuko/flows/spline.py:75-117).

    Example:
        >>> flow = NCSF(3, transforms=2, key=jax.random.PRNGKey(0))
        >>> x = flow(None).sample(jax.random.PRNGKey(1), (5,))
        >>> flow(None).log_prob(x).shape
        (5,)
    """

    def __init__(
        self,
        features: int,
        context: int = 0,
        bins: int = 8,
        slope: float = 1e-3,
        **kwargs,
    ):
        super().__init__(
            features=features,
            context=context,
            univariate=partial(CircularRQSTransform, slope=slope),
            shapes=[(bins,), (bins,), (bins - 1,)],
            **kwargs,
        )

        self.base = UnconditionalDistribution(
            BoxUniform,
            jnp.full((features,), -pi - 1e-5),
            jnp.full((features,), pi + 1e-5),
            buffer=True,
        )
