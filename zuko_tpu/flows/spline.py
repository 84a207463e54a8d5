r"""Spline flows: NSF and its circular variant NCSF.

Both are MAF recipes with rational-quadratic-spline univariates
(capability parity: zuko/flows/spline.py). On TPU the spline math runs
through the fused kernel path (zuko_tpu/ops) when available.
"""

from __future__ import annotations

__all__ = ["NCSF", "NSF", "CircularRQSTransform"]

from functools import partial
from math import pi

import jax
import jax.numpy as jnp

from .autoregressive import MAF
from ..distributions import BoxUniform
from ..lazy import UnconditionalDistribution
from ..transforms import (
    CircularShiftTransform,
    ComposedTransform,
    MonotonicRQSTransform,
)

_RQS_SHAPES = lambda bins: [(bins,), (bins,), (bins - 1,)]  # noqa: E731


class NSF(MAF):
    r"""Neural spline flow (Durkan et al., 2019).

    A masked autoregressive flow whose univariate transformations are
    monotonic rational-quadratic splines with ``bins`` knots (default 8,
    reference recipe: zuko/flows/spline.py:21-62). Fully autoregressive by
    default; pass ``passes=2`` for a coupling-style factorization.

    Warning:
        The splines act on :math:`[-5, 5]`; out-of-domain features pass
        through untransformed, so standardize data first.

    Example:
        >>> flow = NSF(3, 4, transforms=2, key=jax.random.PRNGKey(0))
        >>> c = jnp.ones(4)
        >>> x = flow(c).sample(jax.random.PRNGKey(1))
        >>> flow(c).log_prob(x).shape
        ()
    
    References:
        | Neural Spline Flows (Durkan et al., 2019)
        | https://arxiv.org/abs/1906.04032
    """

    def __init__(self, features, context=0, bins=8, slope=1e-3, **kwargs):
        rqs = partial(MonotonicRQSTransform, slope=slope)
        super().__init__(
            features, context,
            univariate=rqs, shapes=_RQS_SHAPES(bins),
            **kwargs,
        )


def CircularRQSTransform(*phi, slope: float = 1e-3):
    r"""Spline on the circle: a circular shift by :math:`\pi` composed with a
    rational-quadratic spline bounded to :math:`[-\pi, \pi]`
    (reference: zuko/flows/spline.py:65-72)."""
    shift = CircularShiftTransform(bound=pi)
    spline = MonotonicRQSTransform(*phi, bound=pi, slope=slope)
    return ComposedTransform(shift, spline)


class NCSF(MAF):
    r"""Neural circular spline flow (Rezende et al., 2020): circular splines
    over a box-uniform base on :math:`[-\pi - \epsilon, \pi + \epsilon]`
    (reference recipe: zuko/flows/spline.py:75-117). Features are assumed to
    live on the half-open interval :math:`[-\pi, \pi)`.

    Example:
        >>> flow = NCSF(3, transforms=2, key=jax.random.PRNGKey(0))
        >>> x = flow(None).sample(jax.random.PRNGKey(1), (5,))
        >>> flow(None).log_prob(x).shape
        (5,)
    
    References:
        | Normalizing Flows on Tori and Spheres (Rezende et al., 2020)
        | https://arxiv.org/abs/2002.02428
    """

    def __init__(self, features, context=0, bins=8, slope=1e-3, **kwargs):
        circular = partial(CircularRQSTransform, slope=slope)
        super().__init__(
            features, context,
            univariate=circular, shapes=_RQS_SHAPES(bins),
            **kwargs,
        )

        eps = 1e-5
        self.base = UnconditionalDistribution(
            BoxUniform,
            jnp.full((features,), -pi - eps),
            jnp.full((features,), pi + eps),
            buffer=True,
        )
