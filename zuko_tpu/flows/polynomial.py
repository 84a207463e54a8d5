r"""Polynomial flows: sum-of-squares (SOSPF) and Bernstein (BPF).

Both are MAF recipes with polynomial univariates
(capability parity: zuko/flows/polynomial.py).
"""

from __future__ import annotations

__all__ = ["BPF", "SOSPF", "ShiftedSOSPTransform"]

from functools import partial

import jax

from .autoregressive import MAF
from ..lazy import UnconditionalTransform
from ..transforms import (
    AdditiveTransform,
    BoundedBernsteinTransform,
    ComposedTransform,
    SoftclipTransform,
    SOSPolynomialTransform,
)


def ShiftedSOSPTransform(a, constant, slope: float = 1e-3):
    r"""A sum-of-squares polynomial transformation followed by a learned shift
    (reference: zuko/flows/polynomial.py:23-29)."""
    poly = SOSPolynomialTransform(a, slope=slope)
    return ComposedTransform(poly, AdditiveTransform(constant))


def _interleave_softclip(lazy_transforms, bound: float = 11.0):
    """Insert ``SoftclipTransform(bound)`` between autoregressive layers to
    keep features inside the invertibility domain (the reference applies the
    same guard, zuko/flows/polynomial.py:73-76)."""
    for i in reversed(range(1, len(lazy_transforms))):
        lazy_transforms.insert(
            i, UnconditionalTransform(SoftclipTransform, bound=bound)
        )


class SOSPF(MAF):
    r"""Sum-of-squares polynomial flow (Jaini et al., 2019): the univariate is
    the exact integral of a sum of ``polynomials`` squared polynomials of
    degree ``degree`` (reference recipe: zuko/flows/polynomial.py:32-76).

    Warning:
        Invertibility is only guaranteed on :math:`[-10, 10]`; standardize
        features first.

    Example:
        >>> import jax.numpy as jnp
        >>> flow = SOSPF(3, transforms=2, key=jax.random.PRNGKey(0))
        >>> flow(None).log_prob(jnp.zeros((5, 3))).shape
        (5,)
    
    References:
        | Sum-of-Squares Polynomial Flow (Jaini et al., 2019)
        | https://arxiv.org/abs/1905.02325
    """

    def __init__(self, features, context=0, degree=4, polynomials=3,
                 slope=1e-3, **kwargs):
        sosp = partial(ShiftedSOSPTransform, slope=slope)
        super().__init__(
            features, context,
            univariate=sosp,
            shapes=[(polynomials, degree + 1), ()],
            **kwargs,
        )
        _interleave_softclip(self.transform.transforms)


class BPF(MAF):
    r"""Bernstein polynomial flow (Sick et al., 2020; Arpogaus et al., 2022):
    bounded Bernstein univariates of order derived from ``degree``
    (reference recipe: zuko/flows/polynomial.py:79-117).

    Warning:
        The polynomial acts on :math:`[-5, 5]`; out-of-domain features pass
        through untransformed.

    Example:
        >>> import jax.numpy as jnp
        >>> flow = BPF(3, transforms=2, key=jax.random.PRNGKey(0))
        >>> flow(None).log_prob(jnp.zeros((5, 3))).shape
        (5,)
    
    References:
        | Deep transformation models (Sick et al., 2020)
        | https://arxiv.org/abs/2004.00464
    """

    def __init__(self, features, context=0, degree=16, **kwargs):
        super().__init__(
            features, context,
            univariate=BoundedBernsteinTransform,
            shapes=[(degree + 1,)],
            **kwargs,
        )
