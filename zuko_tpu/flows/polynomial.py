r"""Polynomial flows (SOSPF / BPF).

Capability parity with the reference's ``zuko/flows/polynomial.py``.
"""

from __future__ import annotations

__all__ = ["BPF", "SOSPF", "ShiftedSOSPTransform"]

import jax

from functools import partial

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
    r"""Shifted sum-of-squares polynomial transformation
    (reference: zuko/flows/polynomial.py:23-29)."""
    return ComposedTransform(
        SOSPolynomialTransform(a, slope=slope),
        AdditiveTransform(constant),
    )


class SOSPF(MAF):
    r"""Sum-of-squares polynomial flow (Jaini et al., 2019): MAF with SOSP
    univariates and SoftclipTransform(11) interleaved
    (reference: zuko/flows/polynomial.py:32-76).

    Example:
        >>> flow = SOSPF(3, transforms=2, key=jax.random.PRNGKey(0))
        >>> import jax.numpy as jnp
        >>> flow(None).log_prob(jnp.asarray([[0.1, 0.2, -0.4]])).shape
        (1,)
    """

    def __init__(
        self,
        features: int,
        context: int = 0,
        degree: int = 4,
        polynomials: int = 3,
        slope: float = 1e-3,
        **kwargs,
    ):
        super().__init__(
            features=features,
            context=context,
            univariate=partial(ShiftedSOSPTransform, slope=slope),
            shapes=[(polynomials, degree + 1), ()],
            **kwargs,
        )

        layers = self.transform.transforms
        for i in reversed(range(1, len(layers))):
            layers.insert(i, UnconditionalTransform(SoftclipTransform, bound=11.0))


class BPF(MAF):
    r"""Bernstein polynomial flow (Sick et al., 2020; Arpogaus et al., 2022):
    MAF with bounded Bernstein univariates
    (reference: zuko/flows/polynomial.py:79-117).

    Example:
        >>> flow = BPF(3, transforms=2, key=jax.random.PRNGKey(0))
        >>> import jax.numpy as jnp
        >>> flow(None).log_prob(jnp.asarray([[0.1, 0.2, -0.4]])).shape
        (1,)
    """

    def __init__(
        self,
        features: int,
        context: int = 0,
        degree: int = 16,
        **kwargs,
    ):
        super().__init__(
            features=features,
            context=context,
            univariate=BoundedBernsteinTransform,
            shapes=[(degree + 1,)],
            **kwargs,
        )
