r"""Normalizing flows zoo.

Capability parity with the reference's ``zuko/flows/`` package
(reference: zuko/flows/__init__.py:3-18).
"""

from . import core, mixture  # noqa: F401  (attribute parity: zuko.flows.core)
from .autoregressive import MAF, MaskedAutoregressiveTransform  # noqa: F401
from .continuous import CNF, FFJTransform  # noqa: F401
from .coupling import NICE, GeneralCouplingTransform, RealNVP  # noqa: F401
from .gaussianization import GF, ElementWiseTransform  # noqa: F401
from .mixture import GMM  # noqa: F401
from .neural import MNN, NAF, UMNN, UNAF  # noqa: F401
from .polynomial import BPF, SOSPF  # noqa: F401
from .spline import NCSF, NSF  # noqa: F401

from ..lazy import (  # noqa: F401
    Flow,
    LazyComposedTransform,
    LazyDistribution,
    LazyInverse,
    LazyTransform,
    UnconditionalDistribution,
    UnconditionalTransform,
)

__all__ = [
    "BPF",
    "CNF",
    "ElementWiseTransform",
    "FFJTransform",
    "Flow",
    "GF",
    "GMM",
    "GeneralCouplingTransform",
    "LazyComposedTransform",
    "LazyDistribution",
    "LazyInverse",
    "LazyTransform",
    "MAF",
    "MNN",
    "MaskedAutoregressiveTransform",
    "NAF",
    "NCSF",
    "NICE",
    "NSF",
    "RealNVP",
    "SOSPF",
    "UMNN",
    "UNAF",
    "UnconditionalDistribution",
    "UnconditionalTransform",
]
