r"""Core building blocks.

Warning:
    This sub-module is deprecated and will be removed in the future. Use
    :mod:`zuko_tpu.lazy` instead.

Drop-in parity with the reference's deprecation shim
(reference: zuko/flows/core.py:1-21).
"""

__all__ = [
    "Flow",
]

from ..lazy import (  # noqa: F401
    Flow,
    LazyComposedTransform,
    LazyDistribution,
    LazyInverse,
    LazyTransform,
    Unconditional,
    UnconditionalDistribution,
    UnconditionalTransform,
)
