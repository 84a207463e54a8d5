r"""Mixture models.

Warning:
    This sub-module is deprecated and will be removed in the future. Use
    :mod:`zuko_tpu.mixtures` instead.

Drop-in parity with the reference's deprecation shim
(reference: zuko/flows/mixture.py:1-12).
"""

__all__ = [
    "GMM",
]

from ..mixtures import GMM  # noqa: F401
