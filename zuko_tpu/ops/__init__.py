r"""Pallas (Mosaic TPU) kernels for the hot numeric cores.

Reference anchors (what these accelerate): the rational-quadratic spline
forward/inverse with fused log-Jacobian (zuko/transforms.py:449-567) and the
MADE masked-linear pass (zuko/nn.py:202-218).

Kernels are enabled on TPU backends when ``ZUKO_TPU_KERNELS`` is not set to
``0``; every kernel has a pure-jnp fallback with identical semantics, used on
CPU and in tests.
"""

import os

import jax

__all__ = ["kernels_enabled", "rqs", "masked_linear"]


def kernels_enabled() -> bool:
    """Whether Pallas kernels should be used (TPU backend + opt-in flag).

    Measured on v5e: for the tabular-flow sizes XLA's whole-graph fusion beats
    per-op kernel launches (the kernels are bit-exact but break fusion), so
    kernels are opt-in via ``ZUKO_TPU_KERNELS=1`` — profitable for wide MADE
    conditioners and large knot counts."""
    if os.environ.get("ZUKO_TPU_KERNELS", "0") != "1":
        return False
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return platform not in ("cpu", "gpu")


from . import masked_linear, rqs  # noqa: E402, F401
