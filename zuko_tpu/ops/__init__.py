r"""Pallas (Mosaic TPU) kernels for the hot numeric cores.

Three tiers (see PERF.md for measurements):

* ``nsf_fused`` — whole-flow fused kernels (`fused_nsf_log_prob`,
  `fused_nsf_sample`, `fused_nsf_sample_and_log_prob`; NSF splines or MAF
  affine univariates, optional context): every hyper-net matmul, spline
  constraint and evaluation in one kernel per batch tile. 1.2-1.5x the XLA
  path; on by default on TPU (`ZUKO_TPU_FUSED_NSF=0` to disable).
* ``rqs`` / ``masked_linear`` — per-op kernels (reference anchors:
  zuko/transforms.py:449-567, zuko/nn.py:202-218). Bit-exact but they break
  XLA whole-graph fusion at tabular sizes, so opt-in via
  ``ZUKO_TPU_KERNELS=1``.
* Every kernel has a pure-jnp fallback with identical semantics, used on
  CPU/GPU and inside custom-VJP backwards.
"""

import os

import jax

__all__ = ["kernels_enabled", "masked_linear", "nsf_fused", "rqs"]


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


from . import masked_linear, nsf_fused, rqs  # noqa: E402, F401
