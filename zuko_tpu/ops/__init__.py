r"""Pallas (Mosaic TPU) kernels for the hot numeric cores.

Four tiers (see PERF.md for measurements):

* ``dispatch`` — the automatic fast path: ``flow(c)`` inspects the module
  once and, when the structure matches, returns a distribution whose
  ``log_prob``/``sample``/``sample_and_log_prob`` hit the fused kernels
  (on by default on TPU; force with ``ZUKO_TPU_FUSED_DISPATCH=1``/``0``).
  Mirrors the reference, where the fused ``call_and_ladj`` protocol IS the
  API (zuko/transforms.py:46-56).
* ``nsf_fused`` — whole-flow fused density/sampling kernels covering
  NSF/NCSF splines, MAF affine univariates, SOSPF/BPF polynomial
  univariates (density-only — their inverses are iterative solves) and
  NICE/RealNVP coupling, optional context: every hyper-net matmul,
  constraint pipeline, univariate evaluation and the base density in one
  kernel per batch tile, with the constraint/univariate math vectorized
  across features via a param-major output layout.
  (`ZUKO_TPU_FUSED_NSF=0` falls back to the identical jnp math.)
* ``naf_fused`` — whole-flow NAF/UNAF sampling: every autoregressive sweep,
  bisection iterate and monotone-net/quadrature evaluation per batch tile
  with the weights pinned in VMEM.
* ``gf_fused`` — whole-flow GF density AND sampling: element-wise
  gaussianization layers with analytic log-Jacobians, rotation matmuls and
  per-feature bisection inverses per batch tile (in-kernel erf/erfinv —
  Mosaic lowers neither).
* ``cnf_fused`` — whole-flow CNF density: the entire adaptive dopri45
  integration of the augmented (state, log-Jacobian) system per batch tile,
  exact forward-mode trace columns batched along lanes or a Hutchinson
  probe, with the ODE net resident in VMEM.
* ``rqs`` / ``masked_linear`` — per-op kernels (reference anchors:
  zuko/transforms.py:449-567, zuko/nn.py:202-218). Bit-exact but they break
  XLA whole-graph fusion at tabular sizes, so opt-in via
  ``ZUKO_TPU_KERNELS=1``.

Every kernel has a pure-jnp fallback with identical semantics, used on
CPU/GPU and inside custom-VJP backwards.
"""

import os

import jax

__all__ = [
    "cnf_fused",
    "dispatch",
    "gf_fused",
    "kernels_enabled",
    "masked_linear",
    "naf_fused",
    "nsf_fused",
    "rqs",
]


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


from . import (  # noqa: E402, F401
    cnf_fused,
    dispatch,
    gf_fused,
    masked_linear,
    naf_fused,
    nsf_fused,
    rqs,
)
