r"""Automatic fused-kernel dispatch for the flow zoo.

In the reference, the fused fast path *is* the API: ``call_and_ladj`` is
monkeypatched onto every transform so every caller gets it
(reference: zuko/transforms.py:46-56). The TPU-native analogue: when a
:class:`zuko_tpu.lazy.Flow` is called, its structure is inspected once and —
if it matches what the whole-flow Pallas kernels can represent — the returned
distribution routes ``log_prob`` / ``sample`` / ``sample_and_log_prob``
through :mod:`zuko_tpu.ops.nsf_fused` automatically. Anything the kernels
cannot represent (LayerNorm/residual/non-ReLU hyper-nets, exotic univariates,
non-standard bases) falls back to the XLA path, so dispatch never changes
results — only speed.

Dispatch policy (``ZUKO_TPU_FUSED_DISPATCH``):

* ``"auto"`` (default): dispatch on TPU backends only — on CPU/GPU the XLA
  path is used directly (the fused jnp fallback has no advantage there).
* ``"1"``: always dispatch (tests use this to exercise the fused math on CPU).
* ``"0"``: never dispatch.

The differentiable sampling path (``rsample`` / ``rsample_and_log_prob``,
the reverse-KL workhorse — reference: zuko/distributions.py:129-138) runs the
fused kernels too, via an implicit-function-theorem custom VJP
(:mod:`zuko_tpu.ops.ift`): the fused solve forward, one transposed-triangular
solve per layer backward — no differentiation through the scan inverse.
``ZUKO_TPU_IFT=0`` falls back to the XLA scan-inverse gradients.
"""

from __future__ import annotations

import os

import jax

from ..distributions import NormalizingFlow
from .cnf_fused import (
    extract_cnf_params,
    fused_cnf_log_prob,
    fused_cnf_sample,
)
from .gf_fused import extract_gf_params, fused_gf_log_prob, fused_gf_sample
from .naf_fused import (
    extract_naf_params,
    fused_naf_log_prob,
    fused_naf_sample,
)
from .nsf_fused import (
    FusedStructureError,
    extract_coupling_params,
    extract_nsf_params,
    fused_nice_log_prob,
    fused_nsf_apply,
    fused_nsf_log_prob,
    fused_nsf_sample,
)

__all__ = [
    "FusedAutoregressiveFlow",
    "FusedContinuousFlow",
    "FusedCouplingFlow",
    "FusedDensityFlow",
    "FusedGaussianizationFlow",
    "FusedInvertedAutoregressiveFlow",
    "FusedNeuralSamplingFlow",
    "fused_dispatch_enabled",
    "maybe_fused_flow",
]


def fused_dispatch_enabled() -> bool:
    """Whether ``Flow.__call__`` should attempt fused dispatch."""
    env = os.environ.get("ZUKO_TPU_FUSED_DISPATCH", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() not in ("cpu", "gpu")


def _ift_enabled() -> bool:
    """Whether the differentiable sampling path uses the IFT custom VJP
    (default) or falls back to differentiating the XLA scan inverse."""
    return os.environ.get("ZUKO_TPU_IFT", "1") != "0"


class FusedAutoregressiveFlow(NormalizingFlow):
    r"""A :class:`NormalizingFlow` whose density and sampling run through the
    fused whole-flow kernels (NSF/MAF structure). ``log_prob`` is
    differentiable (custom VJP over the identical jnp math); ``rsample`` and
    ``rsample_and_log_prob`` run the fused solve with IFT gradients
    (:mod:`zuko_tpu.ops.ift`)."""

    def __init__(self, transform, base, module, c):
        super().__init__(transform, base)
        self._module = module
        self._c = c

    def log_prob(self, x):
        return fused_nsf_log_prob(self._module, x, self._c)

    def sample(self, key, sample_shape=()):
        return fused_nsf_sample(self._module, key, sample_shape, c=self._c)

    def sample_and_log_prob(self, key, sample_shape=()):
        return fused_nsf_sample(
            self._module, key, sample_shape, c=self._c, want_log_prob=True
        )

    def rsample(self, key, sample_shape=()):
        if _ift_enabled():
            from .ift import fused_nsf_rsample

            return fused_nsf_rsample(self._module, key, sample_shape, c=self._c)
        return NormalizingFlow.sample(self, key, sample_shape)

    def rsample_and_log_prob(self, key, sample_shape=()):
        if _ift_enabled():
            from .ift import fused_nsf_rsample

            return fused_nsf_rsample(
                self._module, key, sample_shape, c=self._c, want_log_prob=True
            )
        return NormalizingFlow.sample_and_log_prob(self, key, sample_shape)


class FusedDensityFlow(NormalizingFlow):
    r"""A :class:`NormalizingFlow` for the polynomial families (SOSPF/BPF):
    density through the fused whole-flow AR kernel, sampling through the
    fused iterative inverse (coarse bisection + free-derivative Newton —
    the forward already returns log f'). ``rsample`` runs the same solve
    with IFT gradients (exact at the solved point to solver tolerance)."""

    def __init__(self, transform, base, module, c):
        super().__init__(transform, base)
        self._module = module
        self._c = c

    def log_prob(self, x):
        return fused_nsf_log_prob(self._module, x, self._c)

    def sample(self, key, sample_shape=()):
        return fused_nsf_sample(self._module, key, sample_shape, c=self._c)

    def sample_and_log_prob(self, key, sample_shape=()):
        return fused_nsf_sample(
            self._module, key, sample_shape, c=self._c, want_log_prob=True
        )

    def rsample(self, key, sample_shape=()):
        if _ift_enabled():
            from .ift import fused_nsf_rsample

            return fused_nsf_rsample(self._module, key, sample_shape, c=self._c)
        return NormalizingFlow.sample(self, key, sample_shape)

    def rsample_and_log_prob(self, key, sample_shape=()):
        if _ift_enabled():
            from .ift import fused_nsf_rsample

            return fused_nsf_rsample(
                self._module, key, sample_shape, c=self._c, want_log_prob=True
            )
        return NormalizingFlow.sample_and_log_prob(self, key, sample_shape)


class FusedCouplingFlow(NormalizingFlow):
    r"""A :class:`NormalizingFlow` whose density runs through the fused
    coupling (NICE/RealNVP) math; sampling keeps the XLA path (coupling
    inversion is two sweeps — already cheap under XLA), but at HIGHEST
    matmul precision: coupling ladjs are direct functions of the hyper
    output (no constraint pipeline to absorb rounding), so a 1-pass
    inverse solves a ~1e-3-perturbed transform and the reported log q
    then disagrees with the exact-precision density by the z-mismatch
    (the NSF r11 lesson, tools/tpu_regression.py)."""

    def __init__(self, transform, base, module, c):
        super().__init__(transform, base)
        self._module = module
        self._c = c

    def log_prob(self, x):
        return fused_nice_log_prob(self._module, x, self._c)

    def sample(self, key, sample_shape=()):
        with jax.default_matmul_precision("highest"):
            return super().sample(key, sample_shape)

    def sample_and_log_prob(self, key, sample_shape=()):
        with jax.default_matmul_precision("highest"):
            x = super().sample(key, sample_shape)
        return x, self.log_prob(x)

    rsample_and_log_prob = sample_and_log_prob


class FusedContinuousFlow(NormalizingFlow):
    r"""A :class:`NormalizingFlow` whose density AND sampling run through
    the fused CNF kernels (:mod:`zuko_tpu.ops.cnf_fused`): the whole
    adaptive dopri45 integration (augmented with the log-Jacobian for
    densities and ``sample_and_log_prob``, un-augmented for the plain
    inverse) per batch tile with the ODE net resident in VMEM.
    ``rsample``/``rsample_and_log_prob`` run the same fused forward under a
    continuous-adjoint custom VJP (:func:`zuko_tpu.ops.cnf_fused.fused_cnf_rsample`):
    one fresh augmented adjoint integration backward instead of the XLA
    path's forward integration + stored-step discrete adjoint."""

    def __init__(self, transform, base, module, c):
        super().__init__(transform, base)
        self._module = module
        self._c = c

    def log_prob(self, x):
        return fused_cnf_log_prob(self._module, self.transform, x, self._c)

    def sample(self, key, sample_shape=()):
        return fused_cnf_sample(
            self._module, self.transform, key, sample_shape, c=self._c
        )

    def sample_and_log_prob(self, key, sample_shape=()):
        return fused_cnf_sample(
            self._module, self.transform, key, sample_shape, c=self._c,
            want_log_prob=True,
        )

    def rsample(self, key, sample_shape=()):
        if _ift_enabled():
            from .cnf_fused import fused_cnf_rsample

            return fused_cnf_rsample(
                self._module, self.transform, key, sample_shape, c=self._c
            )
        return NormalizingFlow.sample(self, key, sample_shape)

    def rsample_and_log_prob(self, key, sample_shape=()):
        if _ift_enabled():
            from .cnf_fused import fused_cnf_rsample

            return fused_cnf_rsample(
                self._module, self.transform, key, sample_shape, c=self._c,
                want_log_prob=True,
            )
        return NormalizingFlow.sample_and_log_prob(self, key, sample_shape)


class FusedGaussianizationFlow(NormalizingFlow):
    r"""A :class:`NormalizingFlow` whose density AND sampling run through the
    fused GF kernels (:mod:`zuko_tpu.ops.gf_fused`): analytic gaussianization
    log-Jacobians, rotation matmuls and per-feature bisection inverses per
    batch tile. ``rsample``/``rsample_and_log_prob`` run the fused solve
    with IFT gradients (:mod:`zuko_tpu.ops.ift`: diagonal solves +
    orthogonal-rotation transposes — no iteration)."""

    def __init__(self, transform, base, module, c):
        super().__init__(transform, base)
        self._module = module
        self._c = c

    def log_prob(self, x):
        return fused_gf_log_prob(self._module, x, self._c)

    def sample(self, key, sample_shape=()):
        return fused_gf_sample(self._module, key, sample_shape, c=self._c)

    def sample_and_log_prob(self, key, sample_shape=()):
        return fused_gf_sample(
            self._module, key, sample_shape, c=self._c, want_log_prob=True
        )

    def rsample(self, key, sample_shape=()):
        if _ift_enabled():
            from .ift import fused_gf_rsample

            return fused_gf_rsample(self._module, key, sample_shape,
                                    c=self._c)
        return NormalizingFlow.sample(self, key, sample_shape)

    def rsample_and_log_prob(self, key, sample_shape=()):
        if _ift_enabled():
            from .ift import fused_gf_rsample

            return fused_gf_rsample(
                self._module, key, sample_shape, c=self._c,
                want_log_prob=True,
            )
        return NormalizingFlow.sample_and_log_prob(self, key, sample_shape)


class FusedNeuralSamplingFlow(NormalizingFlow):
    r"""A :class:`NormalizingFlow` whose (non-differentiable) ``sample`` runs
    through the fused NAF inversion kernel — the reference's single worst
    hot loop, ~25 bisection steps × monotone-net evals per feature per sweep
    (reference: zuko/transforms.py:609-617) — and whose density runs the
    fused forward kernel with ANALYTIC log-Jacobians (the monotone-net
    derivative / UMNN integrand point) instead of the XLA path's jvp.
    ``rsample``/``rsample_and_log_prob`` run the fused solve with IFT
    gradients (:mod:`zuko_tpu.ops.ift`), exact at the solved point to
    solver tolerance."""

    def __init__(self, transform, base, module, c):
        super().__init__(transform, base)
        self._module = module
        self._c = c

    def log_prob(self, x):
        return fused_naf_log_prob(self._module, x, self._c)

    def sample(self, key, sample_shape=()):
        return fused_naf_sample(self._module, key, sample_shape, c=self._c)

    def sample_and_log_prob(self, key, sample_shape=()):
        # fused log q: forward ladj evaluated analytically at the solved x
        # (one extra exact net evaluation per layer — no autograd pass)
        return fused_naf_sample(
            self._module, key, sample_shape, c=self._c, want_log_prob=True
        )

    def rsample(self, key, sample_shape=()):
        if _ift_enabled():
            from .ift import fused_naf_rsample

            return fused_naf_rsample(self._module, key, sample_shape,
                                     c=self._c)
        return NormalizingFlow.sample(self, key, sample_shape)

    def rsample_and_log_prob(self, key, sample_shape=()):
        if _ift_enabled():
            from .ift import fused_naf_rsample

            return fused_naf_rsample(
                self._module, key, sample_shape, c=self._c,
                want_log_prob=True,
            )
        return NormalizingFlow.sample_and_log_prob(self, key, sample_shape)


class FusedInvertedAutoregressiveFlow(NormalizingFlow):
    r"""An INVERTED flow (``Flow(flow.transform.inv, flow.base)`` — the
    reference's reverse-KL recipe, zuko/lazy.py:81-98) whose roles swap
    onto the fused kernels: ``sample``/``rsample``/``sample_and_log_prob``
    are the density-direction forward APPLY (no solve at all,
    differentiable via the apply op's custom VJP), and ``log_prob`` is the
    fused solve with raw-mode IFT gradients
    (``ift.fused_nsf_inverse_and_ladj``). ``_module`` holds the
    UN-inverted structure the extractors recognize."""

    def __init__(self, transform, base, module, c):
        super().__init__(transform, base)
        self._module = module
        self._c = c

    def log_prob(self, x):
        from .ift import fused_nsf_inverse_and_ladj

        u, sladj = fused_nsf_inverse_and_ladj(self._module, x, self._c)
        return self.base.log_prob(u) - sladj

    def sample(self, key, sample_shape=()):
        z = self.base.sample(key, sample_shape)
        y, _ = fused_nsf_apply(self._module, z, self._c)
        return y

    rsample = sample  # the apply op is differentiable (custom VJP)

    def sample_and_log_prob(self, key, sample_shape=()):
        z = self.base.sample(key, sample_shape)
        y, sladj = fused_nsf_apply(self._module, z, self._c)
        return y, self.base.log_prob(z) - sladj

    rsample_and_log_prob = sample_and_log_prob


class _UninvertedShim:
    """What the extractors see for an inverted flow: the inner (forward)
    lazy transform with the flow's own base."""

    def __init__(self, transform, base):
        self.transform = transform
        self.base = base


def maybe_fused_flow(module, transform, base, c):
    """Return a fused :class:`NormalizingFlow` for ``module`` if its structure
    matches the fused kernels, else ``None`` (caller falls back to the plain
    XLA-path distribution)."""
    from ..lazy import LazyInverse

    if isinstance(getattr(module, "transform", None), LazyInverse):
        inner = _UninvertedShim(module.transform.transform, module.base)
        try:
            extract_nsf_params(inner)
        except FusedStructureError:
            return None  # inverted non-AR structures keep the XLA path
        return FusedInvertedAutoregressiveFlow(transform, base, inner, c)
    try:
        _, nsf_cfg = extract_nsf_params(module)
    except FusedStructureError:
        pass
    else:
        if nsf_cfg["univ"] in ("sosp", "bernstein"):
            return FusedDensityFlow(transform, base, module, c)
        return FusedAutoregressiveFlow(transform, base, module, c)
    try:
        extract_coupling_params(module)
    except FusedStructureError:
        pass
    else:
        return FusedCouplingFlow(transform, base, module, c)
    try:
        extract_gf_params(module, c)
    except FusedStructureError:
        pass
    else:
        return FusedGaussianizationFlow(transform, base, module, c)
    try:
        extract_cnf_params(module, transform, c)
    except FusedStructureError:
        pass
    else:
        return FusedContinuousFlow(transform, base, module, c)
    try:
        extract_naf_params(module)
    except FusedStructureError:
        return None
    return FusedNeuralSamplingFlow(transform, base, module, c)
