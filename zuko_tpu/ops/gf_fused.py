r"""Whole-flow fused Gaussianization-flow (GF) kernels.

One Pallas program per batch tile computes the full GF density — every
element-wise gaussianization layer :math:`f(x) = \sqrt 2\,\mathrm{erfinv}
\big((1-\epsilon)\,\tfrac 1K\sum_i \mathrm{erf}((s_i x + b_i)/\sqrt 2)\big)`
with its *analytic* log-Jacobian, every interleaved rotation matmul, and the
standard-normal base — and, for sampling, every per-feature bisection solve
of the gaussianization inverse with the layer parameters resident in VMEM.

Reference semantics: zuko/transforms.py:834-875 (GaussianizationTransform),
zuko/transforms.py:1217-1244 (RotationTransform), zuko/flows/gaussianization.py:97-155
(the GF recipe: element-wise layers with trainable rotations interleaved).

Mosaic has no ``erf``/``erfinv`` lowering, so the kernels carry their own
f32 implementations (Abramowitz–Stegun 7.1.26 for :math:`\mathrm{erf}`,
Giles 2012 for :math:`\mathrm{erfinv}`); the jnp fallback path runs the
IDENTICAL approximations so the math validated on CPU is the math the kernel
executes (|err| vs the libm pair is ~1e-7, amplified to ~1e-4 on log-densities
deep in the tails — the fused-vs-XLA parity tolerance below).

Batched (per-row) contexts are representable since round 5: the per-row
hyper outputs stream through the kernel as column blocks concatenated to
the data rows (see :func:`_flatten_gf`). Like the other fused families,
everything non-representable (non-Gaussianization univariates, non-standard
bases) raises :class:`FusedStructureError` so dispatch falls back to the
always-correct XLA path instead of silently computing a wrong density.
"""

from __future__ import annotations

__all__ = [
    "extract_gf_params",
    "fused_gf_log_prob",
    "fused_gf_sample",
]

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .nsf_fused import (
    _BWD_CHUNK,
    _TB,
    FusedStructureError,
    _log_ladj,
    _require_standard_base,
    _use_pallas_fused,
)

try:  # pragma: no cover - exercised on TPU only
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None

_LOG_2PI = math.log(2.0 * math.pi)
_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_EPS_GF = 1e-6  # the reference's mean shrink factor (zuko/transforms.py:838)


# ----------------------------------------------------------- special functions


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational approximation of erf (|abs err| <
    1.5e-7) — Mosaic lowers no erf primitive, and running the same polynomial
    on the fallback path keeps kernel == fallback exactly."""
    sign = jnp.where(x < 0.0, -1.0, 1.0)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _erfinv(x):
    """Giles (2012) single-precision erfinv approximation."""
    w = -jnp.log((1.0 - x) * (1.0 + x))
    # central branch (w < 5)
    wc = w - 2.5
    p1 = 2.81022636e-08
    p1 = 3.43273939e-07 + p1 * wc
    p1 = -3.5233877e-06 + p1 * wc
    p1 = -4.39150654e-06 + p1 * wc
    p1 = 0.00021858087 + p1 * wc
    p1 = -0.00125372503 + p1 * wc
    p1 = -0.00417768164 + p1 * wc
    p1 = 0.246640727 + p1 * wc
    p1 = 1.50140941 + p1 * wc
    # tail branch
    wt = jnp.sqrt(jnp.maximum(w, 5.0)) - 3.0
    p2 = -0.000200214257
    p2 = 0.000100950558 + p2 * wt
    p2 = 0.00134934322 + p2 * wt
    p2 = -0.00367342844 + p2 * wt
    p2 = 0.00573950773 + p2 * wt
    p2 = -0.0076224613 + p2 * wt
    p2 = 0.00943887047 + p2 * wt
    p2 = 1.00167406 + p2 * wt
    p2 = 2.83297682 + p2 * wt
    return jnp.where(w < 5.0, p1, p2) * x


# ----------------------------------------------------------------- extraction


def extract_gf_params(flow, c=None):
    """Validate a GF structure and pull its parameters into kernel form.

    Returns ``(stages, features)`` with stages a list of
    ``("gauss", shift (F,K), raw_scale (F,K))`` /
    ``("gaussb", shift (*B,F,K), raw_scale (*B,F,K))`` / ``("rot", A (F,F))``
    entries, in forward order. Conditional element-wise layers compute their
    per-feature parameters with the hyper MLP OUTSIDE the kernel (they do
    not depend on x); with a *batched* context the per-row parameters are
    marked ``gaussb`` and stream through the kernel alongside the data rows
    (see :func:`_flatten_gf`). Anything non-representable raises
    :class:`FusedStructureError`.
    """
    from ..flows.gaussianization import ElementWiseTransform
    from ..lazy import LazyComposedTransform, UnconditionalTransform
    from ..transforms import GaussianizationTransform, RotationTransform
    from ..utils import unpack

    if not isinstance(getattr(flow, "transform", None), LazyComposedTransform):
        raise FusedStructureError(
            "fused GF kernels require a Flow with a LazyComposedTransform"
        )

    stages = []
    features = None
    for t in flow.transform.transforms:
        if isinstance(t, UnconditionalTransform):
            if t.f is not RotationTransform or t.kwargs or len(t.args) != 1:
                raise FusedStructureError(
                    "fused GF kernels support RotationTransform interleaves"
                    f" only, got {t.f}"
                )
            A = t.args[0]
            if A.ndim != 2 or A.shape[0] != A.shape[1]:
                raise FusedStructureError(f"rotation A must be square, got {A.shape}")
            stages.append(("rot", A))
            continue
        if type(t) is not ElementWiseTransform:
            raise FusedStructureError(
                "fused GF kernels support ElementWiseTransform and rotation"
                f" layers only, got {type(t).__name__}"
            )
        if t.univariate is not GaussianizationTransform:
            raise FusedStructureError(
                "fused GF kernels support GaussianizationTransform"
                f" univariates only, got {t.univariate}"
            )
        if (
            len(t.shapes) != 2
            or t.shapes[0] != t.shapes[1]
            or len(t.shapes[0]) != 1
            or t.shapes[0][0] < 1
        ):
            raise FusedStructureError(f"unexpected GF shapes {t.shapes}")
        if t.hyper is not None:
            if c is None:
                raise FusedStructureError("conditional GF called without context")
            batched = jnp.ndim(c) > 1
            phi = t.hyper(c)
            phi = phi.reshape(phi.shape[:-1] + (-1, t.total))
            shift, raw = unpack(phi, t.shapes)
        else:
            batched = False
            shift, raw = t.phi
        if features is None:
            features = shift.shape[-2]
        if shift.shape[-2:] != (features, t.shapes[0][0]):
            raise FusedStructureError(
                f"inconsistent GF layer shapes: {shift.shape}"
            )
        stages.append(("gaussb" if batched else "gauss", shift, raw))

    if features is None:
        raise FusedStructureError("flow has no gaussianization layers")
    for kind, *arrs in stages:
        if kind == "rot" and arrs[0].shape != (features, features):
            raise FusedStructureError(
                f"rotation shape {arrs[0].shape} != ({features}, {features})"
            )

    _require_standard_base(flow, features)
    return stages, features


def _flatten_gf(flow, c=None):
    """stages -> (flat kernel params, static layout, features, data_cols).

    The non-kernel math — ``scale = exp(raw)`` (zuko/transforms.py:833) and
    ``R = expm(A - A^T)`` (zuko/transforms.py:1165) — happens here, OUTSIDE
    the custom-VJP boundary, so gradients to ``raw``/``A`` flow through
    XLA's own expm/exp rules.

    Batched-context layers (``gaussb``) do not land in the flat params:
    their per-ROW parameters are laid out as ``data_cols (*B, 2*K*F)``
    column blocks (K-major: component k of feature f at column ``k*F + f``,
    shifts then scales) to be CONCATENATED to the data rows by the caller —
    so they stream through the kernel per batch tile exactly like x, and
    the custom-VJP row chunking keeps rows and their parameters together.
    ``data_cols`` is None for a fully unbatched flow."""
    stages, features = extract_gf_params(flow, c)
    flat, layout, cols = [], [], []
    for kind, *arrs in stages:
        if kind == "gauss":
            shift, raw = arrs
            flat += [shift, jnp.exp(raw)]
            layout.append(("gauss", shift.shape[1]))
        elif kind == "gaussb":
            shift, raw = arrs
            K = shift.shape[-1]
            B = shift.shape[:-2]
            cols.append(jnp.swapaxes(shift, -1, -2).reshape(B + (K * features,)))
            cols.append(
                jnp.swapaxes(jnp.exp(raw), -1, -2).reshape(B + (K * features,))
            )
            layout.append(("gaussb", K))
        else:
            (A,) = arrs
            flat.append(jax.scipy.linalg.expm(A - A.T))
            layout.append(("rot",))
    data_cols = jnp.concatenate(cols, axis=-1) if cols else None
    return flat, tuple(layout), features, data_cols


def _aug_width(layout, F):
    """Width of the kernel's streamed rows: F data features plus every
    batched layer's 2*K*F per-row parameter columns."""
    return F + sum(2 * e[1] * F for e in layout if e[0] == "gaussb")


def _gf_tb(layout, F):
    """Live-set-aware batch tile (the nsf_fused._density_tb pattern): the
    streamed per-row parameter columns of a batched-context flow multiply
    the per-tile VMEM footprint by 2*L*K, so halve the tile until the
    live set fits the budget — a fixed 1024-row tile would overflow VMEM
    at large D*K (e.g. D=64, K=8, L=3 streams 3072 columns/row)."""
    from .nsf_fused import _VMEM_TILE_BUDGET

    live = _aug_width(layout, F) + 8 * F  # aug tile + per-component work
    tb = _TB
    while tb > 128 and live * tb > _VMEM_TILE_BUDGET:
        tb //= 2
    return tb


# ------------------------------------------------------------ transposed math


def _dot_rot(R, x):
    # tiny (F, F) x (F, TB) matmul; HIGHEST keeps it f32-exact (a single
    # bf16 MXU pass would cost ~1e-3 on the densities)
    return jax.lax.dot_general(
        R, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.promote_types(R.dtype, x.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )


def _comp(arr, i):
    """Component ``i`` of a per-layer parameter: a column of an unbatched
    ``(F, K)`` array, or the pre-sliced per-row ``(F, TB)`` block when the
    layer's parameters are batched (a tuple built by :func:`_gf_stages_T`)."""
    if isinstance(arr, tuple):
        return arr[i]
    return arr[:, i : i + 1]


def _gauss_mean_F(x, shift, scale, K, want_deriv=True):
    """m(x) = (1-eps) mean_i erf((s_i x + b_i)/sqrt 2) and the LOG of the
    un-normalized derivative sum,
    ``logS = logsumexp_i(log s_i - (s_i x + b_i)^2 / 2)``, both (F, TB).

    ``shift``/``scale`` are either unbatched ``(F, K)`` arrays (components
    broadcast over the tile) or K-tuples of per-row ``(F, TB)`` blocks (a
    batched-context layer — every row carries its own mixture).

    The log-sum-exp is streamed (running max + rescaled sum) instead of
    ``log(sum_i s_i exp(-z_i^2/2))``: the naive sum UNDERFLOWS to exactly 0
    in f32 wherever every mixture component saturates (|z_i| >~ 9.3), which
    turned the ladj into -inf and the training loss into inf — the GF
    init-fragility mechanism (PARITY.md: 1/6 seeds diverging at step 3-5 on
    both the fused and XLA paths). The stable form is finite for any
    parameters. ``want_deriv=False`` skips it (the coarse bisection only
    compares m)."""
    m = None
    lmax = None
    acc = None
    for i in range(K):
        s = _comp(scale, i)
        z = s * x + _comp(shift, i)
        e = _erf(z * _INV_SQRT2)
        m = e if m is None else m + e
        if want_deriv:
            li = _log_ladj(s) - 0.5 * z * z
            if lmax is None:
                lmax, acc = li, jnp.ones_like(li)
            else:
                new = jnp.maximum(lmax, li)
                acc = acc * jnp.exp(lmax - new) + jnp.exp(li - new)
                lmax = new
    logS = None if lmax is None else lmax + _log_ladj(acc)
    return m * ((1.0 - _EPS_GF) / K), logS


def _gauss_forward_F(x, shift, scale, K):
    """y = sqrt(2) erfinv(m(x)) and the analytic ladj
    log f'(x) = y^2/2 + log((1-eps)/K) + logS  (the erfinv chain rule —
    the XLA path gets the same value by the log-stable analytic override in
    GaussianizationTransform.call_and_ladj)."""
    m, logS = _gauss_mean_F(x, shift, scale, K)
    y = _erfinv(m) * math.sqrt(2.0)
    ladj = 0.5 * y * y + math.log((1.0 - _EPS_GF) / K) + logS
    return y, ladj


def _gf_stages_T(augT, flat_params, layout, F):
    """Walk ``layout`` into concrete per-layer stages:
    ``("gauss", shift, scale, K, loc)`` / ``("rot", R, loc)`` where batched
    layers' shift/scale are K-tuples of per-row ``(F, TB)`` blocks sliced
    from the augmented tile ``augT (W, TB)`` (rows beyond F are the streamed
    per-row parameter columns of :func:`_flatten_gf`). ``loc`` records where
    the layer's parameters live — ``("p", flat_idx)`` or ``("a", row_off)``
    — for backward passes that assemble parameter cotangents."""
    out = []
    idx, off = 0, F
    for entry in layout:
        if entry[0] == "gauss":
            out.append((
                "gauss", flat_params[idx], flat_params[idx + 1], entry[1],
                ("p", idx),
            ))
            idx += 2
        elif entry[0] == "gaussb":
            K = entry[1]
            shift = tuple(
                augT[off + i * F : off + (i + 1) * F] for i in range(K)
            )
            scale = tuple(
                augT[off + (K + i) * F : off + (K + i + 1) * F]
                for i in range(K)
            )
            out.append(("gauss", shift, scale, K, ("a", off)))
            off += 2 * K * F
        else:
            out.append(("rot", flat_params[idx], ("p", idx)))
            idx += 1
    return out


def _gf_math_T(xT, flat_params, layout, F):
    """Transposed whole-flow density: xT (W, TB) — data rows first, then any
    streamed per-row parameter columns — -> log_prob (1, TB)."""
    acc = None
    cur = xT[:F]
    for st in _gf_stages_T(xT, flat_params, layout, F):
        if st[0] == "gauss":
            _, shift, scale, K, _ = st
            cur, ladj = _gauss_forward_F(cur, shift, scale, K)
            s = jnp.sum(ladj, axis=0, keepdims=True)
            acc = s if acc is None else acc + s
        else:
            cur = _dot_rot(st[1], cur)
    lp = -0.5 * jnp.sum(cur * cur, axis=0, keepdims=True) - 0.5 * F * _LOG_2PI
    return lp if acc is None else lp + acc


# bisection count: MonotonicTransform's bound=10/eps=1e-6 bracket plus the
# newton_bisection safety margin (zuko_tpu/transforms.py MonotonicTransform).
# A coarse/fine (11-iter + analytic-Newton) variant was A/B'd on hardware
# and REJECTED (tools/tpu_validate_r40.py): it was ~15% slower AND its
# clipped Newton steps in the saturated tails produced log q
# self-consistency outliers of ~10 nats (erf-mixture plateaus leave
# Newton no slope to work with) — the full even-subdivision bracket is
# both the fast and the robust solver here, unlike the NAF/UNAF nets
# whose evaluations are expensive enough for coarse/fine to win.
_GF_BOUND = 10.0
_GF_N_ITER = int(math.ceil(math.log2(2 * _GF_BOUND / 1e-6))) + 4


def _gauss_inverse_F(y, shift, scale, K):
    """Solve f(x) = y by bisection in erf-space: f(x) = y iff
    m(x) = erf(y / sqrt 2), and erf is monotone, so comparing m(mid) against
    the erf-space target makes the same accept/reject decisions as the
    reference's f-space bisection (zuko/transforms.py:609-617) without an
    erfinv per iterate. The derivative exponentials are skipped per
    iterate (only the density path needs S)."""
    target = _erf(y * _INV_SQRT2)

    # rolled lax loop — a Python unroll bloats the Mosaic program ~30x
    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        m, _ = _gauss_mean_F(mid, shift, scale, K, want_deriv=False)
        go_right = m < target
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid)
        return lo, hi

    lo = jnp.full_like(y, -_GF_BOUND)
    hi = jnp.full_like(y, _GF_BOUND)
    lo, hi = jax.lax.fori_loop(0, _GF_N_ITER, body, (lo, hi))
    return 0.5 * (lo + hi)


def _gf_sample_math_T(zT, flat_params, layout, F, want_log_prob=False):
    """Transposed whole-flow sampling: zT (W, TB) — base draws in the first
    F rows, then any streamed per-row parameter columns — -> x (F, TB)
    (+ optional log q(x) (1, TB): base density plus forward ladj at the
    recovered x, reference: zuko/distributions.py:129-138)."""
    z = zT[:F]
    acc = None
    if want_log_prob:
        acc = -0.5 * jnp.sum(z * z, axis=0, keepdims=True) - 0.5 * F * _LOG_2PI

    y = z
    for st in reversed(_gf_stages_T(zT, flat_params, layout, F)):
        if st[0] == "gauss":
            _, shift, scale, K, _ = st
            x = _gauss_inverse_F(y, shift, scale, K)
            if want_log_prob:
                _, ladj = _gauss_forward_F(x, shift, scale, K)
                acc = acc + jnp.sum(ladj, axis=0, keepdims=True)
            y = x
        else:
            # R^T y (orthogonal inverse, ladj 0)
            y = jax.lax.dot_general(
                st[1], y, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.promote_types(st[1].dtype, y.dtype),
                precision=jax.lax.Precision.HIGHEST,
            )
    if want_log_prob:
        return y, acc
    return y


# ------------------------------------------------------------------- kernels


def _gf_kernel_T(x_ref, *refs, layout, F, n_params):
    params = [refs[i][...] for i in range(n_params)]
    out_ref = refs[n_params]
    out_ref[...] = _gf_math_T(x_ref[...], params, layout, F)


def _gf_sample_kernel_T(z_ref, *refs, layout, F, n_params, want_log_prob):
    params = [refs[i][...] for i in range(n_params)]
    out = _gf_sample_math_T(z_ref[...], params, layout, F, want_log_prob)
    if want_log_prob:
        refs[n_params][...], refs[n_params + 1][...] = out
    else:
        refs[n_params][...] = out


# --------------------------------------------------------------- public API


def fused_gf_log_prob(flow, x, c=None):
    r"""Compute ``flow(c).log_prob(x)`` for a GF with one fused Pallas kernel
    per batch tile (jnp fallback off-TPU), analytic gaussianization ladj
    instead of the XLA path's jvp. Differentiable via a custom VJP whose
    backward runs the identical jnp math. With a batched context the per-row
    hyper outputs stream through the kernel alongside x (see
    :func:`_flatten_gf`)."""
    flat_params, layout, F, cols = _flatten_gf(flow, c)
    if x.shape[-1] != F:
        raise FusedStructureError(
            f"x has {x.shape[-1]} features, flow has {F}"
        )
    if cols is not None:
        xb = jnp.broadcast_shapes(x.shape[:-1], cols.shape[:-1])
        x = jnp.broadcast_to(x, xb + (F,))
        cols = jnp.broadcast_to(cols, xb + cols.shape[-1:]).astype(x.dtype)
        x = jnp.concatenate([x, cols], axis=-1)
    return _gf_op(layout, F, x, *flat_params)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gf_op(layout, F, x, *flat_params):
    return _gf_impl(layout, F, x, *flat_params)


def _gf_fwd(layout, F, x, *flat_params):
    return _gf_impl(layout, F, x, *flat_params), (x, flat_params)


def _gf_bwd(layout, F, res, g):
    x, flat_params = res
    W = _aug_width(layout, F)

    def ref_math(x, fp):
        xf = x.reshape(-1, W)
        return _gf_math_T(xf.T, list(fp), layout, F)[0, :].reshape(x.shape[:-1])

    # row-chunked backward on TPU (same reasoning and ~15% pipelining win
    # as the NSF backward, nsf_fused._fused_bwd / tpu_validate_r42); any
    # streamed per-row parameter columns chunk WITH their rows, and their
    # cotangents ride back inside dx (the caller's concat splits them)
    rows = math.prod(x.shape[:-1]) if x.ndim > 1 else 1
    if rows > _BWD_CHUNK and jax.default_backend() not in ("cpu", "gpu"):
        flat_x = x.reshape(rows, W)
        flat_g = g.reshape(rows)
        n_chunks = -(-rows // _BWD_CHUNK)
        pad = n_chunks * _BWD_CHUNK - rows
        if pad:  # zero cotangent on pad rows: no gradient contribution
            flat_x = jnp.concatenate([flat_x, flat_x[:pad]], axis=0)
            flat_g = jnp.concatenate(
                [flat_g, jnp.zeros((pad,), flat_g.dtype)], axis=0)
        xch = flat_x.reshape(n_chunks, _BWD_CHUNK, W)
        gch = flat_g.reshape(n_chunks, _BWD_CHUNK)

        def one(chunk):
            xcc, gc = chunk
            _, vjp = jax.vjp(ref_math, xcc, flat_params)
            return vjp(gc)

        dx_ch, dfp_ch = jax.lax.map(one, (xch, gch))
        dx = dx_ch.reshape(n_chunks * _BWD_CHUNK, W)[:rows].reshape(x.shape)
        dfp = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), dfp_ch)
        return (dx, *dfp)

    _, vjp = jax.vjp(ref_math, x, flat_params)
    dx, dfp = vjp(g)
    return (dx, *dfp)


_gf_op.defvjp(_gf_fwd, _gf_bwd)


def _gf_impl(layout, F, x, *flat_params):
    W = _aug_width(layout, F)
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, W)

    if not _use_pallas_fused(x.dtype):
        return _gf_math_T(xf.T, list(flat_params), layout, F)[0, :].reshape(
            batch_shape
        )

    tb = _gf_tb(layout, F)
    n = xf.shape[0]
    pad = (-n) % tb
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    m = xf.shape[0]

    n_params = len(flat_params)
    param_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for p in flat_params
    ]
    out = pl.pallas_call(
        functools.partial(_gf_kernel_T, layout=layout, F=F, n_params=n_params),
        grid=(m // tb,),
        in_specs=[
            pl.BlockSpec((W, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m), x.dtype),
    )(xf.T, *flat_params)
    out = out[0, :n] if pad else out[0, :]
    return out.reshape(batch_shape)


def _gf_prep_sample(flow, key, sample_shape, c=None):
    """Shared GF sampling preamble: flatten, draw base samples (a batched
    context contributes its batch dims AFTER the draw shape, matching the
    XLA path's ``sample_shape + batch_shape + event``), and append any
    streamed per-row parameter columns. Returns
    ``(flat_params, layout, F, zf (n, W), out_shape)``."""
    flat_params, layout, F, cols = _flatten_gf(flow, c)
    dtype = flat_params[0].dtype if flat_params else (
        cols.dtype if cols is not None else jnp.float32
    )
    cbatch = tuple(cols.shape[:-1]) if cols is not None else ()
    shape = tuple(sample_shape) + cbatch + (F,)
    z = jax.random.normal(key, shape, dtype)
    zf = z.reshape(-1, F)
    if cols is not None:
        cf = jnp.broadcast_to(
            cols, tuple(sample_shape) + cbatch + cols.shape[-1:]
        ).reshape(-1, cols.shape[-1])
        zf = jnp.concatenate([zf, cf.astype(dtype)], axis=-1)
    return flat_params, layout, F, zf, z.shape


def fused_gf_sample(flow, key, sample_shape, c=None, want_log_prob=False):
    r"""Draw GF samples with one fused kernel: base draws, every rotation
    inverse and every per-feature gaussianization bisection run per batch
    tile with the parameters resident in VMEM — batched-context per-row
    parameters stream per tile alongside the draws (jnp fallback off-TPU).

    Sampling only (no gradients) — use ``rsample`` on the flow for the
    differentiable path (:mod:`zuko_tpu.ops.ift`)."""
    flat_params, layout, F, zf, z_shape = _gf_prep_sample(
        flow, key, sample_shape, c
    )
    out = _gf_sample_core(layout, F, want_log_prob, zf, list(flat_params))
    if want_log_prob:
        x, lp = out
        return x.reshape(z_shape), lp.reshape(z_shape[:-1])
    return out.reshape(z_shape)


def _gf_sample_core(layout, F, want_log_prob, zf, flat_params):
    """Flat-row GF sampling core: ``zf (n, W)`` — base draws in the first F
    columns, then any streamed per-row parameter columns — -> ``x (n, F)``
    (and ``log q (n,)``)."""
    W = _aug_width(layout, F)
    dtype = zf.dtype
    n = zf.shape[0]

    if not _use_pallas_fused(dtype):
        out = _gf_sample_math_T(
            zf.T, list(flat_params), layout, F, want_log_prob
        )
        if want_log_prob:
            x, lp = out
            return x.T, lp[0, :]
        return out.T

    tb = _gf_tb(layout, F)
    pad = (-n) % tb
    if pad:
        zf = jnp.pad(zf, ((0, pad), (0, 0)))
    m = zf.shape[0]

    n_params = len(flat_params)
    param_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for p in flat_params
    ]
    if want_log_prob:
        out_specs = (
            pl.BlockSpec((F, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((F, m), dtype),
            jax.ShapeDtypeStruct((1, m), dtype),
        )
    else:
        out_specs = pl.BlockSpec((F, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((F, m), dtype)

    out = pl.pallas_call(
        functools.partial(
            _gf_sample_kernel_T, layout=layout, F=F, n_params=n_params,
            want_log_prob=want_log_prob,
        ),
        grid=(m // tb,),
        in_specs=[
            pl.BlockSpec((W, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(zf.T, *flat_params)

    if want_log_prob:
        x, lp = out
        x = x.T[:n] if pad else x.T
        lp = lp[0, :n] if pad else lp[0, :]
        return x, lp
    return out.T[:n] if pad else out.T
