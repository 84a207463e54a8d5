r"""Fully-fused NSF density kernel.

One Pallas program computes the ENTIRE NSF ``log_prob`` for a batch tile:
all masked-MLP hyper passes (MXU), the spline parameter constraint pipeline
(slope clamp → softmax → cumsum → knots), the rational-quadratic spline
evaluation with log-Jacobian, and the standard-normal base log-density —
without materializing a single intermediate in HBM.

Rationale (see PERF.md): the jnp/XLA path is activation-bandwidth-bound
(~6.4KB HBM traffic per example); fused, the traffic is just inputs, outputs
and one pass over the weights per batch tile, turning the op compute-bound.

Forward-only: wrapped in a ``jax.custom_vjp`` whose backward differentiates
the identical jnp math, so training works transparently.

Reference anchors for the math: zuko/transforms.py:449-567 (spline),
zuko/nn.py:202-218 (masked linear), zuko/flows/autoregressive.py:207-215
(hyper-net → univariate parameters).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = [
    "FusedStructureError",
    "extract_coupling_params",
    "extract_nsf_params",
    "fused_flow_log_prob",
    "fused_flow_sample",
    "fused_nice_log_prob",
    "fused_nsf_log_prob",
    "fused_nsf_sample",
]

# batch tile (swept on v5e: 1024 > 2048 > 512 > 256; env override for
# hardware re-sweeps when kernel defaults shift the optimum)
_TB = int(os.environ.get("ZUKO_TPU_DENSITY_TB", "1024"))


class FusedStructureError(ValueError):
    """The flow's structure cannot be represented by the fused kernels.

    Raised instead of silently computing a wrong density (round-1 hazard:
    LayerNorm/residual/non-ReLU hyper-nets used to extract cleanly and return
    wrong numbers). The automatic dispatch catches this and falls back to the
    XLA path; direct calls surface it to the user.
    """


def _univ_config(univariate, shapes):
    """Resolve the univariate callable (possibly a functools.partial chain) to
    a supported kind plus its static (K, bound, slope) configuration."""
    from ..transforms import MonotonicAffineTransform, MonotonicRQSTransform

    func, kw = univariate, {}
    while isinstance(func, functools.partial):
        if func.args:
            raise FusedStructureError(
                "fused kernels do not support positional partial args on the"
                f" univariate ({func})"
            )
        kw = {**func.keywords, **kw}
        func = func.func

    from ..flows.spline import CircularRQSTransform

    shapes = tuple(tuple(s) for s in shapes)
    if func is MonotonicRQSTransform or func is CircularRQSTransform:
        if len(shapes) != 3 or not shapes[0]:
            raise FusedStructureError(f"unexpected RQS shapes {shapes}")
        K = shapes[0][0]
        if shapes != ((K,), (K,), (K - 1,)):
            raise FusedStructureError(f"unexpected RQS shapes {shapes}")
        if func is CircularRQSTransform:
            # circular shift + spline pinned to [-pi, pi]
            # (reference: zuko/flows/spline.py:65-72)
            extra = set(kw) - {"slope"}
            if extra:
                raise FusedStructureError(f"unsupported NCSF kwargs {extra}")
            return "crqs", K, math.pi, float(kw.get("slope", 1e-3))
        extra = set(kw) - {"bound", "slope"}
        if extra:
            raise FusedStructureError(f"unsupported RQS kwargs {extra}")
        return "rqs", K, float(kw.get("bound", 5.0)), float(kw.get("slope", 1e-3))
    if func is MonotonicAffineTransform:
        if shapes != ((), ()):
            raise FusedStructureError(f"unexpected affine shapes {shapes}")
        extra = set(kw) - {"slope"}
        if extra:
            raise FusedStructureError(f"unsupported affine kwargs {extra}")
        return "affine", 0, 5.0, float(kw.get("slope", 1e-3))

    from ..flows.polynomial import ShiftedSOSPTransform
    from ..transforms import BoundedBernsteinTransform

    if func is ShiftedSOSPTransform:
        # sum-of-squares polynomial + learned shift (SOSPF univariate,
        # reference: zuko/flows/polynomial.py:23-29,73-76); K carries the
        # static (polynomials, degree + 1) pair, bound is the fixed
        # MonotonicTransform domain (zuko/transforms.py:570-637)
        if (
            len(shapes) != 2 or len(shapes[0]) != 2 or shapes[1] != ()
            or not all(shapes[0])
        ):
            raise FusedStructureError(f"unexpected SOSP shapes {shapes}")
        extra = set(kw) - {"slope"}
        if extra:
            raise FusedStructureError(f"unsupported SOSP kwargs {extra}")
        return "sosp", tuple(shapes[0]), 10.0, float(kw.get("slope", 1e-3))
    if func is BoundedBernsteinTransform:
        # bounds-pinned Bernstein polynomial (BPF univariate, reference:
        # zuko/transforms.py:780-831); K carries the raw coefficient count
        if len(shapes) != 1 or len(shapes[0]) != 1 or shapes[0][0] < 1:
            raise FusedStructureError(f"unexpected Bernstein shapes {shapes}")
        if kw:
            raise FusedStructureError(f"unsupported Bernstein kwargs {set(kw)}")
        return "bernstein", shapes[0][0], 5.0, 1e-3
    raise FusedStructureError(
        f"fused kernels support RQS/affine/SOSP/Bernstein univariates,"
        f" got {func}"
    )


def _extract_mlp_linears(hyper, linear_cls):
    """Validate that ``hyper`` is a plain [linear, ReLU]* linear stack of
    exactly ``linear_cls`` layers and return them. Anything else — LayerNorm
    (``normalize=True``), residual blocks, a non-ReLU activation, bias-free
    layers — raises :class:`FusedStructureError` (the kernel hardcodes the
    ReLU epilogue and dense bias adds)."""
    from ..nn import Activation

    def _is_relu(fn):
        # identity OR name + EXACT jax module match: checkpoint round-trips
        # serialize jax.nn.relu BY VALUE (it does not pickle by reference),
        # so a loaded flow's activation is a fresh object — an identity-only
        # check silently dropped served models off the fused fast path
        # (caught by examples/serving.py). The module set is closed: any
        # callable merely NAMED "relu" from a path containing "jax" must
        # not silently select the ReLU kernel epilogue.
        if fn is jax.nn.relu:
            return True
        return (
            getattr(fn, "__name__", "") == "relu"
            and getattr(fn, "__module__", None)
            in ("jax.nn", "jax._src.nn.functions")
        )

    lins = []
    expect_linear = True
    for layer in hyper.layers:
        if expect_linear:
            if type(layer) is not linear_cls:
                raise FusedStructureError(
                    f"fused kernels support plain {linear_cls.__name__} stacks;"
                    f" hyper-net contains {type(layer).__name__}"
                )
            if layer.bias is None:
                raise FusedStructureError(
                    "fused kernels require biased hyper-net layers"
                )
            lins.append(layer)
            expect_linear = False
        else:
            if not (isinstance(layer, Activation) and _is_relu(layer.fn)):
                raise FusedStructureError(
                    "fused kernels support ReLU hyper-net activations only;"
                    f" got {type(layer).__name__}"
                    + (
                        f"({getattr(layer, 'fn', None)})"
                        if isinstance(layer, Activation)
                        else ""
                    )
                )
            expect_linear = True
    if expect_linear or not lins:
        raise FusedStructureError("hyper-net must end with a linear layer")
    return lins


def _require_standard_base(flow, features):
    """Require a *standard* DiagNormal base built through
    UnconditionalDistribution — the kernels hardcode the N(0, I) density, so
    anything else must fall back to the XLA path rather than silently
    computing a wrong log_prob. Traced loc/scale (trainable, i.e. not
    registered as buffers) cannot be checked and are rejected too."""
    from ..distributions import DiagNormal
    from ..lazy import UnconditionalDistribution

    base = getattr(flow, "base", None)
    if not isinstance(base, UnconditionalDistribution) or base.f is not DiagNormal:
        raise FusedStructureError(
            "fused kernels require an UnconditionalDistribution(DiagNormal)"
            f" base, got {type(base).__name__}"
        )
    if base.kwargs or len(base.args) != 2:
        raise FusedStructureError(
            "fused kernels support DiagNormal(loc, scale) bases only"
        )
    loc, scale = base.args
    if isinstance(loc, jax.core.Tracer) or isinstance(scale, jax.core.Tracer):
        raise FusedStructureError(
            "base loc/scale are traced (trainable); fused kernels support"
            " concrete standard-normal bases only"
        )
    loc, scale = np.asarray(loc), np.asarray(scale)
    if loc.shape != (features,) or scale.shape != (features,):
        raise FusedStructureError(
            f"base loc/scale must have shape ({features},),"
            f" got {loc.shape}/{scale.shape}"
        )
    if not (np.all(loc == 0.0) and np.all(scale == 1.0)):
        raise FusedStructureError(
            "fused kernels assume a standard-normal base N(0, I); got"
            " non-standard loc/scale"
        )


def _base_config(flow, features, univ):
    """Return the kernel-representable base description: ``("normal",)`` for
    a standard DiagNormal, ``("box", lo, hi)`` for a constant BoxUniform
    (the NCSF base, reference: zuko/flows/spline.py:112-117). Anything else
    raises :class:`FusedStructureError`."""
    if univ != "crqs":
        _require_standard_base(flow, features)
        return ("normal",)

    from ..distributions import BoxUniform
    from ..lazy import UnconditionalDistribution

    base = getattr(flow, "base", None)
    if not isinstance(base, UnconditionalDistribution) or base.f is not BoxUniform:
        raise FusedStructureError(
            "fused circular-spline kernels require an"
            f" UnconditionalDistribution(BoxUniform) base, got"
            f" {type(base).__name__}"
        )
    if base.kwargs or len(base.args) != 2:
        raise FusedStructureError(
            "fused kernels support BoxUniform(lower, upper) bases only"
        )
    lo, hi = base.args
    if isinstance(lo, jax.core.Tracer) or isinstance(hi, jax.core.Tracer):
        raise FusedStructureError(
            "base bounds are traced; fused kernels support concrete"
            " constant boxes only"
        )
    lo, hi = np.asarray(lo), np.asarray(hi)
    if lo.shape != (features,) or hi.shape != (features,):
        raise FusedStructureError(
            f"base bounds must have shape ({features},), got"
            f" {lo.shape}/{hi.shape}"
        )
    if lo.min() != lo.max() or hi.min() != hi.max():
        raise FusedStructureError(
            "fused kernels support per-feature-constant boxes only"
        )
    return ("box", float(lo[0]), float(hi[0]))


def extract_nsf_params(flow):
    """Pull the per-layer (weights, biases, masks) out of an NSF/MAF flow
    module, strictly verifying the supported structure (plain ReLU MADE
    hyper-nets, RQS or affine univariates, DiagNormal base — anything else
    raises :class:`FusedStructureError` rather than extracting a wrong
    program). Returns a list of per-AR-layer dicts plus the static config
    ``{bins, univ, bound, slope}``."""
    from ..flows.autoregressive import MaskedAutoregressiveTransform
    from ..lazy import LazyComposedTransform, UnconditionalTransform
    from ..nn import MaskedLinear
    from ..transforms import SoftclipTransform

    if not isinstance(getattr(flow, "transform", None), LazyComposedTransform):
        raise FusedStructureError(
            "fused kernels require a LazyComposedTransform flow,"
            f" got {type(getattr(flow, 'transform', None)).__name__}"
        )

    layers = []
    cfg = None
    for t in flow.transform.transforms:
        if isinstance(t, UnconditionalTransform):
            # SoftclipTransform interleaves (the SOSPF/NAF-style domain
            # guard, reference: zuko/flows/polynomial.py:73-76)
            if t.f is not SoftclipTransform or t.args:
                raise FusedStructureError(
                    "fused AR kernels support SoftclipTransform interleaves"
                    f" only, got {t.f}"
                )
            layers.append(("softclip", float(t.kwargs.get("bound", 5.0))))
            continue
        if type(t) is not MaskedAutoregressiveTransform:
            raise FusedStructureError(
                "fused AR kernels support MaskedAutoregressiveTransform"
                f" layers only, got {type(t).__name__}"
            )
        kind, K, bound, slope = _univ_config(t.univariate, t.shapes)
        if cfg is None:
            cfg = (kind, K, bound, slope)
        elif cfg != (kind, K, bound, slope):
            raise FusedStructureError(
                f"layers must share a univariate config: {cfg} vs"
                f" {(kind, K, bound, slope)}"
            )
        lins = _extract_mlp_linears(t.hyper, MaskedLinear)
        layers.append({
            "weights": [l.weight for l in lins],
            "biases": [l.bias for l in lins],
            "masks": [l.mask for l in lins],
            "passes": int(t.passes),
        })
    if cfg is None:
        raise FusedStructureError("flow has no transform layers")

    first_ar = next(l for l in layers if isinstance(l, dict))
    features = first_ar["masks"][-1].shape[0] // (
        _univ_size(cfg[0], cfg[1])
    )
    base = _base_config(flow, features, cfg[0])
    return layers, {
        "bins": cfg[1], "univ": cfg[0], "bound": cfg[2], "slope": cfg[3],
        "base": base,
    }


# --------------------------------------------------------- transposed kernel
#
# Lane-aligned layout: the BATCH rides the 128-lane dimension and the (small)
# knot/feature axes ride sublanes. Every elementwise/reduction op is then
# fully lane-parallel across the batch tile, and no tile is narrower than the
# batch — which avoids the narrow-lane Mosaic issues of the row-major kernel
# and the 9/128-lane VPU waste.
#
# Feature-vectorized constraint/spline pipeline: the final hyper layer's rows
# are permuted at extraction time from feature-major [f*T + t] to PARAM-major
# [t*F + f], so ``h[t*F:(t+1)*F]`` is an (F, TB) slab holding parameter ``t``
# of every feature at once. The whole slope-clamp → softmax → cumsum → spline
# pipeline then runs on (F, TB) slabs instead of a per-feature Python loop
# over (1, TB) slices — F× wider VPU ops, F× fewer instructions (the round-1
# roofline lever, PERF.md).


_LN2 = 0.6931471805599453


@jax.custom_jvp
def _log_acc(x):
    """Accurate f32 natural log for strictly-positive normal floats.

    TPU's hardware f32 ``log`` approximation carries ~1e-4 max abs error
    (8e-6..1.4e-5 median; measured on v5e against f64, identical through
    ``jnp.log``/``log2``/``log1p``) — that noise is the accuracy floor of
    every log-density returned from the device. This decomposition beats
    it by ~100x: frexp via int32 bit tricks, mantissa folded into
    [1/sqrt2, sqrt2), then ln(m) = 2 atanh((m-1)/(m+1)) as an odd series
    (|t| <= 0.1716, truncation after t^11 is ~6.6e-10). Pure mul/add/int
    ops — lowers on Mosaic and XLA alike.

    The analytic derivative is attached as a ``custom_jvp``: the int32
    bitcasts otherwise autodiff to a silent ZERO gradient, which killed
    the ladj term of every training gradient through the fused custom-VJP
    backward (caught by the D=64 digits run training to nonsense)."""
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = ((xi >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (xi & 0x007FFFFF) | 0x3F800000, jnp.float32
    )
    big = m > 1.4142135623730951
    m = jnp.where(big, 0.5 * m, m)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    p = 1.0 + t2 * (
        1 / 3 + t2 * (1 / 5 + t2 * (1 / 7 + t2 * (1 / 9 + t2 * (1 / 11))))
    )
    return e * _LN2 + 2.0 * t * p


@_log_acc.defjvp
def _log_acc_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return _log_acc(x), dx / x


def _log_ladj(x):
    """Log for log-det-Jacobian terms: `_log_acc` in f32 (the TPU hardware
    log is the bottleneck there), plain `jnp.log` in the f64 test mode."""
    if x.dtype == jnp.float32:
        return _log_acc(x)
    return jnp.log(x)


@jax.custom_jvp
def _log1p_acc(q):
    """Accurate log1p for q >= 0 (softclip ladjs): the same odd atanh
    series on t = q/(2+q) for small q, `_log_acc(1+q)` once 1+q carries
    enough mantissa (q >= 0.5). Beats the hardware log1p's ~1e-4 floor.
    Analytic derivative attached (see `_log_acc`)."""
    t = q / (2.0 + q)
    t2 = t * t
    p = 1.0 + t2 * (
        1 / 3 + t2 * (1 / 5 + t2 * (1 / 7 + t2 * (1 / 9 + t2 * (1 / 11))))
    )
    return jnp.where(q < 0.5, 2.0 * t * p, _log_acc(1.0 + jnp.maximum(q, 0.5)))


@_log1p_acc.defjvp
def _log1p_acc_jvp(primals, tangents):
    (q,), (dq,) = primals, tangents
    return _log1p_acc(q), dq / (1.0 + q)


def _log1p_ladj(q):
    if q.dtype == jnp.float32:
        return _log1p_acc(q)
    return jnp.log1p(q)


def _softmax_slabs(slabs):
    """Numerically-stable softmax across a list of (F, TB) slabs."""
    m = slabs[0]
    for a in slabs[1:]:
        m = jnp.maximum(m, a)
    es = [jnp.exp(a - m) for a in slabs]
    tot = es[0]
    for e in es[1:]:
        tot = tot + e
    inv = 1.0 / tot
    return [e * inv for e in es]


def _spline_knots_F(h, F, K, bound, slope):
    """h (T*F, TB) param-major -> knot lists: xs/ys (K+1 of (F, TB)),
    ds (K+1 of (F, TB)). Shared by the forward and inverse spline."""
    log_s = math.log(slope)

    ws = [h[t * F : (t + 1) * F, :] for t in range(K)]
    hs = [h[(K + t) * F : (K + t + 1) * F, :] for t in range(K)]
    ds = [h[(2 * K + t) * F : (2 * K + t + 1) * F, :] for t in range(K - 1)]

    ws = [w / (1 + jnp.abs(2 * w / log_s)) for w in ws]
    hs = [v / (1 + jnp.abs(2 * v / log_s)) for v in hs]
    ds = [d / (1 + jnp.abs(d / log_s)) for d in ds]

    ws = _softmax_slabs(ws)
    hs = _softmax_slabs(hs)

    # exact running sums (a triangular MATMUL would run at the MXU's default
    # bfloat16-pass precision and corrupt knots)
    def cum_slabs(slabs):
        out = [slabs[0]]
        for a in slabs[1:]:
            out.append(out[-1] + a)
        return out

    cw = cum_slabs(ws)
    ch = cum_slabs(hs)

    neg = jnp.full_like(cw[0], -bound)
    one = jnp.ones_like(cw[0])
    xs = [neg] + [bound * (2 * c - 1) for c in cw]
    ys = [neg] + [bound * (2 * c - 1) for c in ch]
    dds = [one] + [jnp.exp(d) for d in ds] + [one]
    return xs, ys, dds


def _bin_select_F(value, knots, K):
    """Branchless bin search over K+1 knot slabs: k = sum(knots < v) - 1,
    in/out-of-domain mask, and a gather-free per-bin selector. The per-bin
    equality masks are computed ONCE and shared by every take() — the
    selector runs 6 times per spline (x0/x1/y0/y1/d0/d1)."""
    k = (knots[0] < value).astype(jnp.int32)
    for j in range(1, K + 1):
        k = k + (knots[j] < value).astype(jnp.int32)
    k = k - 1
    mask = (0 <= k) & (k < K)
    k = jnp.where(mask, k, 0)

    eqs = [k == j for j in range(K + 1)]

    def take(slabs, offset=0):
        out = jnp.where(eqs[0], slabs[offset], 0.0)
        for j in range(1, K):
            out = out + jnp.where(eqs[j], slabs[j + offset], 0.0)
        return out

    return mask, take


def _spline_forward_F(x, h, F, K, bound, slope):
    """x (F, TB); h (T*F, TB) param-major raw -> y (F, TB), ladj (F, TB).
    Out-of-domain features pass through identity (reference mask trick,
    zuko/transforms.py:525-532)."""
    xs, ys, dds = _spline_knots_F(h, F, K, bound, slope)
    mask, take = _bin_select_F(x, xs, K)

    x0, x1 = take(xs), take(xs, 1)
    y0, y1 = take(ys), take(ys, 1)
    d0, d1 = take(dds), take(dds, 1)
    s = (y1 - y0) / (x1 - x0)

    z = jnp.where(mask, (x - x0) / (x1 - x0), 0.0)
    z1 = z * (1 - z)
    denom = s + (d0 + d1 - 2 * s) * z1
    y = y0 + (y1 - y0) * (s * z**2 + d0 * z1) / denom
    jac = s**2 * (2 * s * z1 + d0 * (1 - z) ** 2 + d1 * z**2) / denom**2

    return jnp.where(mask, y, x), jnp.where(mask, _log_ladj(jac), 0.0)


def _spline_forward_fused_F(x, h, F, K, bound, slope):
    """`_spline_forward_F` with the searchsorted/bin-select FUSED into the
    constraint pass (the round-2 roofline lever, PERF.md): one running sweep
    over the K bins simultaneously accumulates the knot cumsums, tests bin
    membership against the running knot, and multiply-accumulates the
    selected bin parameters — no materialized (K+1)-slab knot lists, no
    separate k/eq-mask pipeline, and the bin WIDTHS come straight from the
    softmax outputs (dx_j = 2B·w_j) instead of knot differences. Same math
    as `_spline_forward_F` up to summation order (validated against f64
    truth, not bit-equality). Gated by ``ZUKO_TPU_FUSED_BINSEL``."""
    log_s = math.log(slope)

    ws = [h[t * F : (t + 1) * F, :] for t in range(K)]
    hs = [h[(K + t) * F : (K + t + 1) * F, :] for t in range(K)]
    rds = [h[(2 * K + t) * F : (2 * K + t + 1) * F, :] for t in range(K - 1)]

    ws = [w / (1 + jnp.abs(2 * w / log_s)) for w in ws]
    hs = [v / (1 + jnp.abs(2 * v / log_s)) for v in hs]
    rds = [d / (1 + jnp.abs(d / log_s)) for d in rds]

    ws = _softmax_slabs(ws)
    hs = _softmax_slabs(hs)
    one = jnp.ones_like(ws[0])
    dds = [one] + [jnp.exp(d) for d in rds] + [one]

    two_b = 2.0 * bound
    xj = jnp.full_like(ws[0], -bound)
    yj = jnp.full_like(ws[0], -bound)
    zero = jnp.zeros_like(ws[0])
    x0 = zero
    y0 = zero
    dx = one  # pad value keeps the out-of-domain arithmetic finite
    dy = one
    d0 = zero
    d1 = zero
    for j in range(K):
        wj = two_b * ws[j]
        hj = two_b * hs[j]
        xn = xj + wj
        # membership matches `_bin_select_F`'s k = sum(knots < x) - 1 == j
        m = (xj < x) & ~(xn < x)
        x0 = jnp.where(m, xj, x0)
        y0 = jnp.where(m, yj, y0)
        dx = jnp.where(m, wj, dx)
        dy = jnp.where(m, hj, dy)
        d0 = jnp.where(m, dds[j], d0)
        d1 = jnp.where(m, dds[j + 1], d1)
        xj = xn
        yj = yj + hj
    # in-domain iff x lands in some bin: x > -B and x <= x_K
    neg_b = jnp.full_like(x, -bound)
    mask = (neg_b < x) & ~(xj < x)

    s = dy / dx
    z = jnp.where(mask, (x - x0) / dx, 0.0)
    z1 = z * (1 - z)
    denom = s + (d0 + d1 - 2 * s) * z1
    y = y0 + dy * (s * z**2 + d0 * z1) / denom
    jac = s**2 * (2 * s * z1 + d0 * (1 - z) ** 2 + d1 * z**2) / denom**2

    return jnp.where(mask, y, x), jnp.where(mask, _log_ladj(jac), 0.0)


# Default ON since the r50/r55 hardware A/Bs: ~+5% flagship density at
# identical accuracy vs f64 truth (max 1.040e-4 vs 1.059e-4); "0" restores
# the materialized-knot form.
_FUSED_BINSEL = os.environ.get("ZUKO_TPU_FUSED_BINSEL", "1") == "1"


def _tree_reduce_rows(block, k, F, op):
    """Reduce a packed (k*F, TB) block over its k row-groups with a
    pairwise tree of BIG-slab ops: log2(k) applications on half-blocks
    instead of k-1 applications on (F, TB) slabs (the r56 dissection put
    the flagship's remaining headroom in slab-op issue overhead, not
    transcendentals)."""
    while k > 1:
        if k % 2:
            head = op(block[:F, :], block[(k - 1) * F :, :])
            block = jnp.concatenate([head, block[F : (k - 1) * F, :]], axis=0)
            k -= 1
        half = k // 2
        block = op(block[: half * F, :], block[half * F :, :])
        k = half
    return block


def _softmax_block(block, K, F):
    """Numerically-stable softmax over the K row-groups of a packed
    (K*F, TB) block: one exp over the whole block, tree max/sum."""
    m = _tree_reduce_rows(block, K, F, jnp.maximum)        # (F, TB)
    mt = jnp.concatenate([m] * K, axis=0)
    e = jnp.exp(block - mt)
    tot = _tree_reduce_rows(e, K, F, lambda a, b: a + b)
    inv = 1.0 / tot
    return e * jnp.concatenate([inv] * K, axis=0)


def _spline_forward_packed_F(x, h, F, K, bound, slope):
    """`_spline_forward_fused_F` with the constraint pass PACKED: the
    softclip, softmax, and derivative exp run as single chains over the
    whole (K*F, TB) / ((K-1)*F, TB) blocks instead of 23 per-slab chains —
    same math to summation order, ~8x fewer op issues on the constraint
    tier. The running K-bin membership sweep is unchanged."""
    log_s = math.log(slope)
    KF = K * F

    whb = h[: 2 * KF, :]
    whb = whb / (1.0 + jnp.abs(whb * (2.0 / log_s)))
    db = h[2 * KF :, :]
    db = db / (1.0 + jnp.abs(db * (1.0 / log_s)))

    wsb = _softmax_block(whb[:KF, :], K, F)
    hsb = _softmax_block(whb[KF:, :], K, F)
    ddsb = jnp.exp(db)                                     # ((K-1)F, TB)

    one = jnp.ones_like(x)
    two_b = 2.0 * bound
    xj = jnp.full_like(x, -bound)
    yj = jnp.full_like(x, -bound)
    zero = jnp.zeros_like(x)
    x0, y0, d0, d1 = zero, zero, zero, zero
    dx = one  # pad value keeps the out-of-domain arithmetic finite
    dy = one
    for j in range(K):
        wj = two_b * wsb[j * F : (j + 1) * F, :]
        hj = two_b * hsb[j * F : (j + 1) * F, :]
        dj = one if j == 0 else ddsb[(j - 1) * F : j * F, :]
        djn = one if j == K - 1 else ddsb[j * F : (j + 1) * F, :]
        xn = xj + wj
        # membership matches `_bin_select_F`'s k = sum(knots < x) - 1 == j
        m = (xj < x) & ~(xn < x)
        x0 = jnp.where(m, xj, x0)
        y0 = jnp.where(m, yj, y0)
        dx = jnp.where(m, wj, dx)
        dy = jnp.where(m, hj, dy)
        d0 = jnp.where(m, dj, d0)
        d1 = jnp.where(m, djn, d1)
        xj = xn
        yj = yj + hj
    neg_b = jnp.full_like(x, -bound)
    mask = (neg_b < x) & ~(xj < x)

    s = dy / dx
    z = jnp.where(mask, (x - x0) / dx, 0.0)
    z1 = z * (1 - z)
    denom = s + (d0 + d1 - 2 * s) * z1
    y = y0 + dy * (s * z**2 + d0 * z1) / denom
    jac = s**2 * (2 * s * z1 + d0 * (1 - z) ** 2 + d1 * z**2) / denom**2

    return jnp.where(mask, y, x), jnp.where(mask, _log_ladj(jac), 0.0)


# packed constraint tier (r56 lever): routes the binsel spline through
# `_spline_forward_packed_F`. Default ON since the r57 hardware A/B: a
# consistent ~1% on density (85.0M vs 84.1M), sample+logq (22.7 vs 22.3M),
# and the VI step (4.36 vs 4.08M) at the same accuracy vs f64 truth
# (max 1.067e-4 / median 1.505e-5 vs 1.040e-4 / 1.596e-5).
_BINSEL_PACKED = os.environ.get("ZUKO_TPU_BINSEL_PACKED", "1") == "1"


def _spline_inverse_F(y, h, F, K, bound, slope):
    """Analytic quadratic-root spline inverse on (F, TB) slabs
    (reference: zuko/transforms.py:534-548)."""
    xs, ys, dds = _spline_knots_F(h, F, K, bound, slope)
    mask, take = _bin_select_F(y, ys, K)

    x0, x1 = take(xs), take(xs, 1)
    y0, y1 = take(ys), take(ys, 1)
    d0, d1 = take(dds), take(dds, 1)
    s = (y1 - y0) / (x1 - x0)

    y_ = jnp.where(mask, y - y0, 0.0)
    a = (y1 - y0) * (s - d0) + y_ * (d0 + d1 - 2 * s)
    b = (y1 - y0) * d0 - y_ * (d0 + d1 - 2 * s)
    c = -s * y_
    disc = jnp.maximum(b**2 - 4 * a * c, 0.0)
    z = 2 * c / (-b - jnp.sqrt(disc))
    z = jnp.where(mask, z, 0.0)
    x = x0 + z * (x1 - x0)

    return jnp.where(mask, x, y)


def _affine_F(x, h, F, slope, inverse):
    """Feature-vectorized MonotonicAffineTransform (reference:
    zuko/transforms.py:412-446): h (2F, TB) param-major = (shifts, raw
    scales)."""
    log_s = math.log(slope)
    shift = h[:F, :]
    raw = h[F : 2 * F, :]
    log_scale = raw / (1 + jnp.abs(raw / log_s))
    scale = jnp.exp(log_scale)
    if inverse:
        return (x - shift) / scale, -log_scale
    return x * scale + shift, log_scale


def _circular_wrap(x, B):
    """(x mod 2B) - B without jnp.remainder (Mosaic-safe floor form) —
    the CircularShiftTransform, ladj 0 (reference: zuko/transforms.py:319-351).
    Also its own inverse."""
    return x - 2 * B * jnp.floor(x / (2 * B)) - B


def _sosp_forward_F(x, h, F, PL, bound, slope):
    """Feature-vectorized SOSP univariate (SOSPF): the integrand is the mean
    of P squared degree-L polynomials plus a minimum slope, integrated
    exactly by (L+1)-point Gauss-Legendre; ladj = log g(x); the learned
    shift is added afterwards (reference: zuko/transforms.py:927-963 and
    zuko/flows/polynomial.py:23-29). h (T*F, TB) param-major with
    T = P*(L+1) + 1: coefficient (k, l) at slab k*(L+1)+l, the shift last."""
    P, L1 = PL
    aa = [
        [h[(k * L1 + l) * F : (k * L1 + l + 1) * F, :] for l in range(L1)]
        for k in range(P)
    ]
    const = h[P * L1 * F : (P * L1 + 1) * F, :]

    def g(v):
        u = v / bound
        acc = None
        for k in range(P):
            p = aa[k][L1 - 1]
            for l in range(L1 - 2, -1, -1):
                p = p * u + aa[k][l]
            p = 1.0 + p
            acc = p * p if acc is None else acc + p * p
        return acc / P + slope

    # (L+1)-point quadrature is exact for the degree-2L integrand
    # (reference: zuko/transforms.py:951-963 via utils.py:247-363)
    nodes, weights = np.polynomial.legendre.leggauss(L1)
    quad = None
    for t, w in zip(nodes, weights):
        gi = g(x * (0.5 * (float(t) + 1.0)))
        quad = float(w) * gi if quad is None else quad + float(w) * gi
    y = 0.5 * x * quad + const
    return y, _log_ladj(g(x))


def _bernstein_forward_F(x, h, F, M, bound):
    """Feature-vectorized bounds-pinned Bernstein univariate (BPF):
    softmax-+-cumsum coefficient constraint with identity-like pinned ends,
    Beta-pdf basis with static log-normalizers, linear extrapolation outside
    the eps-bounds, analytic derivative for the ladj (reference:
    zuko/transforms.py:640-831). h (M*F, TB) param-major raw coefficients."""
    B, eps = bound, 1e-6
    raws = [h[t * F : (t + 1) * F, :] for t in range(M)]
    d_bound = (2 * B) / (M + 4)
    sm = _softmax_slabs(raws)
    scale = 2 * B - 4 * d_bound

    # theta = cumsum([-B, d, d, softmax*scale..., d, d]): the three leading
    # and two trailing coefficients are compile-time constants
    # (reference constraint: zuko/transforms.py:797-818)
    theta = [-B, -B + d_bound, -B + 2 * d_bound]
    run = None
    for s in sm:
        run = s if run is None else run + s
        theta.append((-B + 2 * d_bound) + scale * run)
    theta.append(B - d_bound)
    theta.append(B)
    N = M + 5
    order = N - 1

    u = (x + B) / (2 * B)
    lower = u <= eps
    upper = u >= 1 - eps
    extrap = lower | upper
    u_safe = jnp.where(extrap, 0.5, u)

    def poly(theta_list):
        # De Casteljau: the Beta-PDF mean basis (reference:
        # zuko/transforms.py:729-740) equals the Bézier sum over
        # ``theta_list``, so repeated lerps evaluate it with no exp/log —
        # the log-space basis cost ~3e-2 in f32 tail log-densities on v5e
        # (both the kernel and the XLA path, vs f64 ground truth); lerps
        # hold ~1e-5. Leading/trailing constants fold in as scalars.
        cur = list(theta_list)
        while len(cur) > 1:
            cur = [a + u_safe * (b - a) for a, b in zip(cur[:-1], cur[1:])]
        return cur[0]

    y = poly(theta)
    # derivative in u: mean-form with dtheta_i = order * (theta_{i+1}-theta_i)
    dtheta = [
        order * (theta[i + 1] - theta[i]) for i in range(order)
    ]
    dy = poly(dtheta)

    # linear extrapolation with fixed offsets (-B, B) and slopes (2B, 2B)
    # => identity-like bounds, ladj 0 outside (reference:
    # zuko/transforms.py:820-831)
    y = jnp.where(lower, 2 * B * (u - eps) - B, y)
    y = jnp.where(upper, 2 * B * (u - 1 + eps) + B, y)
    ladj = jnp.where(extrap, 0.0, _log_ladj(dy) - math.log(2 * B))
    return y, ladj


def _univ_forward_F(x, h, F, K, bound, slope, univ):
    """(F, TB) batch of univariate forwards + ladj."""
    if univ == "rqs":
        if _FUSED_BINSEL:
            fwd = (
                _spline_forward_packed_F if _BINSEL_PACKED
                else _spline_forward_fused_F
            )
            return fwd(x, h, F, K, bound, slope)
        return _spline_forward_F(x, h, F, K, bound, slope)
    if univ == "crqs":
        # spline(shift(x)) (reference: zuko/flows/spline.py:65-72)
        if _FUSED_BINSEL:
            fwd = (
                _spline_forward_packed_F if _BINSEL_PACKED
                else _spline_forward_fused_F
            )
            return fwd(_circular_wrap(x, bound), h, F, K, bound, slope)
        return _spline_forward_F(_circular_wrap(x, bound), h, F, K, bound, slope)
    if univ == "sosp":
        return _sosp_forward_F(x, h, F, K, bound, slope)
    if univ == "bernstein":
        return _bernstein_forward_F(x, h, F, K, bound)
    return _affine_F(x, h, F, slope, inverse=False)


def _poly_inverse_F(y, h, F, K, bound, slope, univ, x0=None):
    """Iterative inverse for the polynomial univariates (SOSP/Bernstein):
    coarse bisection on the exact forward, then Newton polish whose
    derivative is FREE — the forward already returns ``log f'`` (the
    NAF-solver recipe; reference solves per element with
    ``newton_bisection``, zuko_tpu/transforms.py MonotonicTransform).
    Out-of-range targets peg at ±bound, the reference's own bracket
    behavior.

    ``x0`` warm-starts the bracket around a previous sweep's root (the r5
    NAF-solver trick, see naf_fused._ar_inverse_sweeps_T): 2 validity
    evaluations + a short local bisection, with per-row fallback to the
    full bracket where the root moved."""

    def fwd(x):
        return _univ_forward_F(x, h, F, K, bound, slope, univ)

    if x0 is None:
        lo = jnp.full_like(y, -bound)
        hi = jnp.full_like(y, bound)
        n_iters = int(math.ceil(math.log2(2.0 * bound / 1e-3)))
    else:
        r = _POLY_WARM_R
        lo0 = jnp.clip(x0 - r, -bound, bound)
        hi0 = jnp.clip(x0 + r, -bound, bound)
        flo, _ = fwd(lo0)
        fhi, _ = fwd(hi0)
        ok = (flo < y) & (y < fhi)
        lo = jnp.where(ok, lo0, jnp.full_like(y, -bound))
        hi = jnp.where(ok, hi0, jnp.full_like(y, bound))
        n_iters = int(math.ceil(math.log2(2.0 * r / 1e-3)))

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        fm, _ = fwd(mid)
        go_right = fm < y
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))

    def newton(_, xn):
        fv, ladj = fwd(xn)
        step = (fv - y) * jnp.exp(-ladj)
        return jnp.clip(xn - step, -bound, bound)

    x = jax.lax.fori_loop(0, 4, newton, 0.5 * (lo + hi))

    if univ == "bernstein":
        # the Bernstein transform linearly EXTRAPOLATES outside [-B, B]
        # with matching offset/slope, and the reference inverts that
        # region in closed form (zuko/transforms.py:640-777) — match it
        # instead of pegging at the bracket edge
        ones = jnp.ones_like(y)
        f_hi, ladj_hi = fwd(bound * ones)
        f_lo, ladj_lo = fwd(-bound * ones)
        x = jnp.where(y > f_hi, bound + (y - f_hi) * jnp.exp(-ladj_hi), x)
        x = jnp.where(y < f_lo, -bound + (y - f_lo) * jnp.exp(-ladj_lo), x)
    return x


def _univ_inverse_F(y, h, F, K, bound, slope, univ, x0=None):
    if univ == "rqs":
        return _spline_inverse_F(y, h, F, K, bound, slope)
    if univ == "crqs":
        return _circular_wrap(_spline_inverse_F(y, h, F, K, bound, slope), bound)
    if univ in ("sosp", "bernstein"):
        return _poly_inverse_F(y, h, F, K, bound, slope, univ, x0=x0)
    return _affine_F(y, h, F, slope, inverse=True)[0]


def _dot_split3(A, x, barrier=False):
    """f32-faithful matmul in 3 explicit bf16 MXU passes: split both
    operands into bf16 hi + bf16 lo residual and drop only the lo*lo term
    (~2^-16 relative). Mosaic rejects ``Precision.HIGH`` (its 3-pass
    equivalent), so the split is spelled out; outside f32 it falls back to
    an exact dot (the f64 test mode must stay f64).

    ``barrier=True`` pins the hi parts with ``optimization_barrier`` —
    REQUIRED in XLA-compiled contexts (the custom-VJP backward, the
    non-Pallas fallback): XLA's allow-excess-precision mode otherwise
    elides the f32->bf16->f32 round-trip and zeroes the residuals (the
    r48 bug). Mosaic does not lower the barrier (and does not elide), so
    in-kernel callers keep barrier=False."""
    if A.dtype != jnp.float32 or x.dtype != jnp.float32:
        return jnp.dot(
            A, x,
            preferred_element_type=jnp.promote_types(A.dtype, x.dtype),
            precision=jax.lax.Precision.HIGHEST,
        )
    Ah = A.astype(jnp.bfloat16)
    xh = x.astype(jnp.bfloat16)
    if barrier:
        Ah = jax.lax.optimization_barrier(Ah)
        xh = jax.lax.optimization_barrier(xh)
    Al = (A - Ah.astype(jnp.float32)).astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    return (d(Ah, xl) + d(Al, xh)) + d(Ah, xh)


# Density-path hyper matmul mode (A/B: tools/tpu_validate_r8/r31.py):
# None = 1 bf16 pass, "split3" = 3 passes, Precision.HIGHEST = 6 passes.
# "split3" is the accuracy default (~1e-4 max vs f64 truth, ~100x better
# than 1-pass) costing ~4% at the flagship 64-wide conditioner but ~42%
# at 512-wide (MXU passes dominate there: 18.5M vs 32.2M evals/s at
# 9.5e-4 median error) — ZUKO_TPU_DENSITY_PREC=fast opts wide models
# into the 1-pass speed frontier.
_DENSITY_HYPER_PREC = {
    "fast": None,
    "split3": "split3",
    "exact": jax.lax.Precision.HIGHEST,
}[os.environ.get("ZUKO_TPU_DENSITY_PREC", "split3")]

# Kernel-side weight preprocessing (tools/tpu_validate_r10.py A/B). The
# grid re-runs the kernel body once per batch tile, so any weight-only
# work inside it (the MADE mask multiply, the bf16 hi/lo split of
# `_dot_split3`) repeats grid-many times; both are hoisted into the
# wrapper and the preprocessed arrays passed as kernel params instead.
#   _PRESPLIT_DENSITY: "off" = in-kernel split3, "pair" = pre-split
#     (Wh, Wl) bf16 pairs + 3 in-kernel dots, "cat" = one pre-concatenated
#     (out, 3*in) bf16 operand + a single wide MXU pass.
#   _PREMASK_SAMPLE: pre-apply the mask to sampling weights (the solver
#     sweeps otherwise redo M*W every fixed-point iterate).
_PRESPLIT_DENSITY = "cat"
_PREMASK_SAMPLE = True

# Warm-started later sweeps for the polynomial (SOSP/Bernstein) iterative
# inverse (r5, mirrors naf_fused._WARM_SWEEPS — see _poly_inverse_F):
# 2 validity evals + 7 local-bisect evals replace the 13-14 full-bracket
# evals in sweeps >= 1. Hardware A/B (tools/tpu_validate_r5_poly_warm.py,
# b=1M, D=5/T=3): SOSPF 4.80 vs 3.67M samples/s (+31%), BPF 2.74 vs 1.88
# (+46%), p99/max draw deviation <= 1.5e-6/4.8e-6, self-consistency tails
# unchanged. Opt out with ZUKO_TPU_POLY_WARM=0 (trace time).
_POLY_WARM = os.environ.get("ZUKO_TPU_POLY_WARM", "1") != "0"
_POLY_WARM_R = 0.0625

# Batch-tile grid semantics. Hardware A/B (tools/tpu_validate_r13.py):
# "parallel" (declare grid iterations independent) is ~17% SLOWER than the
# default sequential semantics on this grid — with constant-index weight
# blocks Mosaic already keeps them resident, and the parallel path loses
# the revolving-buffer pipelining of the batch tiles. Keep None.
_GRID_SEMANTICS = None


def _compiler_params():
    if _GRID_SEMANTICS is None:
        return None
    return pltpu.CompilerParams(dimension_semantics=(_GRID_SEMANTICS,))

_LAYER_STEP = {"ar": 3, "ars": 3, "arc": 2, "arm": 2}

# Live-set budget for the batch tile, in f32 elements: the kernel's
# per-tile intermediates scale with (T*F + hidden) * tb (the hyper
# output slab h dominates, plus hidden activations and the bf16 split
# copies). The flagship (T*F=138, h=64) and MINIBOONE/digits-shaped
# (T*F<=1472, h=64) configs are validated at tb=1024; a D=64 hidden-256
# config ((1472+768)*1024 = 2.3M) killed the compile service — shrink
# the tile until the estimate fits (tools/tpu_validate_r38/r39.py).
_VMEM_TILE_BUDGET = 2_000_000


def _density_tb(flat_params, layout):
    rows_last, rows_hidden = 0, 0
    idx = 0
    for entry in layout:
        if entry[0] != "ar":
            continue
        _, n_lin, _ = entry
        for i in range(n_lin):
            W = flat_params[idx + 3 * i]
            if i == n_lin - 1:
                rows_last = max(rows_last, W.shape[0])
            else:
                rows_hidden = max(rows_hidden, W.shape[0])
        idx += 3 * n_lin
    live = rows_last + 3 * rows_hidden
    tb = _TB
    while tb > 128 and live * tb > _VMEM_TILE_BUDGET:
        tb //= 2
    return tb


def _pad_features(flat_params, layout, F, C, Fp, T):
    """Insert ``Fp - F`` inert pad features so every (F, TB) slab the
    kernel slices sits at a sublane-aligned (multiple-of-8) row offset.

    Mosaic MIScompiles the strided slab slices ``h[t*F:(t+1)*F]`` for
    unaligned F > 8 on hardware (r16/r17: D=43 fused density off by ~50
    absolute while interpret mode matches the fallback to 3e-5) — so
    unaligned feature counts are padded up and the pad rows masked out of
    every reduction (`realF` threading). Pad columns of the first linear
    (and its mask) are zero, so pad-feature values never contaminate real
    features; pad rows of the last linear are zero, so pad-feature spline
    parameters are exactly the bias-free neutral ones.

    ``T`` is the per-feature univariate parameter count (`_univ_size`):
    the last linear's rows are param-major ``[t*F + f]`` and re-spread to
    ``[t*Fp + f]``."""
    pad = Fp - F
    out_params, out_layout = [], []
    idx = 0
    for entry in layout:
        if entry[0] != "ar":
            out_layout.append(entry)
            continue
        _, n_lin, passes = entry
        out_layout.append(("ar", n_lin, passes))
        for i in range(n_lin):
            W, b, M = flat_params[idx + 3 * i : idx + 3 * i + 3]
            if i == 0:  # input columns: [x (F) | context (C)] -> insert pad
                W = jnp.concatenate(
                    [W[:, :F], jnp.zeros((W.shape[0], pad), W.dtype),
                     W[:, F:]], axis=1,
                )
                M = jnp.concatenate(
                    [M[:, :F], jnp.zeros((M.shape[0], pad), M.dtype),
                     M[:, F:]], axis=1,
                )
            if i == n_lin - 1:  # output rows: [t*F + f] -> [t*Fp + f]
                Hin = W.shape[1]
                W = jnp.pad(
                    W.reshape(T, F, Hin), ((0, 0), (0, pad), (0, 0))
                ).reshape(T * Fp, Hin)
                M = jnp.pad(
                    M.reshape(T, F, Hin), ((0, 0), (0, pad), (0, 0))
                ).reshape(T * Fp, Hin)
                b = jnp.pad(b.reshape(T, F), ((0, 0), (0, pad))).reshape(-1)
            out_params += [W, b, M]
        idx += 3 * n_lin
    return out_params, tuple(out_layout)


def _pad_feature_cols(xf, F, Fp):
    """(m, F + C) -> (m, Fp + C): zero pad columns between x and context."""
    pad = Fp - F
    return jnp.concatenate(
        [xf[:, :F], jnp.zeros((xf.shape[0], pad), xf.dtype), xf[:, F:]],
        axis=1,
    )


# Feature padding (sublane-align F, `_pad_features`) — OFF: the r16
# "unaligned-F miscompile" turned out to be the COMPARATOR (the regular
# XLA path is what miscompiles at (16384, 43) — r19/r21 vs CPU truth:
# XLA off by ~21 nats median, fused kernel at 1.5e-4 padded OR unpadded,
# unpadded 4.6% faster). The padding machinery is kept, tested
# (tests/test_ops.py::test_feature_padding_math), and flippable here
# should a real alignment issue ever surface.
_FEATURE_PAD = False


def _needs_feature_pad(F):
    return _FEATURE_PAD and F > 8 and F % 8 != 0


def _presplit_params(flat_params, layout, mode):
    """Rewrite AR-layer (W, b, M) triples for the kernel: pre-apply the
    mask and (for the density split3 modes) pre-split the weights into
    bf16 hi/lo so the kernel never touches weight-only math. Returns
    (kernel_params, kernel_layout); f64/CPU fallback and the custom-VJP
    backward keep the original ("ar", W, b, M) form."""
    tag = {"mask": "arm", "pair": "ars", "cat": "arc"}[mode]
    kparams, klayout = [], []
    idx = 0
    for entry in layout:
        if entry[0] != "ar":
            klayout.append(entry)
            continue
        _, n_lin, passes = entry
        klayout.append((tag, n_lin, passes))
        for i in range(n_lin):
            W, b, M = flat_params[idx + 3 * i : idx + 3 * i + 3]
            Wm = M * W
            if tag == "arm":
                kparams += [Wm, b]
                continue
            Wh = Wm.astype(jnp.bfloat16)
            # barrier: XLA's --xla_allow_excess_precision (set on this
            # TPU stack) may ELIDE the f32->bf16->f32 round-trip when the
            # params are runtime jit arguments, making Wl == 0 and
            # silently degrading split3 to 1-pass accuracy (~2e-3 median
            # — caught by the serving path's args-form deviating 70x from
            # the closure form vs CPU truth, tools/tpu_validate_r48.py).
            Wh = jax.lax.optimization_barrier(Wh)
            Wl = (Wm - Wh.astype(Wm.dtype)).astype(jnp.bfloat16)
            if tag == "ars":
                kparams += [Wh, Wl, b]
            else:  # one (out, 3*in) operand: [Wh|Wh|Wl] @ [xh;xl;xh]
                kparams += [jnp.concatenate([Wh, Wh, Wl], axis=1), b]
        idx += 3 * n_lin
    return kparams, tuple(klayout)


def _hyper_pre_T(xT, cT, ps, tag, precision=None):
    """`_hyper_T` over preprocessed weights (see `_presplit_params`).
    ``precision="split3"`` upgrades the pre-masked ("arm") single-pass form
    to 3 explicit bf16 passes — used for the one final ladj evaluation in
    the sampler (solver sweeps stay single-pass)."""
    h = xT if cT is None else jnp.concatenate([xT, cT], axis=0)
    step = _LAYER_STEP[tag]
    n = len(ps) // step
    for i in range(n):
        if tag == "arm" and precision == "split3":
            W, b = ps[2 * i], ps[2 * i + 1]
            h = _dot_split3(W, h) + b[:, None]
        elif tag == "arm":  # pre-masked; single bf16 MXU pass unless a
            # lax.Precision is requested (honor it — silently downgrading
            # an "exact" request to 1-pass is the z-mismatch hazard)
            W, b = ps[2 * i], ps[2 * i + 1]
            h = jnp.dot(W, h, preferred_element_type=jnp.float32,
                        precision=precision) + b[:, None]
        elif tag == "ars":  # pre-split, 3 passes (= `_dot_split3`)
            Wh, Wl, b = ps[3 * i], ps[3 * i + 1], ps[3 * i + 2]
            hh = h.astype(jnp.bfloat16)
            hl = (h - hh.astype(jnp.float32)).astype(jnp.bfloat16)

            def d(a, v):
                return jnp.dot(a, v, preferred_element_type=jnp.float32)

            h = (d(Wh, hl) + d(Wl, hh)) + d(Wh, hh) + b[:, None]
        else:  # "arc": the 3 passes as one wide contraction
            Wc, b = ps[2 * i], ps[2 * i + 1]
            hh = h.astype(jnp.bfloat16)
            hl = (h - hh.astype(jnp.float32)).astype(jnp.bfloat16)
            hc = jnp.concatenate([hh, hl, hh], axis=0)
            h = jnp.dot(Wc, hc, preferred_element_type=jnp.float32) + b[:, None]
        if i < n - 1:
            h = jnp.maximum(h, 0.0)
    return h


def _hyper_T(xT, cT, ps, precision=None, barrier=False):
    """Masked hyper-MLP in transposed layout: concat(x, c) -> phi (T*F, TB).
    (reference conditioning: zuko/flows/autoregressive.py:207-215).

    ``precision`` controls the MXU pass structure: None = single bfloat16
    pass (fast, ~1e-2 relative on the outputs), the string ``"split3"`` =
    3 explicit bf16 passes (~2^-16, see `_dot_split3`), or a
    ``jax.lax.Precision`` (HIGHEST = 6 passes, f32-exact)."""
    h = xT if cT is None else jnp.concatenate([xT, cT], axis=0)
    n = len(ps) // 3
    for i in range(n):
        W, b, M = ps[3 * i], ps[3 * i + 1], ps[3 * i + 2]
        if precision == "split3":
            h = _dot_split3(M * W, h, barrier=barrier) + b[:, None]
            if i < n - 1:
                h = jnp.maximum(h, 0.0)
            continue
        # promote with the activations: f32 MXU accumulation on TPU, full
        # f64 in the x64 test mode (a hard f32 preference would silently
        # downcast the f64 path)
        h = jnp.dot(
            M * W, h,
            preferred_element_type=jnp.promote_types(W.dtype, h.dtype),
            precision=precision,
        ) + b[:, None]
        if i < n - 1:
            h = jnp.maximum(h, 0.0)
    return h


def _split_layers(flat_params, layout):
    """layout entries: ``(tag, n_linear, passes)`` with tag in
    ``_LAYER_STEP`` (see `_presplit_params`) or ``("softclip", bound)``
    -> [(tag, params, passes) | ("softclip", bound), ...]"""
    per_layer = []
    idx = 0
    for entry in layout:
        if entry[0] == "softclip":
            per_layer.append(entry)
            continue
        tag, Ws_n, passes = entry
        step = _LAYER_STEP[tag]
        per_layer.append((tag, flat_params[idx : idx + step * Ws_n], passes))
        idx += step * Ws_n
    return per_layer


def _softclip_forward_F(x, B):
    """SoftclipTransform forward + ladj on (F, TB) slabs:
    y = x / (1 + |x/B|), ladj = -2 log1p(|x/B|)
    (reference: zuko/transforms.py:286-316)."""
    q = jnp.abs(x / B)
    return x / (1.0 + q), -2.0 * _log1p_ladj(q)


def _row_mask(F, realF, dtype=jnp.float32):
    """(F, 1) bool mask of the real (non-pad) feature rows, or None."""
    if realF is None or realF == F:
        return None
    return jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0) < realF


def _base_log_prob_T(zT, F, base, realF=None):
    """Base log-density on a (F, TB) tile: standard normal or constant box
    (NCSF — Uniform gives -inf outside support, distributions.py Uniform).
    With ``realF`` (feature padding, `_pad_features`) the pad rows are
    excluded from the reduction and the constants use the real count."""
    mask = _row_mask(F, realF)
    n = F if realF is None else realF
    if base[0] == "normal":
        sq = zT**2
        if mask is not None:
            sq = jnp.where(mask, sq, 0.0)
        return -0.5 * jnp.sum(sq, axis=0, keepdims=True) \
            - 0.5 * n * math.log(2 * math.pi)
    _, lo, hi = base
    inside = (zT >= lo) & (zT <= hi)
    if mask is not None:
        inside = inside | ~mask  # pad rows count as inside
    all_inside = jnp.sum(inside.astype(zT.dtype), axis=0, keepdims=True) >= F
    lp = jnp.full_like(zT[:1, :], -n * math.log(hi - lo))
    return jnp.where(all_inside, lp, -jnp.inf)


def _full_math_T(xT, flat_params, layout, F, K, bound, slope, cT=None,
                 univ="rqs", base=("normal",), realF=None, barrier=False,
                 raw=False):
    """Transposed whole-flow math: xT (F, TB) -> log_prob (1, TB).

    ``raw=True`` (the forward-APPLY mode) instead returns
    ``(yT (F, TB), sum_ladj (1, TB))`` — the transformed points and the
    bare forward log-det, no base term: the inverted-flow sampling
    ingredient (sample' = T(z'), log q' = base(z') - sum_ladj)."""
    # Density hyper matmuls run 3-pass bf16 (`_dot_split3`): the single
    # bf16 pass costs ~2e-3 median on the returned log-densities (measured
    # on v5e vs f64 truth — the rounding rides through the constraint
    # pipeline into the knots/coefficients), while the kernel is VPU-bound
    # so extra MXU passes are nearly free. Polynomial families keep the
    # f32-exact 6-pass mode: their ladj = log of a squared polynomial of h
    # amplifies input rounding hardest.
    precision = (
        jax.lax.Precision.HIGHEST if univ in ("sosp", "bernstein")
        else _DENSITY_HYPER_PREC
    )
    acc = None
    for entry in _split_layers(flat_params, layout):
        if entry[0] == "softclip":
            xT, ladj = _softclip_forward_F(xT, entry[1])
        else:
            tag, ps, _ = entry
            if tag == "ar":
                h = _hyper_T(xT, cT, ps, precision=precision,
                             barrier=barrier)
            else:
                h = _hyper_pre_T(xT, cT, ps, tag)
            xT, ladj = _univ_forward_F(xT, h, F, K, bound, slope, univ)
        acc = ladj if acc is None else acc + ladj

    mask = _row_mask(F, realF)
    n = F if realF is None else realF
    if raw:
        if mask is not None:  # where, not multiply: pad ladjs may be ±inf
            acc = jnp.where(mask, acc, 0.0)
        return xT, jnp.sum(acc, axis=0, keepdims=True)
    if base[0] == "normal":
        # one fused reduction over features: Σ ladj - x²/2, then the constant
        term = acc - 0.5 * xT**2
        if mask is not None:  # where, not multiply: pad ladjs may be ±inf
            term = jnp.where(mask, term, 0.0)
        return jnp.sum(term, axis=0, keepdims=True) \
            - 0.5 * n * math.log(2 * math.pi)
    if mask is not None:
        acc = jnp.where(mask, acc, 0.0)
    return jnp.sum(acc, axis=0, keepdims=True) \
        + _base_log_prob_T(xT, F, base, realF=realF)


def _kernel_T(*refs, layout, F, C, K, bound, slope, n_params, univ, base,
              realF=None):
    x_ref = refs[0]
    param_refs = refs[1 : 1 + n_params]
    out_ref = refs[1 + n_params]

    xT = x_ref[:F, :]
    cT = x_ref[F : F + C, :] if C else None
    flat = [r[:] for r in param_refs]
    out_ref[:, :] = _full_math_T(
        xT, flat, layout, F, K, bound, slope, cT, univ, base, realF=realF
    )


# ----------------------------------------------------------- fused sampling


def _univ_size(univ, K):
    if univ in ("rqs", "crqs"):
        return 3 * K - 1
    if univ == "sosp":
        return K[0] * K[1] + 1  # (polynomials, degree+1) coeffs + shift
    if univ == "bernstein":
        return K  # raw theta coefficients
    return 2  # affine: shift + raw log-scale


def _sample_math_T(zT, flat_params, layout, F, K, bound, slope, cT=None,
                   want_log_prob=False, univ="rqs", base=("normal",),
                   realF=None):
    """Transposed AR inversion of the whole flow: zT (F, TB) base draws ->
    samples (F, TB). Each layer runs `F` fixed-point sweeps (exact by
    triangularity — reference: zuko/transforms.py:994-1000); weights stay in
    VMEM across sweeps. With ``want_log_prob`` also returns
    ``log q(x) = base.log_prob(z) + sum ladj_fwd`` (1, TB) — the fused
    reverse-KL quantity (reference: zuko/distributions.py:129-138)."""
    per_layer = _split_layers(flat_params, layout)
    mask = _row_mask(F, realF)

    def ladj_sum(ladj):
        if mask is not None:  # where, not multiply: pad ladjs may be ±inf
            ladj = jnp.where(mask, ladj, 0.0)
        return jnp.sum(ladj, axis=0, keepdims=True)

    if want_log_prob:
        acc = (
            jnp.zeros((1, zT.shape[1]), zT.dtype)
            if want_log_prob == "raw"
            else _base_log_prob_T(zT, F, base, realF=realF)
        )

    y = zT
    for entry in reversed(per_layer):
        if entry[0] == "softclip":
            B = entry[1]
            # closed-form softclip inverse (reference: transforms.py:286-316)
            x = y / (1.0 - jnp.abs(y / B))
            if want_log_prob:
                _, ladj = _softclip_forward_F(x, B)
                acc = acc + ladj_sum(ladj)
            y = x
            continue
        tag, ps, passes = entry
        # Reverse-KL precision rule (hardware r10/r11): with
        # ``want_log_prob`` the WHOLE solve runs at the density precision
        # (split3). Upgrading only the final ladj evaluation is not enough —
        # 1-pass sweeps return the inverse of the *rounded* transform, and
        # the base-log-prob term then disagrees with the density kernel by
        # ~1e-3 median (z-mismatch x |z|). Plain sampling keeps the 1-pass
        # sweeps: the rounding only perturbs draws statistically.
        # Polynomial univariates always solve at HIGHEST — their ladj is
        # the log of a squared polynomial of h (the density-path rule).
        if univ in ("sosp", "bernstein"):
            prec = jax.lax.Precision.HIGHEST
        else:
            prec = _DENSITY_HYPER_PREC if want_log_prob else None
        if tag == "ar":
            hyper = functools.partial(_hyper_T, precision=prec)
        else:
            hyper = functools.partial(_hyper_pre_T, tag=tag, precision=prec)
        # `passes` fixed-point sweeps suffice by triangularity (coupling-style
        # layers declare passes=2; fully autoregressive layers passes=F)
        def sweep(_, xv):
            h = hyper(xv, cT, ps)
            return _univ_inverse_F(y, h, F, K, bound, slope, univ)

        def warm_sweep(_, xv):
            # sweeps >= 1 bracket around the previous root (r5, see
            # _poly_inverse_F); only the polynomial univs have an
            # iterative inverse to warm-start
            h = hyper(xv, cT, ps)
            return _univ_inverse_F(y, h, F, K, bound, slope, univ, x0=xv)

        n_sweeps = min(passes, F)
        warm = (
            _POLY_WARM and n_sweeps > 1 and univ in ("sosp", "bernstein")
        )
        if n_sweeps > 6:
            # roll with fori_loop: a Python unroll at F=43 produces a
            # multi-MB Mosaic program (the CLAUDE.md program-size hazard)
            if warm:
                x = sweep(0, jnp.zeros_like(y))
                x = jax.lax.fori_loop(1, n_sweeps, warm_sweep, x)
            else:
                x = jax.lax.fori_loop(0, n_sweeps, sweep, jnp.zeros_like(y))
        else:
            x = sweep(0, jnp.zeros_like(y))
            for _ in range(n_sweeps - 1):
                x = warm_sweep(0, x) if warm else sweep(0, x)
        if want_log_prob:
            h = hyper(x, cT, ps)
            _, ladj = _univ_forward_F(x, h, F, K, bound, slope, univ)
            acc = acc + ladj_sum(ladj)
        y = x

    if want_log_prob:
        return y, acc
    return y


def _sample_kernel_T(*refs, layout, F, C, K, bound, slope, n_params,
                     want_log_prob, univ, base, realF=None):
    z_ref = refs[0]
    param_refs = refs[1 : 1 + n_params]

    zT = z_ref[:F, :]
    cT = z_ref[F : F + C, :] if C else None
    flat = [r[:] for r in param_refs]
    if want_log_prob:
        out_ref, lp_ref = refs[1 + n_params], refs[2 + n_params]
        x, lp = _sample_math_T(
            zT, flat, layout, F, K, bound, slope, cT,
            want_log_prob=want_log_prob, univ=univ, base=base, realF=realF,
        )
        out_ref[:F, :] = x
        lp_ref[:, :] = lp
    else:
        out_ref = refs[1 + n_params]
        out_ref[:F, :] = _sample_math_T(
            zT, flat, layout, F, K, bound, slope, cT, univ=univ, base=base,
            realF=realF,
        )


def _param_major_perm(out_rows, T):
    """Permutation taking the final hyper layer's rows from feature-major
    [f*T + t] to param-major [t*F + f], so the kernel can slice (F, TB)
    parameter slabs (see the feature-vectorized pipeline note above)."""
    F = out_rows // T
    return np.arange(out_rows).reshape(F, T).T.ravel()


def _flatten_flow(flow):
    layers, cfg = extract_nsf_params(flow)
    T = _univ_size(cfg["univ"], cfg["bins"])
    flat_params, layout = [], []
    for layer in layers:
        if not isinstance(layer, dict):
            layout.append(layer)  # ("softclip", bound)
            continue
        layout.append(("ar", len(layer["weights"]), layer["passes"]))
        ws, bs, ms = layer["weights"], layer["biases"], layer["masks"]
        perm = _param_major_perm(ws[-1].shape[0], T)
        ws = ws[:-1] + [ws[-1][perm]]
        bs = bs[:-1] + [bs[-1][perm]]
        ms = ms[:-1] + [ms[-1][perm]]
        for W, b, M in zip(ws, bs, ms):
            flat_params += [W, b, M]
    return flat_params, tuple(layout), cfg


def _use_pallas_fused(dtype):
    import os

    return (
        os.environ.get("ZUKO_TPU_FUSED_NSF", "1") == "1"
        and pltpu is not None
        and dtype == jnp.float32
        and jax.default_backend() not in ("cpu", "gpu")
    )


def _prep_sample(flow, key, sample_shape, c=None):
    """Shared sampling preamble: extract/flatten the flow, draw base samples
    matching the base's dtype, and build the flat ``(n, F+C)`` input. Returns
    ``(flat_params, layout, statics, z_shape, zc, F, C, dtype)`` where
    ``statics = (K, univ, bound, slope, base)`` are hashable (custom-vjp
    nondiff args)."""
    flat_params, layout, cfg = _flatten_flow(flow)
    K, univ = cfg["bins"], cfg["univ"]
    bound, slope = float(cfg["bound"]), float(cfg["slope"])
    base = cfg["base"]
    F = flat_params[0].shape[1]
    if c is not None:
        c = jnp.asarray(c)
        F -= c.shape[-1]

    try:  # match the base distribution's dtype so draws equal flow.sample's
        dtype = jnp.asarray(flow.base.args[0]).dtype
    except (AttributeError, IndexError):
        dtype = flat_params[0].dtype
    # a batched context (*, C) contributes its batch dims AFTER the draw
    # shape, matching the XLA path's `sample_shape + batch_shape + event`
    cbatch = tuple(c.shape[:-1]) if c is not None else ()
    shape = tuple(sample_shape) + cbatch + (F,)
    if base[0] == "box":
        # BoxUniform base (NCSF): low + (high - low) * U, exactly the
        # Uniform sampler (distributions.py Uniform.sample)
        u = jax.random.uniform(key, shape, dtype)
        z = base[1] + (base[2] - base[1]) * u
    else:
        z = jax.random.normal(key, shape, dtype)
    zf = z.reshape(-1, F)

    if c is not None:
        C = c.shape[-1]
        cf = jnp.broadcast_to(
            c, tuple(sample_shape) + cbatch + (C,)).reshape(-1, C)
        zc = jnp.concatenate([zf, cf.astype(zf.dtype)], axis=-1)
    else:
        C = 0
        zc = zf
    return (
        flat_params, layout, (K, univ, bound, slope, base), z.shape, zc, F,
        C, dtype,
    )


def fused_nsf_sample(flow, key, sample_shape, c=None,
                     want_log_prob: bool = False):
    r"""Draw samples from an NSF with one fused Pallas kernel: base draws and
    every autoregressive fixed-point sweep of every layer run per batch tile
    with the weights pinned in VMEM (jnp fallback off-TPU). Supports a
    conditioning context ``c`` and, with ``want_log_prob``, also returns
    ``log q(x)`` — the fused reverse-KL path. The spline ``bound``/``slope``
    are taken from the flow's own univariate config.

    Sampling only (no gradients) — use ``rsample_and_log_prob`` on the flow
    for the differentiable path (:mod:`zuko_tpu.ops.ift`).
    """
    flat_params, layout, statics, z_shape, zc, F, C, dtype = _prep_sample(
        flow, key, sample_shape, c
    )
    K, univ, bound, slope, base = statics
    out = _sample_core(
        layout, F, C, K, bound, slope, univ, base, want_log_prob, zc,
        list(flat_params),
    )
    if want_log_prob:
        x, lp = out
        return x.reshape(z_shape), lp.reshape(z_shape[:-1])
    return out.reshape(z_shape)


def _sample_core(layout, F, C, K, bound, slope, univ, base, want_log_prob,
                 zc, flat_params):
    """Flat sampling core: ``zc (n, F+C)`` base draws (+context) -> samples
    ``x (n, F)`` (and ``log q (n,)`` with ``want_log_prob``), through the
    Pallas kernel on TPU or the identical jnp math elsewhere. Shared by the
    non-differentiable :func:`fused_nsf_sample` and the custom-vjp forward in
    :mod:`zuko_tpu.ops.ift`."""
    dtype = zc.dtype
    n = zc.shape[0]

    if not _use_pallas_fused(dtype):
        cT = zc[:, F:].T if C else None
        out = _sample_math_T(
            zc[:, :F].T, list(flat_params), layout, F, K, bound, slope, cT,
            want_log_prob=want_log_prob, univ=univ, base=base,
        )
        if want_log_prob:
            x, lp = out
            return x.T, lp[0, :]
        return out.T

    tb = _density_tb(flat_params, layout)
    pad = (-n) % tb
    if pad:
        zc = jnp.pad(zc, ((0, pad), (0, 0)))
    m = zc.shape[0]

    # sublane-align the feature dimension (see _pad_features)
    realF = None
    if _needs_feature_pad(F):
        Fp = -(-F // 8) * 8
        flat_params, layout = _pad_features(
            list(flat_params), layout, F, C, Fp, _univ_size(univ, K)
        )
        zc = _pad_feature_cols(zc, F, Fp)
        realF, F = F, Fp

    if (
        _PREMASK_SAMPLE
        and univ not in ("sosp", "bernstein")
        # ZUKO_TPU_DENSITY_PREC=exact + want_log_prob: keep the "ar" form
        # so the solver sweeps run the requested lax.Precision through
        # `_hyper_T` instead of the pre-masked single-pass path — a 1-pass
        # solve would leave a z-mismatch vs the 6-pass density no final
        # evaluation can fix (the r10/r11 precision rule).
        and not (want_log_prob
                 and isinstance(_DENSITY_HYPER_PREC, jax.lax.Precision))
    ):
        # the solver sweeps otherwise redo M*W per iterate.
        # reverse-KL solves run split3 (see _sample_math_T) — hoist the
        # bf16 hi/lo weight split out of the grid too ("cat", the r10
        # density winner); plain sampling keeps dtype-preserving premask.
        # Polynomial univs keep the "ar" form (their sweeps run HIGHEST).
        mode = (
            "cat"
            if want_log_prob and _DENSITY_HYPER_PREC == "split3"
            else "mask"
        )
        flat_params, layout = _presplit_params(flat_params, layout, mode)

    n_params = len(flat_params)
    param_specs = [
        pl.BlockSpec(
            p.shape, lambda i, nd=p.ndim: (0,) * nd, memory_space=pltpu.VMEM
        )
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
        out_specs = pl.BlockSpec(
            (F, tb), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((F, m), dtype)

    out = pl.pallas_call(
        functools.partial(
            _sample_kernel_T, layout=layout, F=F, C=C, K=K, bound=bound,
            slope=slope, n_params=n_params, want_log_prob=want_log_prob,
            univ=univ, base=base, realF=realF,
        ),
        grid=(m // tb,),
        in_specs=[
            pl.BlockSpec((F + C, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_compiler_params(),
    )(zc.T, *flat_params)

    if want_log_prob:
        x, lp = out
        if realF is not None:
            x = x[:realF]
        x = x.T[:n] if pad else x.T
        lp = lp[0, :n] if pad else lp[0, :]
        return x, lp

    if realF is not None:
        out = out[:realF]
    return out.T[:n] if pad else out.T


def fused_nsf_sample_and_log_prob(flow, key, sample_shape, c=None, **kwargs):
    r"""Fused sampling + density: one kernel produces both ``x ~ q`` and
    ``log q(x)`` (the reverse-KL workhorse, reference:
    zuko/distributions.py:129-138)."""
    return fused_nsf_sample(
        flow, key, sample_shape, c=c, want_log_prob=True, **kwargs
    )


def fused_nsf_log_prob(flow, x, c=None):
    r"""Compute ``flow(c).log_prob(x)`` for an NSF with one fused Pallas
    kernel per batch tile (jnp fallback off-TPU). Differentiable via a custom
    VJP whose backward runs the identical jnp math. The spline
    ``bound``/``slope`` are taken from the flow's own univariate config.

    Example (TPU):
        >>> flow = NSF(6, 0, transforms=3, key=key)   # doctest: +SKIP
        >>> lp = fused_nsf_log_prob(flow, x)          # doctest: +SKIP
    """
    flat_params, layout, cfg = _flatten_flow(flow)
    K, univ = cfg["bins"], cfg["univ"]
    bound, slope = float(cfg["bound"]), float(cfg["slope"])
    base = cfg["base"]
    F = x.shape[-1]

    if c is not None:
        c = jnp.asarray(c)
        C = c.shape[-1]
        xb = jnp.broadcast_shapes(x.shape[:-1], c.shape[:-1])
        x = jnp.broadcast_to(x, xb + (F,))
        c = jnp.broadcast_to(c, xb + (C,)).astype(x.dtype)
        xc = jnp.concatenate([x, c], axis=-1)
    else:
        C = 0
        xc = x

    return _fused_op(
        layout, F, C, K, float(bound), float(slope), univ, base, xc,
        *flat_params
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _fused_op(layout, F, C, K, bound, slope, univ, base, xc, *flat_params):
    return _fused_impl(layout, F, C, K, bound, slope, univ, base, xc, *flat_params)


def _fused_fwd(layout, F, C, K, bound, slope, univ, base, xc, *flat_params):
    out = _fused_impl(layout, F, C, K, bound, slope, univ, base, xc, *flat_params)
    return out, (xc, flat_params)


# Backward row-chunk size: the same big-batch observation as the forward
# guard (smaller XLA programs pipeline ~10% better) and the same safety
# argument (the backward math was verified clean at 65536, but chunked
# programs sit squarely in the validated shape class).
_BWD_CHUNK = 8192


def _fused_bwd(layout, F, C, K, bound, slope, univ, base, res, g):
    xc, flat_params = res

    def ref_math(xc, fp):
        xf = xc.reshape(-1, F + C)
        cT = xf[:, F:].T if C else None
        return _full_math_T(
            xf[:, :F].T, list(fp), layout, F, K, bound, slope, cT, univ,
            base, barrier=True,
        )[0, :].reshape(xc.shape[:-1])

    rows = math.prod(xc.shape[:-1]) if xc.ndim > 1 else 1
    if (
        rows > _BWD_CHUNK
        and jax.default_backend() not in ("cpu", "gpu")
    ):
        flat_x = xc.reshape(rows, F + C)
        flat_g = g.reshape(rows)
        n_chunks = -(-rows // _BWD_CHUNK)
        pad = n_chunks * _BWD_CHUNK - rows
        if pad:  # zero cotangent on the pad rows: no gradient contribution
            flat_x = jnp.concatenate([flat_x, flat_x[:pad]], axis=0)
            flat_g = jnp.concatenate(
                [flat_g, jnp.zeros((pad,), flat_g.dtype)], axis=0)
        xch = flat_x.reshape(n_chunks, _BWD_CHUNK, F + C)
        gch = flat_g.reshape(n_chunks, _BWD_CHUNK)

        def one(chunk):
            xcc, gc = chunk
            _, vjp = jax.vjp(ref_math, xcc, flat_params)
            return vjp(gc)

        dx_ch, dfp_ch = jax.lax.map(one, (xch, gch))
        dxc = dx_ch.reshape(n_chunks * _BWD_CHUNK, F + C)
        dxc = dxc[:rows].reshape(xc.shape)
        dfp = jax.tree_util.tree_map(
            lambda a: jnp.sum(a, axis=0), dfp_ch)
        return (dxc, *dfp)

    _, vjp = jax.vjp(ref_math, xc, flat_params)
    dxc, dfp = vjp(g)
    return (dxc, *dfp)


_fused_op.defvjp(_fused_fwd, _fused_bwd)


def _fused_impl(layout, F, C, K, bound, slope, univ, base, xc, *flat_params):
    batch_shape = xc.shape[:-1]
    xf = xc.reshape(-1, F + C)

    if not _use_pallas_fused(xc.dtype):
        cT = xf[:, F:].T if C else None
        return _full_math_T(
            xf[:, :F].T, list(flat_params), layout, F, K, bound, slope, cT,
            univ, base, barrier=True,
        )[0, :].reshape(batch_shape)

    n = xf.shape[0]
    tb = _density_tb(flat_params, layout)
    pad = (-n) % tb
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    m = xf.shape[0]

    # sublane-align the feature dimension (Mosaic miscompiles unaligned
    # slab slices on hardware — see _pad_features)
    realF = None
    if _needs_feature_pad(F):
        Fp = -(-F // 8) * 8
        flat_params, layout = _pad_features(
            list(flat_params), layout, F, C, Fp, _univ_size(univ, K)
        )
        xf = _pad_feature_cols(xf, F, Fp)
        realF, F = F, Fp

    # hoist weight-only work (mask multiply, bf16 split) out of the grid
    if (
        _PRESPLIT_DENSITY != "off"
        and _DENSITY_HYPER_PREC == "split3"
        and univ not in ("sosp", "bernstein")
    ):
        flat_params, layout = _presplit_params(
            flat_params, layout, _PRESPLIT_DENSITY
        )

    n_params = len(flat_params)
    param_specs = [
        pl.BlockSpec(
            p.shape, lambda i, nd=p.ndim: (0,) * nd, memory_space=pltpu.VMEM
        )
        for p in flat_params
    ]

    xT = xf.T  # (F+C, m): batch rides the lane dimension inside the kernel

    out = pl.pallas_call(
        functools.partial(
            _kernel_T, layout=layout, F=F, C=C, K=K, bound=bound,
            slope=slope, n_params=n_params, univ=univ, base=base,
            realF=realF,
        ),
        grid=(m // tb,),
        in_specs=[
            pl.BlockSpec((F + C, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, tb), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, m), xc.dtype),
        compiler_params=_compiler_params(),
    )(xT, *flat_params)

    out = out[0, :]
    if pad:
        out = out[:n]
    return out.reshape(batch_shape)


# The fused family also covers MAF (affine univariate) — friendlier aliases.
fused_flow_log_prob = fused_nsf_log_prob
fused_flow_sample = fused_nsf_sample


# ------------------------------------------------------- fused coupling (NICE)


def extract_coupling_params(flow):
    """Pull per-layer (weights, biases, mask-vector) out of a NICE/RealNVP
    flow built from GeneralCouplingTransform layers (reference recipe:
    zuko/flows/coupling.py:142-200), with the same strict structure
    validation as :func:`extract_nsf_params` — plain ReLU MLP hyper-nets
    (no LayerNorm/residual), supported univariates, standard DiagNormal
    base — raising :class:`FusedStructureError` otherwise."""
    from ..flows.coupling import GeneralCouplingTransform
    from ..lazy import LazyComposedTransform
    from ..nn import Linear

    if not isinstance(getattr(flow, "transform", None), LazyComposedTransform):
        raise FusedStructureError(
            "fused kernels require a LazyComposedTransform flow,"
            f" got {type(getattr(flow, 'transform', None)).__name__}"
        )

    layers = []
    cfg = None
    for t in flow.transform.transforms:
        if type(t) is not GeneralCouplingTransform:
            raise FusedStructureError(
                "fused coupling kernels support GeneralCouplingTransform"
                f" layers only, got {type(t).__name__}"
            )
        kind, K, bound, slope = _univ_config(t.univariate, t.shapes)
        if cfg is None:
            cfg = (kind, K, bound, slope)
        elif cfg != (kind, K, bound, slope):
            raise FusedStructureError(
                f"layers must share a univariate config: {cfg} vs"
                f" {(kind, K, bound, slope)}"
            )
        lins = _extract_mlp_linears(t.hyper, Linear)
        layers.append({
            "weights": [l.weight for l in lins],
            "biases": [l.bias for l in lins],
            "mask": tuple(bool(m) for m in t.mask),
        })
    if cfg is None:
        raise FusedStructureError("flow has no transform layers")

    _require_standard_base(flow, len(layers[0]["mask"]))
    return layers, {
        "bins": cfg[1], "univ": cfg[0], "bound": cfg[2], "slope": cfg[3],
    }


def _mlp_T(xT, cT, ps, precision=None):
    """Plain (unmasked) MLP in transposed layout (precision: see
    `_hyper_T`)."""
    h = xT if cT is None else jnp.concatenate([xT, cT], axis=0)
    n = len(ps) // 2
    for i in range(n):
        W, b = ps[2 * i], ps[2 * i + 1]
        if precision == "split3":
            h = _dot_split3(W, h) + b[:, None]
        else:
            h = jnp.dot(
                W, h,
                preferred_element_type=jnp.promote_types(W.dtype, h.dtype),
                precision=precision,
            ) + b[:, None]
        if i < n - 1:
            h = jnp.maximum(h, 0.0)
    return h


def _coupling_math_T(xT, flat_params, layout, F, K, bound, slope, cT, univ,
                     inverse):
    """Transposed NICE/RealNVP math: per layer, the masked half passes
    through, the other half is transformed conditioned on it (reference:
    zuko/transforms.py:1010-1073). The hyper output is permuted to
    param-major at flatten time, so the whole transformed half runs through
    the feature-vectorized (Fb, TB) pipeline. Returns (out, total fwd ladj)."""
    acc = jnp.zeros_like(xT[:1, :])

    per_layer = []
    idx = 0
    for n_lin, mask in layout:
        per_layer.append((flat_params[idx : idx + 2 * n_lin], mask))
        idx += 2 * n_lin

    order = per_layer if not inverse else list(reversed(per_layer))
    for ps, mask in order:
        idx_a = [f for f in range(F) if mask[f]]
        idx_b = [f for f in range(F) if not mask[f]]
        Fb = len(idx_b)
        x_a = jnp.concatenate([xT[f : f + 1, :] for f in idx_a], axis=0)
        x_b = jnp.concatenate([xT[f : f + 1, :] for f in idx_b], axis=0)
        # density hypers run f32-exact: this path is jnp (XLA, not Mosaic),
        # so HIGHEST is available, and coupling ladjs are DIRECT functions
        # of h (no softmax pipeline to absorb matmul rounding — split3 left
        # 5.6e-4 median vs the CPU reference, tools/tpu_regression.py)
        h = _mlp_T(x_a, cT, ps,
                   precision=None if inverse
                   else jax.lax.Precision.HIGHEST)

        if inverse:
            out_b = _univ_inverse_F(x_b, h, Fb, K, bound, slope, univ)
            _, ladj = _univ_forward_F(out_b, h, Fb, K, bound, slope, univ)
        else:
            out_b, ladj = _univ_forward_F(x_b, h, Fb, K, bound, slope, univ)
        acc = acc + jnp.sum(ladj, axis=0, keepdims=True)

        rows = [None] * F
        for f in idx_a:
            rows[f] = xT[f : f + 1, :]
        for j, f in enumerate(idx_b):
            rows[f] = out_b[j : j + 1, :]
        xT = jnp.concatenate(rows, axis=0)

    return xT, acc


def fused_nice_log_prob(flow, x, c=None):
    r"""``flow(c).log_prob(x)`` for a NICE/RealNVP flow with the whole
    coupling stack fused (jnp path; structured identically to the Pallas
    kernels and jit-fusable — coupling layers have no fixed-point loop, so
    XLA already fuses them well; this entry point exists for parity and as
    the reference math for a future kernel).

    Example:
        >>> from zuko_tpu.flows import NICE
        >>> flow = NICE(4, transforms=2, key=jax.random.PRNGKey(0))
        >>> x = jnp.zeros((8, 4))
        >>> lp = fused_nice_log_prob(flow, x)
        >>> bool(jnp.allclose(lp, flow(None).log_prob(x), atol=1e-5))
        True
    """
    layers, cfg = extract_coupling_params(flow)
    K, univ = cfg["bins"], cfg["univ"]
    bound, slope = float(cfg["bound"]), float(cfg["slope"])
    F = x.shape[-1]

    T = _univ_size(univ, K)
    flat_params, layout = [], []
    for layer in layers:
        layout.append((len(layer["weights"]), layer["mask"]))
        ws, bs = layer["weights"], layer["biases"]
        perm = _param_major_perm(ws[-1].shape[0], T)
        ws = ws[:-1] + [ws[-1][perm]]
        bs = bs[:-1] + [bs[-1][perm]]
        for W, b in zip(ws, bs):
            flat_params += [W, b]

    if c is not None:
        c = jnp.asarray(c)
        xb = jnp.broadcast_shapes(x.shape[:-1], c.shape[:-1])
        x = jnp.broadcast_to(x, xb + x.shape[-1:])
        cT = jnp.broadcast_to(c, xb + c.shape[-1:]).reshape(-1, c.shape[-1]).T
    else:
        cT = None

    batch_shape = x.shape[:-1]
    xT = x.reshape(-1, F).T
    z, ladj = _coupling_math_T(
        xT, flat_params, tuple(layout), F, K, float(bound), float(slope),
        cT, univ, inverse=False,
    )
    base = -0.5 * jnp.sum(z**2, axis=0, keepdims=True) \
        - 0.5 * F * math.log(2 * math.pi)
    return (base + ladj)[0, :].reshape(batch_shape)


# ------------------------------------------------- inverted-flow tier (apply)
#
# The reference's reverse-KL recipe PRE-INVERTS the flow
# (``Flow(flow.transform.inv, flow.base)``, zuko/lazy.py:81-98 and
# docs/tutorials/reverse_kl.ipynb) so sampling is the cheap forward pass.
# For such a flow the roles swap: ``sample`` is the density-direction
# forward APPLY (no solve at all), and ``log_prob`` needs the solve. The
# apply op below runs T (+ the bare forward log-det) per batch tile with a
# custom VJP over the identical jnp math — fully differentiable, so the
# inverted flow's ``rsample``/``rsample_and_log_prob`` (its reverse-KL
# workhorse) ride it directly.


def _apply_kernel_T(*refs, layout, F, C, K, bound, slope, n_params, univ,
                    base, realF=None):
    x_ref = refs[0]
    param_refs = refs[1 : 1 + n_params]
    y_ref, l_ref = refs[1 + n_params], refs[2 + n_params]

    xT = x_ref[:F, :]
    cT = x_ref[F : F + C, :] if C else None
    flat = [r[:] for r in param_refs]
    y, sl = _full_math_T(
        xT, flat, layout, F, K, bound, slope, cT, univ, base, realF=realF,
        raw=True,
    )
    y_ref[:F, :] = y
    l_ref[:, :] = sl


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7)
)
def _apply_op(layout, F, C, K, bound, slope, univ, base, xc, *flat_params):
    return _apply_impl(layout, F, C, K, bound, slope, univ, base, xc,
                       *flat_params)


def _apply_fwd(layout, F, C, K, bound, slope, univ, base, xc, *flat_params):
    out = _apply_impl(layout, F, C, K, bound, slope, univ, base, xc,
                      *flat_params)
    return out, (xc, flat_params)


def _apply_bwd(layout, F, C, K, bound, slope, univ, base, res, cots):
    xc, flat_params = res
    gy, gl = cots

    def ref_math(xc_, fp):
        xf = xc_.reshape(-1, F + C)
        cT = xf[:, F:].T if C else None
        y, sl = _full_math_T(
            xf[:, :F].T, list(fp), layout, F, K, bound, slope, cT, univ,
            base, barrier=True, raw=True,
        )
        lead = xc_.shape[:-1]
        return y.T.reshape(lead + (F,)), sl[0, :].reshape(lead)

    rows = math.prod(xc.shape[:-1]) if xc.ndim > 1 else 1
    if rows > _BWD_CHUNK and jax.default_backend() not in ("cpu", "gpu"):
        # the big-batch shape-class guard, like _fused_bwd
        flat_x = xc.reshape(rows, F + C)
        gyf = gy.reshape(rows, F)
        glf = gl.reshape(rows)
        n_chunks = -(-rows // _BWD_CHUNK)
        pad = n_chunks * _BWD_CHUNK - rows
        if pad:  # zero cotangents on pad rows: no gradient contribution
            flat_x = jnp.concatenate([flat_x, flat_x[:pad]], axis=0)
            gyf = jnp.concatenate(
                [gyf, jnp.zeros((pad, F), gyf.dtype)], axis=0)
            glf = jnp.concatenate(
                [glf, jnp.zeros((pad,), glf.dtype)], axis=0)
        xch = flat_x.reshape(n_chunks, _BWD_CHUNK, F + C)
        gych = gyf.reshape(n_chunks, _BWD_CHUNK, F)
        glch = glf.reshape(n_chunks, _BWD_CHUNK)

        def one(chunk):
            xcc, gyc, glc = chunk
            _, vjp = jax.vjp(ref_math, xcc, flat_params)
            return vjp((gyc, glc))

        dx_ch, dfp_ch = jax.lax.map(one, (xch, gych, glch))
        dxc = dx_ch.reshape(n_chunks * _BWD_CHUNK, F + C)
        dxc = dxc[:rows].reshape(xc.shape)
        dfp = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), dfp_ch)
        return (dxc, *dfp)

    _, vjp = jax.vjp(ref_math, xc, flat_params)
    dxc, dfp = vjp((gy, gl))
    return (dxc, *dfp)


_apply_op.defvjp(_apply_fwd, _apply_bwd)


def _apply_impl(layout, F, C, K, bound, slope, univ, base, xc, *flat_params):
    batch_shape = xc.shape[:-1]
    xf = xc.reshape(-1, F + C)

    if not _use_pallas_fused(xc.dtype):
        cT = xf[:, F:].T if C else None
        y, sl = _full_math_T(
            xf[:, :F].T, list(flat_params), layout, F, K, bound, slope, cT,
            univ, base, barrier=True, raw=True,
        )
        return (
            y.T.reshape(batch_shape + (F,)),
            sl[0, :].reshape(batch_shape),
        )

    n = xf.shape[0]
    tb = _density_tb(flat_params, layout)
    pad = (-n) % tb
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    m = xf.shape[0]

    realF = None
    realF_out = F
    if _needs_feature_pad(F):
        Fp = -(-F // 8) * 8
        flat_params, layout = _pad_features(
            list(flat_params), layout, F, C, Fp, _univ_size(univ, K)
        )
        xf = _pad_feature_cols(xf, F, Fp)
        realF, F = F, Fp

    if (
        _PRESPLIT_DENSITY != "off"
        and _DENSITY_HYPER_PREC == "split3"
        and univ not in ("sosp", "bernstein")
    ):
        flat_params, layout = _presplit_params(
            flat_params, layout, _PRESPLIT_DENSITY
        )

    n_params = len(flat_params)
    param_specs = [
        pl.BlockSpec(
            p.shape, lambda i, nd=p.ndim: (0,) * nd, memory_space=pltpu.VMEM
        )
        for p in flat_params
    ]

    y, sl = pl.pallas_call(
        functools.partial(
            _apply_kernel_T, layout=layout, F=F, C=C, K=K, bound=bound,
            slope=slope, n_params=n_params, univ=univ, base=base,
            realF=realF,
        ),
        grid=(m // tb,),
        in_specs=[
            pl.BlockSpec((F + C, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=(
            pl.BlockSpec((F, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, m), xc.dtype),
            jax.ShapeDtypeStruct((1, m), xc.dtype),
        ),
        compiler_params=_compiler_params(),
    )(xf.T, *flat_params)

    y = y.T[:, :realF_out]
    sl = sl[0, :]
    if pad:
        y, sl = y[:n], sl[:n]
    return y.reshape(batch_shape + (realF_out,)), sl.reshape(batch_shape)


def fused_nsf_apply(flow, u, c=None):
    r"""Forward-APPLY the flow's transform with one fused kernel:
    ``(T(u), sum ladj_fwd(u))`` — the inverted-flow sampling direction
    (``Flow(flow.transform.inv, flow.base)``: sample' = T(z'),
    log q'(x) = base(z') - sum_ladj; reference: zuko/lazy.py:81-98).
    Fully differentiable via a custom VJP over the identical jnp math."""
    flat_params, layout, cfg = _flatten_flow(flow)
    K, univ = cfg["bins"], cfg["univ"]
    bound, slope = float(cfg["bound"]), float(cfg["slope"])
    base = cfg["base"]
    F = u.shape[-1]

    if c is not None:
        c = jnp.asarray(c)
        C = c.shape[-1]
        ub = jnp.broadcast_shapes(u.shape[:-1], c.shape[:-1])
        u = jnp.broadcast_to(u, ub + (F,))
        c = jnp.broadcast_to(c, ub + (C,)).astype(u.dtype)
        uc = jnp.concatenate([u, c], axis=-1)
    else:
        C = 0
        uc = u

    return _apply_op(
        layout, F, C, K, bound, slope, univ, base, uc, *flat_params
    )
