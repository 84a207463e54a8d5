r"""Fused NAF sampling: whole-flow autoregressive inversion with in-tile
monotone-network bisection.

The reference's NAF sampling hot loop is brutal: per autoregressive layer,
``passes``(=F) sequential hyper-net sweeps, and inside each sweep every
feature's univariate inverse is itself an iterative solve —
~25 bisection steps × monotone-net evaluations
(reference: zuko/transforms.py:609-617 via zuko/utils.py:170-183, net
structure zuko/flows/neural.py:32-71). On the XLA path each solver step is a
separate dispatch chain; fused, the MADE pass, every bisection iterate, and
every monotone-net evaluation run per batch tile with ALL weights pinned in
VMEM.

Layout: transposed tiles (batch in the 128-lane dim). MADE signal outputs
stay FEATURE-major — ``h[f*S:(f+1)*S]`` is feature ``f``'s signal slab —
because the monotone net consumes a contiguous ``(1+S, TB)`` input per
feature. The stacked monotone weights ``(F, out, in)`` are flattened to
``(F*out, in)`` so per-feature blocks are aligned row slices.

Forward-only (sampling); gradients go through the XLA path
(``newton_bisection``'s implicit-function-theorem custom VJP).
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

from .nsf_fused import (
    FusedStructureError,
    _BWD_CHUNK,
    _dot_split3,
    _extract_mlp_linears,
    _hyper_T,
    _log1p_ladj,
    _log_ladj,
    _require_standard_base,
    _use_pallas_fused,
)

__all__ = ["extract_naf_params", "fused_naf_log_prob", "fused_naf_sample"]

_TB = 1024

# bisection iteration count: ceil(log2(2 * bound / eps)) — the reference's
# choice (zuko/transforms.py:609-617) with bound=10, eps=1e-6
def _n_bisect(bound, eps):
    return int(math.ceil(math.log2(2.0 * bound / eps)))


# coarse-phase x-tolerance and Newton polish count (see _ar_inverse_sweeps_T):
# 3 exact Newton steps from ~1e-2 reach well past eps=1e-6 quadratically.
# Hardware A/B (tools/tpu_validate_r9.py): xtol=2e-2/n=3/split3 gives
# 1.14M NAF samples/s at ~1.2e-5 parity vs the XLA-highest path; deeper
# bisection (4e-3) or more polish (n=5) or 6-pass matmuls cost 20-40%
# throughput for no measurable accuracy gain.
_COARSE_XTOL = 2e-2
_N_NEWTON = 3
# Warm-started later sweeps (r5, see _ar_inverse_sweeps_T): bracket each
# sweep >= 1 around the previous sweep's root with this radius instead of
# the full [-bound, bound] (2 validity evals + 3 local-bisect evals vs 10
# full-bracket evals). Hardware A/B (tools/tpu_validate_r5_iter2.py,
# b=1M/131K): NAF 2.86 vs 2.12M samples/s (+35%), UNAF 0.47 vs 0.39
# (+20%), with p99/max draw deviation <= 5e-6/1.2e-5 and log q
# self-consistency tails unchanged. r=0.25 gives +26% (one fewer saved
# eval); r=0.0625 is the measured sweet spot. Opt out with
# ZUKO_TPU_NAF_WARM=0 (read at trace time).
_WARM_SWEEPS = os.environ.get("ZUKO_TPU_NAF_WARM", "1") != "0"
_WARM_R = 0.0625
# UMNN gets one extra polish step: its r50-winning config drops the coarse
# quadrature to GL-4 (noisier bracket), and the 4th exact Newton step
# restores the eps past 1e-6 at a fraction of the quadrature it saves.
_N_NEWTON_UMNN = 4


def _extract_stacked_net(net, linear_cls, act_ok, in_features, label):
    """Validate a stacked [linear, act]*linear net and return (weights
    flattened to (F*out, in), biases flattened, per-layer out dims)."""
    lins = []
    expect_linear = True
    for layer in net.layers:
        if expect_linear:
            if type(layer) is not linear_cls:
                raise FusedStructureError(
                    f"fused {label} expects {linear_cls.__name__} stacks,"
                    f" got {type(layer).__name__}"
                )
            if layer.bias is None or layer.weight.ndim != 3:
                raise FusedStructureError(
                    f"{label} net must be biased and stacked per feature"
                )
            lins.append(layer)
            expect_linear = False
        else:
            if not act_ok(layer):
                raise FusedStructureError(
                    f"fused {label} got unsupported activation"
                    f" {type(layer).__name__}"
                )
            expect_linear = True
    if expect_linear or not lins:
        raise FusedStructureError(f"{label} net must end with a linear")
    if len(lins) < 2:
        raise FusedStructureError(
            f"{label} net needs at least one hidden layer"
            " (the fused solver hoists the first layer per sweep)"
        )
    if lins[0].weight.shape[2] != in_features or lins[-1].weight.shape[1] != 1:
        raise FusedStructureError(
            f"{label} net must map ({in_features}) -> 1 per feature"
        )
    return (
        [l.weight.reshape(-1, l.weight.shape[2]) for l in lins],
        [l.bias.reshape(-1) for l in lins],
        tuple(l.weight.shape[1] for l in lins),
    )


def extract_naf_params(flow):
    """Strictly validate a NAF/UNAF flow's structure and pull out per-AR-layer
    parameters. Expected pattern (reference recipes,
    zuko/flows/neural.py:121-246): MaskedAutoregressiveTransform layers with
    an MNN univariate (shapes ``((S,),)``) or a UMNN univariate (shapes
    ``((S,), ())``), interleaved with unconditional
    ``SoftclipTransform(bound=11)``; plain ReLU MADE hyper-nets; standard
    DiagNormal base. Anything else raises :class:`FusedStructureError`."""
    from ..flows.autoregressive import MaskedAutoregressiveTransform
    from ..flows.neural import MNN, UMNN
    from ..lazy import LazyComposedTransform, UnconditionalTransform
    from ..nn import Activation, Linear, MaskedLinear, MonotonicLinear, TwoWayELU
    from ..transforms import SoftclipTransform

    if not isinstance(getattr(flow, "transform", None), LazyComposedTransform):
        raise FusedStructureError(
            "fused NAF sampling requires a LazyComposedTransform flow,"
            f" got {type(getattr(flow, 'transform', None)).__name__}"
        )

    stages = []  # ("softclip", bound) | ("ar", dict)
    S = None
    for t in flow.transform.transforms:
        if isinstance(t, UnconditionalTransform):
            if t.f is not SoftclipTransform or t.args:
                raise FusedStructureError(
                    "fused NAF sampling supports SoftclipTransform"
                    f" interleaves only, got {t.f}"
                )
            stages.append(("softclip", float(t.kwargs.get("bound", 5.0))))
            continue
        if type(t) is not MaskedAutoregressiveTransform:
            raise FusedStructureError(
                "fused NAF sampling supports MaskedAutoregressiveTransform"
                f" layers only, got {type(t).__name__}"
            )
        shapes = tuple(tuple(s) for s in t.shapes)
        if isinstance(t.univariate, MNN):
            kind = "mnn"
            if len(shapes) != 1 or len(shapes[0]) != 1:
                raise FusedStructureError(f"unexpected MNN shapes {shapes}")
        elif isinstance(t.univariate, UMNN):
            kind = "umnn"
            if len(shapes) != 2 or len(shapes[0]) != 1 or shapes[1] != ():
                raise FusedStructureError(f"unexpected UMNN shapes {shapes}")
        else:
            raise FusedStructureError(
                f"fused NAF sampling expects MNN/UMNN univariates, got"
                f" {type(t.univariate).__name__}"
            )
        if S is None:
            S = shapes[0][0]
        elif S != shapes[0][0]:
            raise FusedStructureError("layers must share the signal size")

        lins = _extract_mlp_linears(t.hyper, MaskedLinear)

        if kind == "mnn":
            # monotone net: [MonotonicLinear, TwoWayELU]* + MonotonicLinear
            mono_w, mono_b, mono_dims = _extract_stacked_net(
                t.univariate.network, MonotonicLinear,
                lambda l: (type(l) is TwoWayELU
                           and getattr(l, "alpha", 1.0) == 1.0),
                1 + S, "NAF monotone",
            )
            if any(h % 2 for h in mono_dims[:-1]):
                raise FusedStructureError("TwoWayELU needs an even hidden width")
        else:
            # UMNN integrand: plain stacked MLP with ELU activations
            # (reference: zuko/flows/neural.py:74-118)
            net = t.univariate.integrand
            mono_w, mono_b, mono_dims = _extract_stacked_net(
                net, Linear,
                lambda l: isinstance(l, Activation) and l.fn is jax.nn.elu,
                1 + S, "UMNN integrand",
            )

        stages.append(("ar", {
            "kind": kind,
            "made_w": [l.weight for l in lins],
            "made_b": [l.bias for l in lins],
            "made_m": [l.mask for l in lins],
            "mono_w": mono_w,
            "mono_b": mono_b,
            "mono_dims": mono_dims,
            "passes": int(t.passes),
            # MonotonicTransform solve domain (zuko/transforms.py:570-637)
            "bound": 10.0,
            "eps": 1e-6,
        }))

    F = None
    for kind, st in stages:
        if kind == "ar":
            F = st["mono_w"][0].shape[0] // st["mono_dims"][0]
            break
    if F is None:
        raise FusedStructureError("flow has no autoregressive layers")
    _require_standard_base(flow, F)
    return stages, {"signal": S, "features": F}


def _elu(x):
    # jax.nn.elu lowers to expm1, which Mosaic's TPU lowering lacks — use the
    # explicit where/exp form (exactly equal in f32 for the magnitudes here)
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _two_way_elu_T(z):
    """TwoWayELU on (H, TB) slabs: rows split in half
    (reference: zuko/nn.py:335-353)."""
    H = z.shape[0]
    a = z[: H // 2, :]
    b = z[H // 2 :, :]
    return jnp.concatenate([_elu(a), -_elu(-b)], axis=0)


# Gauss-Legendre rule of the UMNN integral, n=32
# (zuko_tpu/flows/neural.py _UMNNTransform defaults; reference
# zuko/transforms.py:911-918)
_UMNN_N = 32
_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(_UMNN_N)


def _bake_abs(mono_w, kind):
    """MonotonicLinear applies |W| (reference: zuko/nn.py:323-333) — bake the
    abs OUTSIDE the kernel so in-kernel evaluations are plain matmuls."""
    return [jnp.abs(W) for W in mono_w] if kind == "mnn" else list(mono_w)


def _dot_hi(W, u, prec=jax.lax.Precision.HIGHEST, barrier=False):
    # Near-exact matmuls wherever the solve needs them — the default single
    # bf16 MXU pass shifts solved roots by ~1e-2 (measured on v5e). HIGH
    # (3-pass) is NOT lowerable by Mosaic ("Unsupported dot precision:
    # HIGH"), so HIGHEST requests run the manual 3-pass bf16 split
    # (`_dot_split3`, ~2^-16 relative): hardware A/B (tpu_validate_r9)
    # shows it matches the 6-pass solve to ~1e-5 at 15-25% more throughput.
    # The coarse bisection phase passes prec=None (single fast pass): its
    # ~1e-2 noise floor is exactly what the Newton polish mops up.
    # ``barrier=True`` is REQUIRED in XLA-compiled contexts (custom-VJP
    # backward, the non-Pallas fallback): allow-excess-precision otherwise
    # elides the bf16 round-trip and zeroes the split residuals (the r48
    # class of bug, see nsf_fused._dot_split3). Mosaic callers keep False.
    if prec is jax.lax.Precision.HIGHEST:
        return _dot_split3(W, u, barrier=barrier)
    return jnp.dot(
        W, u,
        preferred_element_type=jnp.promote_types(W.dtype, u.dtype),
        precision=prec,
    )


def _two_way_elu_rows(z):
    """TwoWayELU on a per-feature (H, TB) slab: first half of the rows elu,
    second half -elu(-x) (reference: zuko/nn.py:335-353)."""
    H = z.shape[0]
    return jnp.concatenate(
        [_elu(z[: H // 2, :]), -_elu(-z[H // 2 :, :])], axis=0
    )


def _elu_deriv(z):
    return jnp.where(z > 0, 1.0, jnp.exp(jnp.minimum(z, 0.0)))


def _two_way_elu_rows_vg(z):
    """TwoWayELU value and derivative: d/dz[-elu(-z)] = elu'(-z)."""
    H = z.shape[0]
    a, b = z[: H // 2, :], z[H // 2 :, :]
    v = jnp.concatenate([_elu(a), -_elu(-b)], axis=0)
    d = jnp.concatenate([_elu_deriv(a), _elu_deriv(-b)], axis=0)
    return v, d


def _hoist_first_layer(sig_all, mono_w, mono_b, F, S, barrier=False):
    """The first monotone-net layer's SIGNAL contribution is constant across
    every bisection iterate of a sweep — hoist it: per feature,
    ``pre1_f = W1_f[:, 1:] @ sig_f + b1_f`` runs ONCE per sweep instead of
    once per solver step. Returns ``pre1`` (F*H1, TB) and ``w1x`` (F*H1, 1) —
    the x column, applied in-loop as a rank-1 broadcast (VPU, no matmul)."""
    W1, b1 = mono_w[0], mono_b[0]
    H1 = W1.shape[0] // F
    pre = [
        _dot_hi(W1[f * H1 : (f + 1) * H1, 1:], sig_all[f * S : (f + 1) * S, :],
                barrier=barrier)
        + b1[f * H1 : (f + 1) * H1, :]
        for f in range(F)
    ]
    return jnp.concatenate(pre, axis=0), W1[:, :1]


def _mono_eval_hoisted(mid, pre1, w1x, mono_w, mono_b, F, act, prec,
                       barrier=False):
    """All features' monotone nets, first layer hoisted: per solver step and
    feature, the work is one rank-1 broadcast (the x column), one (H, H)
    matmul per middle layer, and a VPU reduction for the 1-row output layer —
    F× fewer MXU FLOPs than a block-diagonal formulation and no (F*H, ·)
    live intermediates. mid (F, TB) -> f(mid) (F, TB)."""
    H1 = mono_w[0].shape[0] // F
    wL, bL = mono_w[-1], mono_b[-1]
    outs = []
    for f in range(F):
        u = act(
            pre1[f * H1 : (f + 1) * H1, :]
            + w1x[f * H1 : (f + 1) * H1] * mid[f : f + 1, :]
        )
        for W, b in zip(mono_w[1:-1], mono_b[1:-1]):
            Ho = W.shape[0] // F
            u = act(
                _dot_hi(W[f * Ho : (f + 1) * Ho, :], u, prec, barrier=barrier)
                + b[f * Ho : (f + 1) * Ho, :]
            )
        outs.append(
            jnp.sum(wL[f : f + 1, :].T * u, axis=0, keepdims=True)
            + bL[f : f + 1, :]
        )
    return jnp.concatenate(outs, axis=0)  # (F, TB)


def _mono_vg_hoisted(mid, pre1, w1x, mono_w, mono_b, F, barrier=False):
    """Monotone-net value AND x-derivative (forward mode through the same
    hoisted evaluation; dz1/dx is the x column) at HIGHEST precision — the
    Newton-polish evaluation. mid (F, TB) -> (f(mid), f'(mid)), both (F, TB).
    f' > 0 by construction (|W| weights, strictly positive TwoWayELU
    derivative: reference zuko/nn.py:323-353)."""
    H1 = mono_w[0].shape[0] // F
    wL, bL = mono_w[-1], mono_b[-1]
    vals, grads = [], []
    for f in range(F):
        z = (
            pre1[f * H1 : (f + 1) * H1, :]
            + w1x[f * H1 : (f + 1) * H1] * mid[f : f + 1, :]
        )
        u, dact = _two_way_elu_rows_vg(z)
        du = dact * w1x[f * H1 : (f + 1) * H1]
        for W, b in zip(mono_w[1:-1], mono_b[1:-1]):
            Ho = W.shape[0] // F
            Wf = W[f * Ho : (f + 1) * Ho, :]
            z = _dot_hi(Wf, u, barrier=barrier) + b[f * Ho : (f + 1) * Ho, :]
            dz = _dot_hi(Wf, du, barrier=barrier)
            u, dact = _two_way_elu_rows_vg(z)
            du = dact * dz
        wf = wL[f : f + 1, :].T
        vals.append(
            jnp.sum(wf * u, axis=0, keepdims=True) + bL[f : f + 1, :]
        )
        grads.append(jnp.sum(wf * du, axis=0, keepdims=True))
    return jnp.concatenate(vals, axis=0), jnp.concatenate(grads, axis=0)


# quadrature points batched along lanes per CHUNK: all 32 at once allocates
# (H, 32*TB) per-feature intermediates that crowd the 16MB scoped-VMEM stack
# on v5e; 8-point chunks keep the live set small with the same per-chunk
# matmul structure
_UMNN_CHUNK = 8

# The COARSE bisection only brackets the root to _COARSE_XTOL (2e-2) — a
# low-order rule is plenty for that (the integrand is smooth: a softclipped
# exp of an MLP), and the Newton polish re-evaluates with the full rule.
# GL-4 for the bracket is the r50-winning sweep point (tools/
# tpu_validate_r50.py: 296.8K samples/s vs 191.7K at 8c/16n/3N), paired
# with a 4th Newton step (_N_NEWTON_UMNN) to absorb the noisier bracket.
_UMNN_COARSE_N = 4
_GL_NODES_C, _GL_WEIGHTS_C = np.polynomial.legendre.leggauss(_UMNN_COARSE_N)

# Newton-phase SOLVE rule: the first polish steps only need to contract
# toward the root, so they run GL-8 (r50 sweep); the FINAL step evaluates
# the FINE rule, so the solved root converges quadratically onto the
# GL-16 root — which the r38 A/B pinned to <1e-7 of GL-32 on the smooth
# softclipped-exp integrand. Without the fine last step the GL-8 root
# carries the GL-8-vs-GL-32 quadrature gap (~2e-5) straight into the
# sample parity contract. The fused DENSITY integral also runs the fine
# rule (the `_umnn_vg_hoisted` default).
_UMNN_NEWTON_N = 8
_GL_NODES_N, _GL_WEIGHTS_N = np.polynomial.legendre.leggauss(_UMNN_NEWTON_N)
_UMNN_FINE_N = 16
_GL_NODES_F, _GL_WEIGHTS_F = np.polynomial.legendre.leggauss(_UMNN_FINE_N)


def _umnn_eval_hoisted(mid, pre1, w1x, mono_w, mono_b, F, act, prec,
                       nodes=None, weights=None, barrier=False):
    """All features × the quadrature points (lane-batched in chunks),
    integrand nets evaluated per feature with the hoisted first layer
    (reference integrand: zuko/flows/neural.py:100-104, quadrature:
    zuko/transforms.py:911-918). mid (F, TB) -> integral (F, TB)."""
    nodes = _GL_NODES if nodes is None else nodes
    weights = _GL_WEIGHTS if weights is None else weights
    TB = mid.shape[1]
    H1 = mono_w[0].shape[0] // F
    wL, bL = mono_w[-1], mono_b[-1]
    outs = []
    for f in range(F):
        pre_f = pre1[f * H1 : (f + 1) * H1, :]
        w1x_f = w1x[f * H1 : (f + 1) * H1]
        mid_f = mid[f : f + 1, :]
        acc = None
        for c0 in range(0, len(nodes), _UMNN_CHUNK):
            pts = nodes[c0 : c0 + _UMNN_CHUNK]
            P = len(pts)
            # points ride the LANE axis: (H1, P*TB) point-major blocks
            u = act(jnp.concatenate(
                [pre_f + w1x_f * (mid_f * (0.5 * (t + 1.0))) for t in pts],
                axis=1,
            ))
            for W, b in zip(mono_w[1:-1], mono_b[1:-1]):
                Ho = W.shape[0] // F
                u = act(
                    _dot_hi(W[f * Ho : (f + 1) * Ho, :], u, prec,
                            barrier=barrier)
                    + b[f * Ho : (f + 1) * Ho, :]
                )
            du = (
                jnp.sum(wL[f : f + 1, :].T * u, axis=0, keepdims=True)
                + bL[f : f + 1, :]
            )
            # g = exp(softclip(dx, 7)) in [1e-3, 1e3]
            # (zuko/flows/neural.py:100-104)
            g = jnp.exp(du / (1.0 + jnp.abs(du / 7.0)))  # (1, P*TB)
            for p in range(P):
                term = weights[c0 + p] * g[:, p * TB : (p + 1) * TB]
                acc = term if acc is None else acc + term
        outs.append(acc)
    return 0.5 * mid * jnp.concatenate(outs, axis=0)


def _umnn_vg_hoisted(mid, pre1, w1x, mono_w, mono_b, F, barrier=False,
                     nodes=None, weights=None):
    """UMNN integral value AND derivative at HIGHEST precision: the
    fundamental theorem gives f'(x) = g(x) — ONE extra integrand-net point
    per feature, not another 32-point quadrature. mid (F, TB) ->
    (f(mid), g(mid)); g >= e^-7 > 0 by the softclip. Defaults to the FINE
    quadrature rule; the solver passes the cheaper solve rule for its
    non-final Newton steps."""
    val = _umnn_eval_hoisted(
        mid, pre1, w1x, mono_w, mono_b, F, _elu, jax.lax.Precision.HIGHEST,
        nodes=_GL_NODES_F if nodes is None else nodes,
        weights=_GL_WEIGHTS_F if weights is None else weights,
        barrier=barrier,
    )
    H1 = mono_w[0].shape[0] // F
    wL, bL = mono_w[-1], mono_b[-1]
    gs = []
    for f in range(F):
        u = _elu(
            pre1[f * H1 : (f + 1) * H1, :]
            + w1x[f * H1 : (f + 1) * H1] * mid[f : f + 1, :]
        )
        for W, b in zip(mono_w[1:-1], mono_b[1:-1]):
            Ho = W.shape[0] // F
            u = _elu(
                _dot_hi(W[f * Ho : (f + 1) * Ho, :], u, barrier=barrier)
                + b[f * Ho : (f + 1) * Ho, :]
            )
        du = (
            jnp.sum(wL[f : f + 1, :].T * u, axis=0, keepdims=True)
            + bL[f : f + 1, :]
        )
        gs.append(jnp.exp(du / (1.0 + jnp.abs(du / 7.0))))
    return val, jnp.concatenate(gs, axis=0)


def _ar_inverse_sweeps_T(y, cT, st, F, S, want_ladj=False, barrier=False,
                         warm=None):
    """Invert one NAF/UNAF autoregressive layer on a (F, TB) tile:
    ``passes`` fixed-point sweeps (reference: zuko/transforms.py:994-1000);
    inside each sweep, a fixed-count bisection solves every feature's
    monotone univariate at once (reference per-element solve:
    zuko/transforms.py:609-617) with the net weights resident. For UMNN the
    target is shifted by the per-feature additive constant
    (reference: zuko/flows/neural.py:106-118). With ``want_ladj`` also
    returns the FORWARD ladj slab (F, TB) at the solved x."""
    made = []
    for W, b, M in zip(st["made_w"], st["made_b"], st["made_m"]):
        made += [W, b, M]
    bound, eps = st["bound"], st["eps"]
    kind = st.get("kind", "mnn")
    T = S if kind == "mnn" else S + 1
    if kind == "mnn":
        f_eval = functools.partial(_mono_eval_hoisted, barrier=barrier)
    else:
        # coarse bisection runs the cheap low-order quadrature (see
        # _UMNN_COARSE_N note); Newton re-evaluates with the full rule
        f_eval = functools.partial(
            _umnn_eval_hoisted, nodes=_GL_NODES_C, weights=_GL_WEIGHTS_C,
            barrier=barrier,
        )
    f_vg = functools.partial(
        _mono_vg_hoisted if kind == "mnn" else _umnn_vg_hoisted,
        barrier=barrier,
    )
    # non-final Newton steps for UMNN run the cheaper SOLVE rule; the
    # final step (f_vg above, fine-rule default) lands on the GL-16 root
    f_vg_solve = f_vg if kind == "mnn" else functools.partial(
        _umnn_vg_hoisted, barrier=barrier,
        nodes=_GL_NODES_N, weights=_GL_WEIGHTS_N,
    )
    act = _two_way_elu_rows if kind == "mnn" else _elu
    mono_w, mono_b = st["mono_w"], st["mono_b"]  # |W| pre-baked for MNN

    # coarse-fine solve: bisection at single-pass matmul precision down to
    # ~the bf16 noise floor (~1e-2 in f, measured on v5e), then Newton
    # polish at HIGHEST — quadratic convergence recovers eps=1e-6 in a few
    # exact evaluations instead of running all ~25 bisection iterations at
    # 6-pass precision. For UMNN a Newton step is nearly free on top of the
    # value: f' = g (one integrand point vs a 32-point quadrature).
    n_coarse = _n_bisect(bound, _COARSE_XTOL)

    # lax loops, not Python unrolls: sweeps x bisection x net unrolled to
    # straight-line code produced multi-MB Mosaic programs (the UNAF variant
    # OOM-killed the AOT compile service); the rolled form is ~30x smaller
    # and numerically identical.
    def prep(x):
        """Per-sweep constants: hyper pass, solve target, hoisted layer."""
        # HIGHEST: solver inputs must be f32-exact (see _dot_hi note)
        h = _hyper_T(x, cT, made, precision=jax.lax.Precision.HIGHEST)

        # per-sweep constants: all signal slabs, and the UMNN shift
        sig_all = jnp.concatenate(
            [h[f * T : f * T + S, :] for f in range(F)], axis=0
        )
        if kind == "umnn":
            # y = f(x) + constant  =>  solve f(x) = y - constant
            consts = jnp.concatenate(
                [h[f * T + S : f * T + S + 1, :] for f in range(F)], axis=0
            )
            target = y - consts
        else:
            target = y

        pre1, w1x = _hoist_first_layer(sig_all, mono_w, mono_b, F, S,
                                       barrier=barrier)
        return target, pre1, w1x

    n_newton = _N_NEWTON_UMNN if kind == "umnn" else _N_NEWTON
    # warm sweeps enter near the root, so UMNN drops the extra polish step
    # that r50 added for the noisy wide-bracket GL-4 coarse phase (which
    # still gets it: sweep 0 and the per-row fallback path). Hardware A/B
    # (tools/tpu_validate_r5_unaf_newton.py): +15% UNAF sampling at
    # unchanged self-consistency tails, draw deviation <= 8.6e-6.
    n_newton_warm = n_newton - 1 if kind == "umnn" else n_newton

    def solve(target, pre1, w1x, lo, hi, n_iters, n_newton=n_newton):
        """Bisect the bracket n_iters times, then Newton-polish."""
        def bisect_body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            fm = f_eval(mid, pre1, w1x, mono_w, mono_b, F, act, None)
            go_right = fm < target
            lo = jnp.where(go_right, mid, lo)
            hi = jnp.where(go_right, hi, mid)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, n_iters, bisect_body, (lo, hi))

        def newton_step(xn, vg):
            fv, df = vg(xn, pre1, w1x, mono_w, mono_b, F)
            step = (fv - target) / jnp.maximum(df, 1e-12)
            # clamp to the solve domain, NOT the coarse bracket: in flat
            # regions the noisy coarse bracket can exclude the true root,
            # and Newton's exact evaluations are what correct it
            return jnp.clip(xn - step, -bound, bound)

        xn = jax.lax.fori_loop(
            0, n_newton - 1,
            lambda _, v: newton_step(v, f_vg_solve), 0.5 * (lo + hi),
        )
        # final step at the fine rule: quadratic convergence plants the
        # root on the fine-quadrature forward (see _UMNN_NEWTON_N note)
        return newton_step(xn, f_vg)

    def sweep_body(_, x):
        target, pre1, w1x = prep(x)
        lo = jnp.full_like(y, -bound)
        hi = jnp.full_like(y, bound)
        return solve(target, pre1, w1x, lo, hi, n_coarse)

    n_sweeps = min(st["passes"], F)
    use_warm = _WARM_SWEEPS if warm is None else warm
    if use_warm and n_sweeps > 1:
        # Warm-started later sweeps (r5 iteration-level experiment): after
        # sweep s, features < s are FINAL (their hypers read only final
        # features), so the previous sweep's roots are exact for them and
        # geometrically convergent for the rest. Bracket sweep s >= 1
        # locally around the previous root (2 validity evaluations; rows
        # whose root moved outside the window fall back to the full
        # bracket, where the shortened bisection leaves ~bound/2^k error
        # for Newton's exact evaluations to absorb — exactly the coarse-
        # phase contract, with a wider entry gap on those rows only; any
        # residual error on PROVISIONAL features is overwritten by their
        # finalizing sweep).
        n_warm = _n_bisect(_WARM_R, _COARSE_XTOL)

        def warm_body(_, x):
            target, pre1, w1x = prep(x)
            lo0 = x - _WARM_R
            hi0 = x + _WARM_R
            flo = f_eval(lo0, pre1, w1x, mono_w, mono_b, F, act, None)
            fhi = f_eval(hi0, pre1, w1x, mono_w, mono_b, F, act, None)
            ok = (flo < target) & (target < fhi)
            lo = jnp.where(ok, lo0, jnp.full_like(y, -bound))
            hi = jnp.where(ok, hi0, jnp.full_like(y, bound))
            return solve(target, pre1, w1x, lo, hi, n_warm,
                         n_newton=n_newton_warm)

        x = sweep_body(0, jnp.zeros_like(y))
        x = jax.lax.fori_loop(1, n_sweeps, warm_body, x)
    else:
        x = jax.lax.fori_loop(0, n_sweeps, sweep_body, jnp.zeros_like(y))
    if not want_ladj:
        return x

    # forward ladj at the SOLVED x under its true hyper output: one extra
    # exact evaluation — the monotone-net derivative g IS the per-feature
    # Jacobian (for UMNN by the fundamental theorem, the additive constant
    # has zero derivative). Reference ladj: zuko/transforms.py:623-637
    # (autograd through the forward), computed here analytically.
    h = _hyper_T(x, cT, made, precision=jax.lax.Precision.HIGHEST)
    sig_all = jnp.concatenate(
        [h[f * T : f * T + S, :] for f in range(F)], axis=0
    )
    pre1, w1x = _hoist_first_layer(sig_all, mono_w, mono_b, F, S,
                                   barrier=barrier)
    _, g = f_vg(x, pre1, w1x, mono_w, mono_b, F)
    return x, _log_ladj(g)


def _naf_density_math_T(xT, cT, stages, F, S, barrier=False):
    """Whole-flow NAF/UNAF density on a (F, TB) tile — the FORWARD
    direction needs no solver: one monotone-net evaluation per feature
    per layer gives both the value and, analytically, the ladj (the net
    derivative; for UMNN the integrand point, by the fundamental
    theorem). The reference computes the ladj by autograd through the
    forward (zuko/transforms.py:623-637)."""
    acc = None
    y = xT
    for kind, st in stages:
        if kind == "softclip":
            B = st
            q = jnp.abs(y / B)
            ladj = -2.0 * jnp.sum(_log1p_ladj(q), axis=0, keepdims=True)
            y = y / (1.0 + q)
            acc = ladj if acc is None else acc + ladj
            continue
        made = []
        for W, b, M in zip(st["made_w"], st["made_b"], st["made_m"]):
            made += [W, b, M]
        kind2 = st.get("kind", "mnn")
        T = S if kind2 == "mnn" else S + 1
        f_vg = functools.partial(
            _mono_vg_hoisted if kind2 == "mnn" else _umnn_vg_hoisted,
            barrier=barrier,
        )
        mono_w, mono_b = st["mono_w"], st["mono_b"]

        h = _hyper_T(y, cT, made, precision=jax.lax.Precision.HIGHEST)
        sig_all = jnp.concatenate(
            [h[f * T : f * T + S, :] for f in range(F)], axis=0
        )
        pre1, w1x = _hoist_first_layer(sig_all, mono_w, mono_b, F, S,
                                       barrier=barrier)
        val, g = f_vg(y, pre1, w1x, mono_w, mono_b, F)
        if kind2 == "umnn":
            consts = jnp.concatenate(
                [h[f * T + S : f * T + S + 1, :] for f in range(F)], axis=0
            )
            val = val + consts
        y = val
        ladj = jnp.sum(_log_ladj(g), axis=0, keepdims=True)
        acc = ladj if acc is None else acc + ladj

    lp = -0.5 * jnp.sum(y * y, axis=0, keepdims=True) \
        - 0.5 * F * math.log(2.0 * math.pi)
    return lp if acc is None else lp + acc


def _naf_sample_math_T(zT, cT, stages, F, S, want_log_prob=False,
                       barrier=False, warm=None):
    """Whole-flow NAF inversion on a (F, TB) tile: softclip inverses
    elementwise, AR layers via sweep + bisection. With ``want_log_prob``
    also returns ``log q(x) = base.log_prob(z) + sum ladj_fwd`` (1, TB) —
    the fused reverse-KL quantity (reference: zuko/distributions.py:129-138;
    the extractor pins a standard-normal base)."""
    acc = None
    if want_log_prob:
        acc = -0.5 * jnp.sum(zT * zT, axis=0, keepdims=True) \
            - 0.5 * zT.shape[0] * math.log(2.0 * math.pi)

    y = zT
    for kind, st in reversed(stages):
        if kind == "softclip":
            B = st
            # inverse of x / (1 + |x/B|) (reference: zuko/transforms.py:286-316)
            x = y / (1.0 - jnp.abs(y / B))
            if want_log_prob:
                # forward ladj of softclip at x: -2 log1p(|x / B|)
                acc = acc - 2.0 * jnp.sum(
                    _log1p_ladj(jnp.abs(x / B)), axis=0, keepdims=True
                )
            y = x
        else:
            if want_log_prob:
                x, ladj = _ar_inverse_sweeps_T(y, cT, st, F, S,
                                               want_ladj=True,
                                               barrier=barrier, warm=warm)
                acc = acc + jnp.sum(ladj, axis=0, keepdims=True)
                y = x
            else:
                y = _ar_inverse_sweeps_T(y, cT, st, F, S, barrier=barrier,
                                         warm=warm)
    if want_log_prob:
        return y, acc
    return y


def _stage_layout(stages, F, S):
    """Static description of ``stages`` + flat param list (kernel inputs).
    The monotone/integrand weights stay per-feature stacked (F*H_out, H_in);
    MNN's |W| is baked here, outside the kernel (see _bake_abs)."""
    flat, layout = [], []
    for kind, st in stages:
        if kind == "softclip":
            layout.append(("softclip", st))
        else:
            flat += [a for trip in zip(st["made_w"], st["made_b"], st["made_m"])
                     for a in trip]
            flat += _bake_abs(st["mono_w"], st.get("kind", "mnn"))
            # biases as 2-D columns: in-kernel 1-D slicing + newaxis lowers
            # to a gather Mosaic rejects ("Only 2D gather is supported")
            flat += [b.reshape(-1, 1) for b in st["mono_b"]]
            layout.append((
                "ar",
                {
                    "kind": st.get("kind", "mnn"),
                    "n_made": len(st["made_w"]),
                    "mono_dims": st["mono_dims"],
                    "passes": st["passes"],
                    "bound": st["bound"],
                    "eps": st["eps"],
                },
            ))
    return flat, tuple(
        (k, v if k == "softclip" else tuple(sorted(v.items())))
        for k, v in layout
    )


def _rebuild_stages(flat, layout):
    stages = []
    idx = 0
    for kind, v in layout:
        if kind == "softclip":
            stages.append(("softclip", v))
            continue
        d = dict(v)
        n, L = d["n_made"], len(d["mono_dims"])
        made = flat[idx : idx + 3 * n]
        idx += 3 * n
        mono_w = flat[idx : idx + L]
        idx += L
        mono_b = flat[idx : idx + L]
        idx += L
        stages.append(("ar", {
            "kind": d.get("kind", "mnn"),
            "made_w": made[0::3], "made_b": made[1::3], "made_m": made[2::3],
            "mono_w": mono_w, "mono_b": mono_b,
            "mono_dims": d["mono_dims"], "passes": d["passes"],
            "bound": d["bound"], "eps": d["eps"],
        }))
    return stages


def _naf_kernel_T(*refs, layout, F, C, S, n_params, want_log_prob=False,
                  warm=None):
    z_ref = refs[0]
    param_refs = refs[1 : 1 + n_params]

    zT = z_ref[:F, :]
    cT = z_ref[F : F + C, :] if C else None
    stages = _rebuild_stages([r[:] for r in param_refs], layout)
    if want_log_prob:
        out_ref, lp_ref = refs[1 + n_params], refs[2 + n_params]
        x, lp = _naf_sample_math_T(zT, cT, stages, F, S, want_log_prob=True,
                                   warm=warm)
        out_ref[:F, :] = x
        lp_ref[:, :] = lp
    else:
        out_ref = refs[1 + n_params]
        out_ref[:F, :] = _naf_sample_math_T(zT, cT, stages, F, S, warm=warm)


def _naf_density_kernel_T(*refs, layout, F, C, S, n_params):
    x_ref = refs[0]
    param_refs = refs[1 : 1 + n_params]
    out_ref = refs[1 + n_params]

    xT = x_ref[:F, :]
    cT = x_ref[F : F + C, :] if C else None
    stages = _rebuild_stages([r[:] for r in param_refs], layout)
    out_ref[:, :] = _naf_density_math_T(xT, cT, stages, F, S)


class _NafCfg:
    """Hashable static config for the density custom_vjp."""

    def __init__(self, layout, F, C, S):
        self.layout, self.F, self.C, self.S = layout, F, C, S
        self._key = (layout, F, C, S)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _NafCfg) and self._key == other._key


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _naf_density_op(cfg, xc, *flat_params):
    return _naf_density_impl(cfg, xc, *flat_params)


def _naf_density_fwd(cfg, xc, *flat_params):
    return _naf_density_impl(cfg, xc, *flat_params), (xc, flat_params)


def _naf_density_bwd(cfg, res, g):
    xc, flat_params = res
    F, C, S = cfg.F, cfg.C, cfg.S

    def ref_math(xc, fp):
        xf = xc.reshape(-1, F + C)
        cT = xf[:, F:].T if C else None
        stages = _rebuild_stages(list(fp), cfg.layout)
        # barrier=True: this backward is XLA-compiled, where
        # allow-excess-precision would elide the split3 round-trips
        return _naf_density_math_T(
            xf[:, :F].T, cT, stages, F, S, barrier=True
        )[0, :].reshape(xc.shape[:-1])

    # Row-chunk big batches like nsf_fused._fused_bwd: stay inside the
    # shape class validated against the XLA:TPU big-batch miscompile
    # (and smaller programs pipeline better).
    rows = math.prod(xc.shape[:-1]) if xc.ndim > 1 else 1
    if rows > _BWD_CHUNK and jax.default_backend() not in ("cpu", "gpu"):
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
        dfp = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), dfp_ch)
        return (dxc, *dfp)

    _, vjp = jax.vjp(ref_math, xc, flat_params)
    dxc, dfp = vjp(g)
    return (dxc, *dfp)


_naf_density_op.defvjp(_naf_density_fwd, _naf_density_bwd)


def _naf_density_impl(cfg, xc, *flat_params):
    layout, F, C, S = cfg.layout, cfg.F, cfg.C, cfg.S
    batch_shape = xc.shape[:-1]
    xf = xc.reshape(-1, F + C)

    if not _use_pallas_fused(xc.dtype):
        cT = xf[:, F:].T if C else None
        stages = _rebuild_stages(list(flat_params), layout)
        return _naf_density_math_T(
            xf[:, :F].T, cT, stages, F, S, barrier=True
        )[0, :].reshape(batch_shape)

    tb = _TB
    while tb > 128 and F * tb > 8 * _TB:
        tb //= 2
    if any(k == "ar" and dict(v).get("kind") == "umnn" for k, v in layout):
        tb = min(tb, 512)
    # Warm-started sweeps compile TWO sweep bodies (full-bracket sweep 0 +
    # the warm loop), raising the Mosaic stack peak: F=8 at tb=1024 read
    # 17.04M against the 16M scoped limit with warm while the full-bracket
    # solver fits (r5 boundary probe). F=6 at tb=1024 compiles and runs
    # with warm (the bench_suite NAF row), so 6*_TB is the proven warm
    # budget; beyond it the tile shrinks (the few-% smaller-tile overhead
    # is far below warm's +20-46%), with per-instance fallback to
    # full-bracket sweeps if even the floor cannot afford it.
    warm = _WARM_SWEEPS
    if warm:
        while tb > 128 and F * tb > 6 * _TB:
            tb //= 2
        if F * tb > 6 * _TB:
            warm = False

    n = xf.shape[0]
    pad = (-n) % tb
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    m = xf.shape[0]

    n_params = len(flat_params)
    param_specs = [
        pl.BlockSpec(
            p.shape, lambda i, nd=p.ndim: (0,) * nd, memory_space=pltpu.VMEM
        )
        for p in flat_params
    ]
    out = pl.pallas_call(
        functools.partial(
            _naf_density_kernel_T, layout=layout, F=F, C=C, S=S,
            n_params=n_params,
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
    )(xf.T, *flat_params)

    out = out[0, :]
    if pad:
        out = out[:n]
    return out.reshape(batch_shape)


def fused_naf_log_prob(flow, x, c=None):
    r"""``flow(c).log_prob(x)`` for a NAF/UNAF with the whole forward pass
    fused per batch tile: per-feature monotone-net evaluations with
    ANALYTIC log-Jacobians (the net derivative / the UMNN integrand point)
    instead of the XLA path's jvp. Differentiable via a custom VJP whose
    backward runs the identical jnp math."""
    stages, cfg = extract_naf_params(flow)
    F, S = cfg["features"], cfg["signal"]
    flat_params, layout = _stage_layout(stages, F, S)

    x = jnp.asarray(x)
    if x.shape[-1] != F:
        raise FusedStructureError(
            f"x has {x.shape[-1]} features, flow has {F}"
        )
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

    return _naf_density_op(_NafCfg(layout, F, C, S), xc, *flat_params)


def fused_naf_sample(flow, key, sample_shape, c=None,
                     want_log_prob: bool = False):
    r"""Draw samples from a NAF with one fused kernel per batch tile: every
    autoregressive sweep, every bisection iterate, and every monotone-net
    evaluation runs with the weights pinned in VMEM (jnp fallback off-TPU).
    With ``want_log_prob`` also returns ``log q(x)`` — the fused reverse-KL
    quantity, with the forward ladj evaluated analytically at the solved x
    (the monotone-net derivative; reference gets it by autograd,
    zuko/transforms.py:623-637).

    Sampling only (no gradients) — use ``rsample`` on the flow for the
    differentiable path (:mod:`zuko_tpu.ops.ift`).
    """
    flat_params, layout, z_shape, zc, F, C, S, dtype = _prep_naf_sample(
        flow, key, sample_shape, c
    )
    out = _naf_sample_core(
        layout, F, C, S, want_log_prob, zc, list(flat_params)
    )
    if want_log_prob:
        x, lp = out
        return x.reshape(z_shape), lp.reshape(z_shape[:-1])
    return out.reshape(z_shape)


def _prep_naf_sample(flow, key, sample_shape, c):
    """Shared sampling prep: extract + flatten params, draw base z, build
    the flat ``zc = [z | c]`` rows."""
    stages, cfg = extract_naf_params(flow)
    F, S = cfg["features"], cfg["signal"]
    flat_params, layout = _stage_layout(stages, F, S)

    try:
        dtype = jnp.asarray(flow.base.args[0]).dtype
    except (AttributeError, IndexError):  # pragma: no cover
        dtype = flat_params[0].dtype
    # batched context contributes its batch dims after the draw shape,
    # matching the XLA path's `sample_shape + batch_shape + event`
    c = jnp.asarray(c) if c is not None else None
    cbatch = tuple(c.shape[:-1]) if c is not None else ()
    z = jax.random.normal(key, tuple(sample_shape) + cbatch + (F,), dtype)
    zf = z.reshape(-1, F)

    if c is not None:
        C = c.shape[-1]
        cf = jnp.broadcast_to(
            c, tuple(sample_shape) + cbatch + (C,)).reshape(-1, C)
        zc = jnp.concatenate([zf, cf.astype(zf.dtype)], axis=-1)
    else:
        C = 0
        zc = zf
    return flat_params, layout, z.shape, zc, F, C, S, dtype


def _naf_sample_core(layout, F, C, S, want_log_prob, zc, flat_params):
    """Flat-row sampling core: ``zc (n, F+C)`` -> ``x (n, F)`` (and
    ``log q (n,)``) through the fused kernel (jnp fallback off-TPU)."""
    dtype = zc.dtype
    n = zc.shape[0]
    # Scoped-VMEM stack budget: the per-tile live set scales with F * tb
    # (per-feature monotone-net slabs) — F=21 at tb=1024 hit the 16MB
    # stack limit at compile (17.6M, r31). Shrink the tile until F * tb
    # fits the validated F=8/tb=1024 budget; UMNN additionally halves for
    # its lane-batched quadrature chunks.
    tb = _TB
    while tb > 128 and F * tb > 8 * _TB:
        tb //= 2
    if any(k == "ar" and dict(v).get("kind") == "umnn" for k, v in layout):
        tb = min(tb, 512)
    # Warm-started sweeps compile TWO sweep bodies (full-bracket sweep 0 +
    # the warm loop), raising the Mosaic stack peak: F=8 at tb=1024 read
    # 17.04M against the 16M scoped limit with warm while the full-bracket
    # solver fits (r5 boundary probe). F=6 at tb=1024 compiles and runs
    # with warm (the bench_suite NAF row), so 6*_TB is the proven warm
    # budget; beyond it the tile shrinks (the few-% smaller-tile overhead
    # is far below warm's +20-46%), with per-instance fallback to
    # full-bracket sweeps if even the floor cannot afford it.
    warm = _WARM_SWEEPS
    if warm:
        while tb > 128 and F * tb > 6 * _TB:
            tb //= 2
        if F * tb > 6 * _TB:
            warm = False

    # Big-F feasibility: the (F*hidden, tb) monotone-net slabs dominate the
    # Mosaic stack — F=43 measured 21.7M against the 16M scoped limit at the
    # 128-lane tile floor even without warm (r5; a latent gap — big-D NAF
    # SAMPLING had never been compiled). Sub-128 lanes are not lowerable, so
    # the whole solve runs the identical jnp math under XLA instead.
    if not _use_pallas_fused(dtype) or F > 24:
        cT = zc[:, F:].T if C else None
        stages2 = _rebuild_stages(list(flat_params), layout)
        out = _naf_sample_math_T(zc[:, :F].T, cT, stages2, F, S,
                                 want_log_prob=want_log_prob, barrier=True,
                                 warm=_WARM_SWEEPS)
        if want_log_prob:
            x, lp = out
            return x.T, lp[0, :]
        return out.T

    pad = (-n) % tb
    if pad:
        zc = jnp.pad(zc, ((0, pad), (0, 0)))
    m = zc.shape[0]

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
            _naf_kernel_T, layout=layout, F=F, C=C, S=S, n_params=n_params,
            want_log_prob=want_log_prob, warm=warm,
        ),
        grid=(m // tb,),
        in_specs=[
            pl.BlockSpec((F + C, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(zc.T, *flat_params)

    if want_log_prob:
        x, lp = out
        x = x.T[:n] if pad else x.T
        lp = lp[0, :n] if pad else lp[0, :]
        return x, lp

    return out.T[:n] if pad else out.T
