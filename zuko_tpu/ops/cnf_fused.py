r"""Whole-flow fused CNF (FFJORD) density kernels.

One Pallas program per batch tile runs the ENTIRE adaptive Dormand–Prince
4(5) integration of the augmented system :math:`d(x, \log|J|)/dt =
(f_\phi(t, x), \mathrm{tr}\,\partial_x f_\phi)` with the ODE network's
weights resident in VMEM: every accepted/rejected step, all 7 tableau
stages, the sinusoidal time embedding and the trace term (exact
forward-mode columns batched along the lane axis, or a Hutchinson probe)
happen on-chip without HBM round-trips between steps.

Reference semantics: zuko/transforms.py:1076-1179 (FreeFormJacobianTransform:
augmented integration, ``trace_scale`` relaxation, exact batched-identity
trace vs Hutchinson), zuko/utils.py:366-593 (dopri45 + ACA error control;
the same tableau and error-control constants live in
:mod:`zuko_tpu.utils`), zuko/flows/continuous.py:23-113 (ODE net + time
embedding).

Adaptive stepping is per batch TILE in the kernel (each tile chooses its own
accepted-step sequence), whereas the XLA path shares one step sequence
across the whole batch — both integrate to the same ``atol``/``rtol``
tolerances, so densities agree to solver tolerance, not bitwise. The jnp
fallback (off-TPU, and the custom-VJP backward) reproduces the XLA path's
global-step integration exactly via :func:`zuko_tpu.utils.odeint`.
"""

from __future__ import annotations

__all__ = [
    "extract_cnf_params",
    "fused_cnf_log_prob",
    "fused_cnf_rsample",
    "fused_cnf_sample",
]

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .nsf_fused import (
    FusedStructureError,
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
_TB_CNF = 256  # batch tile; exact-trace tangents are (H, F*TB) in VMEM

# Per-tile VMEM budget for the dopri45 state. The dominant live set is the
# exact-trace tangent block (H, n_tan*TB) held across the 7 tableau stages:
# measured 29.7M at (F=64, H=64, TB=256), exactly 7*H*F*TB*4 bytes — the
# scoped-vmem limit is 16M, so the tile shrinks (min 128 lanes) and
# structures that cannot fit even at 128 are REJECTED to the XLA path
# (exact traces at F ~ 64 belong to Hutchinson, the FFJORD at-scale mode).
_CNF_VMEM_BUDGET = 13_000_000


def _cnf_tb(cfg, hmax):
    n_tan = cfg["F"] if cfg["exact"] else 1
    tb = _TB_CNF
    while tb > 128 and 7 * hmax * n_tan * tb * 4 > _CNF_VMEM_BUDGET:
        tb //= 2
    return tb

# Continuous-adjoint consistency gate (see _cnf_sample_bwd): max abs gap
# allowed between the re-integrated endpoint x(1) and the saved base draw z.
# Standard-normal scale, mirroring ift._SOLVE_ATOL for the iterative tier.
_REINT_ATOL = 1e-2

# Dormand-Prince 4(5) tableau (matches zuko_tpu.utils and the reference's
# zuko/utils.py:443-497)
from ..utils import _DP_A, _DP_B4, _DP_B5, _DP_C  # noqa: E402


# ----------------------------------------------------------------- extraction


def extract_cnf_params(module, transform, c=None):
    """Validate a built CNF transform and pull kernel parameters.

    ``transform`` is the ComposedTransform returned by the lazy layer: it
    must hold exactly one FreeFormJacobianTransform over `_ffj_dynamics`
    whose ODE net is a plain Linear/ELU MLP (no LayerNorm, no stacking) —
    anything else raises :class:`FusedStructureError` so dispatch falls back
    to the XLA path. Returns ``(ws, bs, freqs, c_vec, eps_key, cfg)``.
    """
    from ..flows.continuous import _ffj_dynamics
    from ..nn import Activation, Linear
    from ..transforms import ComposedTransform, FreeFormJacobianTransform

    if isinstance(transform, ComposedTransform):
        if len(transform.transforms) != 1:
            raise FusedStructureError(
                "fused CNF kernels require a single-transform flow"
            )
        t = transform.transforms[0]
    else:
        t = transform
    if type(t) is not FreeFormJacobianTransform or t.f is not _ffj_dynamics:
        raise FusedStructureError(
            "fused CNF kernels require a FreeFormJacobianTransform over the"
            f" CNF dynamics, got {type(t).__name__}"
        )
    if (t.t0, t.t1) != (0.0, 1.0):
        raise FusedStructureError(
            f"fused CNF density integrates t=0..1, got ({t.t0}, {t.t1})"
        )
    if not t.exact and t.key is None:
        raise FusedStructureError("Hutchinson trace requires a PRNG key")

    phi = t.phi
    ode, freqs, c_phi = phi["ode"], phi["freqs"], phi["c"]
    if isinstance(freqs, jax.core.Tracer):
        raise FusedStructureError("traced time-embedding frequencies")
    freqs = np.asarray(freqs)

    ws, bs = [], []
    expect_linear = True
    for layer in ode.layers:
        if expect_linear:
            if not isinstance(layer, Linear) or layer.weight.ndim != 2:
                raise FusedStructureError(
                    "fused CNF kernels require a plain (unstacked) Linear"
                    f" MLP, got {type(layer).__name__}"
                )
            if layer.bias is None:
                raise FusedStructureError("fused CNF kernels require biases")
            ws.append(layer.weight)
            bs.append(layer.bias)
            expect_linear = False
        else:
            if not isinstance(layer, Activation) or layer.fn is not jax.nn.elu:
                raise FusedStructureError(
                    "fused CNF kernels support ELU activations only, got"
                    f" {type(layer).__name__}"
                )
            expect_linear = True
    if expect_linear or len(ws) < 1:
        raise FusedStructureError("unexpected ODE-net layer structure")

    F = ws[-1].shape[0]
    C = 0 if c_phi is None else int(np.shape(c_phi)[-1])
    nf = freqs.shape[0]
    if ws[0].shape[1] != 2 * nf + F + C:
        raise FusedStructureError(
            f"ODE-net input width {ws[0].shape[1]} != 2*{nf} + {F} + {C}"
        )

    _require_standard_base(module, F)
    cfg = {
        "F": F, "C": C, "nf": nf,
        "atol": float(t.atol), "rtol": float(t.rtol),
        "max_steps": int(t.max_steps),
        "exact": bool(t.exact), "scale": float(t.trace_scale),
        "freqs": tuple(float(f) for f in freqs),
    }
    if t.exact:
        # VMEM feasibility gate (see _CNF_VMEM_BUDGET): the exact-trace
        # tangent block at the minimum 128-lane tile must fit, else the
        # kernel would fail to compile — fall back to the XLA path loudly
        hmax = max(int(w.shape[0]) for w in ws)
        if 7 * hmax * F * 128 * 4 > _CNF_VMEM_BUDGET:
            raise FusedStructureError(
                f"exact-trace CNF tangents (F={F}, hidden {hmax}) exceed "
                "the kernel VMEM budget even at the minimum tile — use "
                "exact=False (Hutchinson, the FFJORD at-scale trace) for "
                "the fused path; falling back to XLA"
            )
    return ws, bs, c_phi, t.key, cfg


# ------------------------------------------------- reference math (jnp path)


def _net_apply(u, ws, bs):
    """The ODE net on the last axis — exactly nn.MLP(Linear/ELU)."""
    h = u
    n = len(ws)
    for i, (W, b) in enumerate(zip(ws, bs)):
        h = h @ W.T + b
        if i < n - 1:
            h = jax.nn.elu(h)
    return h


def _ref_integrate(x, eps, ws, bs, c, cfg, t0, t1):
    """The XLA-path math with explicit parameters: augmented global-batch
    dopri45 via utils.odeint, exact-jvp or Hutchinson trace — numerically
    identical to FreeFormJacobianTransform.call_and_ladj
    (reference: zuko/transforms.py:1147-1179). Returns the endpoint state
    and ``scale * ladj`` of the (t0 -> t1) map."""
    from ..utils import broadcast, odeint

    F = cfg["F"]
    scale = cfg["scale"]
    freqs = jnp.asarray(cfg["freqs"], x.dtype)

    def g_of(t, p):
        def g(u):
            te = freqs * t[..., None]
            te = jnp.concatenate([jnp.cos(te), jnp.sin(te)], axis=-1)
            if p["c"] is None:
                parts = broadcast(te, u, ignore=1)
            else:
                parts = broadcast(te, u, p["c"], ignore=1)
            return _net_apply(jnp.concatenate(parts, axis=-1), p["w"], p["b"])
        return g

    def f_aug(t, state, p):
        xt, _ = state
        g = g_of(t, p)
        if cfg["exact"]:
            basis = jnp.eye(F, dtype=xt.dtype)

            def column(e):
                return jax.jvp(g, (xt,), (jnp.broadcast_to(e, xt.shape),))

            dxs, jes = jax.vmap(column)(basis)
            dx = dxs[0]
            trace = jnp.einsum("i...i->...", jes)
        else:
            dx, jeps = jax.jvp(g, (xt,), (p["eps"],))
            trace = jnp.sum(jeps * p["eps"], axis=-1)
        return dx, trace * scale

    phi = {"w": list(ws), "b": list(bs), "c": c}
    if not cfg["exact"]:
        phi["eps"] = eps
    ladj0 = jnp.zeros(x.shape[:-1], x.dtype)
    return odeint(
        f_aug, (x, ladj0), t0, t1,
        phi=phi, atol=cfg["atol"], rtol=cfg["rtol"],
        max_steps=cfg["max_steps"],
    )


def _ref_log_prob(x, eps, ws, bs, c, cfg):
    F, scale = cfg["F"], cfg["scale"]
    y, ladj = _ref_integrate(x, eps, ws, bs, c, cfg, 0.0, 1.0)
    lp = -0.5 * jnp.sum(y * y, axis=-1) - 0.5 * F * _LOG_2PI
    return lp + ladj / scale


def _ref_sample(z, eps, ws, bs, c, cfg, want_log_prob):
    F, scale = cfg["F"], cfg["scale"]
    if not want_log_prob:
        # plain inverse: un-augmented integration, exactly
        # FreeFormJacobianTransform.inverse (error control over x only)
        from ..utils import broadcast, odeint

        freqs = jnp.asarray(cfg["freqs"], z.dtype)

        def f_dyn(t, u, p):
            te = freqs * t[..., None]
            te = jnp.concatenate([jnp.cos(te), jnp.sin(te)], axis=-1)
            if p["c"] is None:
                parts = broadcast(te, u, ignore=1)
            else:
                parts = broadcast(te, u, p["c"], ignore=1)
            return _net_apply(jnp.concatenate(parts, axis=-1), p["w"], p["b"])

        return odeint(
            f_dyn, z, 1.0, 0.0, phi={"w": list(ws), "b": list(bs), "c": c},
            atol=cfg["atol"], rtol=cfg["rtol"], max_steps=cfg["max_steps"],
        )
    x, ladj = _ref_integrate(z, eps, ws, bs, c, cfg, 1.0, 0.0)
    lp = -0.5 * jnp.sum(z * z, axis=-1) - 0.5 * F * _LOG_2PI
    return x, lp - ladj / scale


# ----------------------------------------------------------------- kernel math


def _elu(z):
    # Mosaic lowers no expm1 (jax.nn.elu uses it) — explicit where/exp form
    return jnp.where(z > 0.0, z, jnp.exp(jnp.minimum(z, 0.0)) - 1.0)


def _elu_d(z):
    # ELU'(z) = 1 for z > 0 else exp(z)
    return jnp.where(z > 0.0, 1.0, jnp.exp(jnp.minimum(z, 0.0)))


def _dot(W, u):
    return jax.lax.dot_general(
        W, u, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.promote_types(W.dtype, u.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )


def _cnf_tile_integrate(xT, epsT, params, cfg, reverse=False, with_trace=True):
    """Adaptive dopri45 of the augmented system on one (F, TB) tile; returns
    the final state and ``scale * integral`` of the trace along the
    integration direction. ``reverse=True`` integrates t: 1 -> 0 (the
    sampling direction; reference: FreeFormJacobianTransform.inv swaps the
    bounds, zuko/transforms.py:1129-1138).

    ``params``: [W1_x (H1, F), W1_te (H1, 2nf), b1_eff (H1,),
    W2, b2, ..., Wn, bn] — the context contribution is folded into b1_eff
    outside the kernel (it does not depend on x or t)."""
    F = cfg["F"]
    exact = cfg["exact"]
    freqs = cfg["freqs"]
    scale = cfg["scale"]
    atol, rtol = cfg["atol"], cfg["rtol"]
    max_steps = cfg["max_steps"]
    dtype = xT.dtype

    W1_x, W1_te, b1 = params[0], params[1], params[2]
    rest = params[3:]
    TB = xT.shape[1]
    n_tan = F if exact else 1

    if not with_trace:
        V0 = None
    elif exact:
        # V0: F identity blocks along lanes — V0[r, j*TB + k] = (r == j)
        r = jax.lax.broadcasted_iota(jnp.int32, (F, F * TB), 0)
        blk = jax.lax.broadcasted_iota(jnp.int32, (F, F * TB), 1) // TB
        V0 = jnp.where(r == blk, 1.0, 0.0).astype(dtype)
    else:
        V0 = epsT  # (F, TB)

    def tile_lanes(a):
        # (H, TB) -> (H, n_tan*TB) by repetition along lanes
        if n_tan == 1:
            return a
        return jnp.concatenate([a] * n_tan, axis=1)

    def f_aug(s, xt):
        """dx (F, TB) and d(ladj*scale) (1, TB) at tile state xt, in
        normalized time s (t = 1 - s and a -1 Jacobian factor when
        integrating in reverse — exactly utils.odeint's normalization)."""
        t = 1.0 - s if reverse else s
        # time-embedding bias: nf cos + nf sin scalar-weighted columns;
        # b1 is (H,) or per-row (H, TB) (batched context)
        te_b = None
        for k, fk in enumerate(freqs):
            term = (
                W1_te[:, k] * jnp.cos(fk * t)
                + W1_te[:, len(freqs) + k] * jnp.sin(fk * t)
            )
            te_b = term if te_b is None else te_b + term
        b1c = b1[:, None] if b1.ndim == 1 else b1
        h = _dot(W1_x, xt) + b1c + te_b[:, None]
        v = None if V0 is None else _dot(W1_x, V0)
        n = len(rest) // 2
        for i in range(n):
            W, b = rest[2 * i], rest[2 * i + 1]
            if v is not None:
                v = _dot(W, tile_lanes(_elu_d(h)) * v)
            h = _dot(W, _elu(h)) + b[:, None]
        # h: dx (F, TB); v: tangent outputs (F, n_tan*TB)
        if v is None:
            tr = jnp.zeros((1, xt.shape[1]), xt.dtype)
        elif exact:
            tr = None
            for j in range(F):
                tj = v[j : j + 1, j * TB : (j + 1) * TB]
                tr = tj if tr is None else tr + tj
        else:
            tr = jnp.sum(epsT * v, axis=0, keepdims=True)
        if reverse:
            # the (t1 - t0) = -1 normalized-time Jacobian factor
            return -h, -(tr * scale)
        return h, tr * scale

    def dp_step(x, l, t, dt):
        # tableau entries as python floats: numpy f64 scalars would break
        # weak typing (f32 carries promote to f64 under the x64 test mode)
        kxs, kls = [], []
        for i in range(7):
            xi, li = x, l
            for j in range(i):
                a = float(_DP_A[i, j])
                if a != 0.0:
                    xi = xi + (dt * a) * kxs[j]
                    li = li + (dt * a) * kls[j]
            kx, kl = f_aug(t + float(_DP_C[i]) * dt, xi)
            kxs.append(kx)
            kls.append(kl)
        x5, l5 = x, l
        ex = jnp.zeros_like(x)
        el = jnp.zeros_like(l)
        for i in range(7):
            b5 = float(_DP_B5[i])
            if b5 != 0.0:
                x5 = x5 + (dt * b5) * kxs[i]
                l5 = l5 + (dt * b5) * kls[i]
            d = float(_DP_B5[i] - _DP_B4[i])
            if d != 0.0:
                ex = ex + (dt * d) * kxs[i]
                el = el + (dt * d) * kls[i]
        return x5, l5, ex, el

    tiny = float(np.finfo(np.float32).tiny)

    def cond(carry):
        _, _, t, _, attempts = carry
        return (t < 1.0) & (attempts < 4 * max_steps)

    def body(carry):
        x, l, t, dt, attempts = carry
        dt = jnp.minimum(dt, 1.0 - t)
        y, ly, ex, el = dp_step(x, l, t, dt)
        tol_x = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(y))
        tol_l = atol + rtol * jnp.maximum(jnp.abs(l), jnp.abs(ly))
        ratio = jnp.maximum(
            jnp.max(jnp.abs(ex) / tol_x), jnp.max(jnp.abs(el) / tol_l)
        )
        ratio = jnp.where(jnp.isnan(ratio), jnp.inf, ratio)
        accept = ratio <= 1.0
        x = jnp.where(accept, y, x)
        l = jnp.where(accept, ly, l)
        t = jnp.where(accept, t + dt, t)
        # 0.9 * ratio**(-1/5) via exp/log — Mosaic lowers no math.powf
        factor = jnp.clip(
            0.9 * jnp.exp(-0.2 * jnp.log(jnp.maximum(ratio, tiny))), 0.1, 10.0
        )
        return x, l, t, dt * factor, attempts + 1

    t0 = jnp.asarray(0.0, dtype)
    dt0 = jnp.asarray(1.0, dtype)
    x, l, t, _, _ = jax.lax.while_loop(
        cond, body, (xT, jnp.zeros((1, TB), dtype), t0, dt0,
                     jnp.asarray(0, jnp.int32))
    )
    # loud failure on budget exhaustion, mirroring utils.odeint
    eps_f = float(np.finfo(np.float32).eps)
    exhausted = t < 1.0 - 64.0 * eps_f
    x = jnp.where(exhausted, jnp.full_like(x, jnp.nan), x)
    l = jnp.where(exhausted, jnp.full_like(l, jnp.nan), l)
    return x, l


def _tile_f_and_tr(t, u, theta, epsT, cfg, want_tr):
    """Tile dynamics f (F, TB) and the UNSCALED trace estimate (1, TB) as a
    pure function of ``(u, theta)`` — the differentiation target of the
    in-kernel continuous adjoint (:func:`_cnf_tile_adjoint`). ``theta`` is
    the `_kernel_params` list [W1_x, W1_te, b1_eff, W2, b2, ...]."""
    F = cfg["F"]
    exact = cfg["exact"]
    freqs = cfg["freqs"]
    TB = u.shape[1]
    dtype = u.dtype

    W1_x, W1_te, b1 = theta[0], theta[1], theta[2]
    rest = theta[3:]

    te_b = None
    for k, fk in enumerate(freqs):
        term = (
            W1_te[:, k] * jnp.cos(fk * t)
            + W1_te[:, len(freqs) + k] * jnp.sin(fk * t)
        )
        te_b = term if te_b is None else te_b + term
    b1c = b1[:, None] if b1.ndim == 1 else b1
    h = _dot(W1_x, u) + b1c + te_b[:, None]
    v = None
    n_tan = 1
    if want_tr:
        if exact:
            n_tan = F
            r = jax.lax.broadcasted_iota(jnp.int32, (F, F * TB), 0)
            blk = jax.lax.broadcasted_iota(jnp.int32, (F, F * TB), 1) // TB
            V0 = jnp.where(r == blk, 1.0, 0.0).astype(dtype)
        else:
            V0 = epsT
        v = _dot(W1_x, V0)

    def tile_lanes(a):
        if n_tan == 1:
            return a
        return jnp.concatenate([a] * n_tan, axis=1)

    n = len(rest) // 2
    for i in range(n):
        W, b = rest[2 * i], rest[2 * i + 1]
        if v is not None:
            v = _dot(W, tile_lanes(_elu_d(h)) * v)
        h = _dot(W, _elu(h)) + b[:, None]

    if not want_tr:
        return h
    if exact:
        tr = None
        for j in range(F):
            tj = v[j : j + 1, j * TB : (j + 1) * TB]
            tr = tj if tr is None else tr + tj
    else:
        tr = jnp.sum(epsT * v, axis=0, keepdims=True)
    return h, tr


def _cnf_tile_adjoint(xT, aT, glq, epsT, params, cfg, want_lp):
    """In-kernel continuous adjoint on one tile: integrate

    .. math:: \\dot u = f,\\quad \\dot a = -\\partial_u(a^\\top f
        - \\bar L\\,\\mathrm{tr}),\\quad
        \\dot g_\\theta = -\\partial_\\theta(a^\\top f - \\bar L\\,\\mathrm{tr})

    from the solved sample tile (t = 0) back to the base draw (t = 1) with
    an adaptive dopri45 over the whole (u, a, g_theta) pytree — the same
    system `_cnf_sample_bwd`'s XLA fallback solves with utils.odeint, kept
    entirely in VMEM (the pullbacks are jax.vjp through the hand-written
    tile dynamics, traced before Mosaic lowering). Returns
    ``(u1, a1, gtheta)``: the re-integrated endpoint (the solve-consistency
    gate's input), the x-cotangent, and per-tile parameter cotangents
    (summed over the tile's rows; the wrapper sums over tiles)."""
    atol, rtol = cfg["atol"], cfg["rtol"]
    max_steps = cfg["max_steps"]
    dtype = xT.dtype
    # one dtype across the whole carry: mixed f32 params under the f64 test
    # mode would break the while_loop's carry typing
    theta = [p.astype(dtype) for p in params]
    aT = aT.astype(dtype)
    if glq is not None:
        glq = glq.astype(dtype)
    if epsT is not None:
        epsT = epsT.astype(dtype)

    def adj_f(s, state):
        u, a, _ = state
        if want_lp:
            (du, _tr), pull = jax.vjp(
                lambda u_, th_: _tile_f_and_tr(s, u_, th_, epsT, cfg, True),
                u, theta,
            )
            da, dth = pull((a, -glq))
        else:
            du, pull = jax.vjp(
                lambda u_, th_: _tile_f_and_tr(s, u_, th_, epsT, cfg, False),
                u, theta,
            )
            da, dth = pull(a)
        return (du, -da, [-g for g in dth])

    gth0 = [jnp.zeros_like(p) for p in theta]
    state0 = (xT, aT, gth0)
    flat0, treedef = jax.tree_util.tree_flatten(state0)

    def f_flat(s, flat):
        d = adj_f(s, jax.tree_util.tree_unflatten(treedef, flat))
        return jax.tree_util.tree_flatten(d)[0]

    def dp_step(flat, t, dt):
        ks = []
        for i in range(7):
            si = flat
            for j in range(i):
                a = float(_DP_A[i, j])
                if a != 0.0:
                    si = [x + (dt * a) * k for x, k in zip(si, ks[j])]
            ks.append(f_flat(t + float(_DP_C[i]) * dt, si))
        y5 = flat
        err = [jnp.zeros_like(x) for x in flat]
        for i in range(7):
            b5 = float(_DP_B5[i])
            if b5 != 0.0:
                y5 = [x + (dt * b5) * k for x, k in zip(y5, ks[i])]
            d = float(_DP_B5[i] - _DP_B4[i])
            if d != 0.0:
                err = [e + (dt * d) * k for e, k in zip(err, ks[i])]
        return y5, err

    tiny = float(np.finfo(np.float32).tiny)

    def cond(carry):
        _, t, _, attempts = carry
        return (t < 1.0) & (attempts < 4 * max_steps)

    def body(carry):
        flat, t, dt, attempts = carry
        dt = jnp.minimum(dt, 1.0 - t)
        y, err = dp_step(flat, t, dt)
        ratio = None
        for x, yv, e in zip(flat, y, err):
            tol = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(yv))
            r = jnp.max(jnp.abs(e) / tol)
            ratio = r if ratio is None else jnp.maximum(ratio, r)
        ratio = jnp.where(jnp.isnan(ratio), jnp.inf, ratio)
        accept = ratio <= 1.0
        flat = [jnp.where(accept, yv, x) for x, yv in zip(flat, y)]
        t = jnp.where(accept, t + dt, t)
        factor = jnp.clip(
            0.9 * jnp.exp(-0.2 * jnp.log(jnp.maximum(ratio, tiny))), 0.1, 10.0
        )
        return flat, t, dt * factor, attempts + 1

    t0 = jnp.asarray(0.0, dtype)
    dt0 = jnp.asarray(1.0, dtype)
    flat, t, _, _ = jax.lax.while_loop(
        cond, body, (flat0, t0, dt0, jnp.asarray(0, jnp.int32))
    )
    eps_f = float(np.finfo(np.float32).eps)
    exhausted = t < 1.0 - 64.0 * eps_f
    flat = [jnp.where(exhausted, jnp.full_like(x, jnp.nan), x) for x in flat]
    u1, a1, gth = jax.tree_util.tree_unflatten(treedef, flat)
    return u1, a1, gth


def _cnf_adjoint_kernel(*refs, n_params, cfg, want_lp):
    """Pallas wrapper of `_cnf_tile_adjoint`: inputs
    [x, a, (glq), (eps), (b1 tile — batched context), params...]; outputs
    [u1, dz, gtheta...] (the bias-shaped gradient outputs carry a leading
    length-1 axis; a batched b1's gradient is a per-row (H, TB) tile)."""
    i = 0
    xT = refs[i][...]; i += 1
    aT = refs[i][...]; i += 1
    glq = None
    if want_lp:
        glq = refs[i][...]; i += 1
    epsT = None
    if not cfg["exact"]:
        epsT = refs[i][...]; i += 1
    b1T = None
    if cfg.get("bc"):
        b1T = refs[i][...]; i += 1
    params = [refs[i + k][...] for k in range(n_params)]
    i += n_params
    if b1T is not None:
        params = params[:2] + [b1T] + params[2:]
    u1, a1, gth = _cnf_tile_adjoint(xT, aT, glq, epsT, params, cfg, want_lp)
    refs[i][...] = u1
    refs[i + 1][...] = a1
    for k, g in enumerate(gth):
        refs[i + 2 + k][...] = g.reshape(refs[i + 2 + k].shape)


def _cnf_tile_math(xT, epsT, params, cfg):
    """Density on one tile: integrate x forward (t: 0 -> 1), return
    log_prob (1, TB) = N(0,I) log-density at the endpoint plus the ladj."""
    F, scale = cfg["F"], cfg["scale"]
    z, l = _cnf_tile_integrate(xT, epsT, params, cfg, reverse=False)
    lp = -0.5 * jnp.sum(z * z, axis=0, keepdims=True) - 0.5 * F * _LOG_2PI
    return lp + l / scale


def _cnf_tile_sample_math(zT, epsT, params, cfg, want_log_prob):
    """Sampling on one tile: integrate base draws backward (t: 1 -> 0);
    with ``want_log_prob``, log q(x) = base.log_prob(z) - ladj of the
    inverse map (reference: zuko/distributions.py:129-138). The plain
    inverse skips the tangent work entirely (un-augmented integration,
    matching FreeFormJacobianTransform.inverse)."""
    F, scale = cfg["F"], cfg["scale"]
    x, l = _cnf_tile_integrate(
        zT, epsT, params, cfg, reverse=True, with_trace=want_log_prob
    )
    if not want_log_prob:
        return x
    lp = -0.5 * jnp.sum(zT * zT, axis=0, keepdims=True) - 0.5 * F * _LOG_2PI
    return x, lp - l / scale


def _split_aug(tile, params, cfg):
    """Split a kernel data tile into (x rows, params-with-b1): with a
    batched context (``cfg["bc"] = H``) the tile carries the per-row folded
    first bias below the F data rows and the streamed params list has no
    b1 entry (see `_kernel_params`)."""
    F = cfg["F"]
    H = cfg.get("bc", 0)
    if not H:
        return tile, params
    return tile[:F], params[:2] + [tile[F : F + H]] + params[2:]


def _cnf_kernel(*refs, n_params, cfg):
    if cfg["exact"]:
        x_ref, params = refs[0], [refs[1 + i][...] for i in range(n_params)]
        out_ref = refs[1 + n_params]
        xt, params = _split_aug(x_ref[...], params, cfg)
        out_ref[...] = _cnf_tile_math(xt, None, params, cfg)
    else:
        x_ref, eps_ref = refs[0], refs[1]
        params = [refs[2 + i][...] for i in range(n_params)]
        out_ref = refs[2 + n_params]
        xt, params = _split_aug(x_ref[...], params, cfg)
        out_ref[...] = _cnf_tile_math(xt, eps_ref[...], params, cfg)


def _cnf_sample_kernel(*refs, n_params, cfg, want_log_prob):
    if cfg["exact"]:
        z_ref, params = refs[0], [refs[1 + i][...] for i in range(n_params)]
        zt, params = _split_aug(z_ref[...], params, cfg)
        out = _cnf_tile_sample_math(zt, None, params, cfg, want_log_prob)
        base = 1 + n_params
    else:
        z_ref, eps_ref = refs[0], refs[1]
        params = [refs[2 + i][...] for i in range(n_params)]
        zt, params = _split_aug(z_ref[...], params, cfg)
        out = _cnf_tile_sample_math(
            zt, eps_ref[...], params, cfg, want_log_prob
        )
        base = 2 + n_params
    if want_log_prob:
        refs[base][...], refs[base + 1][...] = out
    else:
        refs[base][...] = out


# ----------------------------------------------------------------- public API


def fused_cnf_log_prob(module, transform, x, c=None):
    r"""Compute the CNF density with one fused Pallas kernel per batch tile
    (XLA-path math off-TPU). Differentiable via a custom VJP whose backward
    runs the XLA path's global-step augmented integration (so gradients are
    exactly the XLA path's; the kernel forward agrees to solver tolerance —
    both discretize the same continuous system to ``atol``/``rtol``)."""
    ws, bs, c_phi, key, cfg = extract_cnf_params(module, transform, c)
    if x.shape[-1] != cfg["F"]:
        raise FusedStructureError(
            f"x has {x.shape[-1]} features, flow has {cfg['F']}"
        )
    if cfg["exact"]:
        eps = jnp.zeros((), x.dtype)  # unused placeholder
    else:
        # the XLA path's probe exactly (zuko/transforms.py:1171-1172)
        eps = jax.random.normal(key, x.shape, x.dtype)
    flat = []
    for W, b in zip(ws, bs):
        flat += [W, b]
    static = _StaticCfg(cfg)
    return _cnf_op(static, x, eps, c_phi, *flat)


class _StaticCfg:
    """Hashable wrapper so cfg can ride as a nondiff argument."""

    def __init__(self, cfg):
        self.cfg = cfg
        self._key = tuple(sorted((k, v) for k, v in cfg.items()))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _StaticCfg) and self._key == other._key


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _cnf_op(static, x, eps, c, *flat):
    return _cnf_impl(static, x, eps, c, *flat)


def _cnf_fwd(static, x, eps, c, *flat):
    return _cnf_impl(static, x, eps, c, *flat), (x, eps, c, flat)


def _cnf_bwd(static, res, g):
    x, eps, c, flat = res
    cfg = static.cfg

    def ref(x, c, fp):
        ws = [fp[2 * i] for i in range(len(fp) // 2)]
        bs = [fp[2 * i + 1] for i in range(len(fp) // 2)]
        return _ref_log_prob(x, eps, ws, bs, c, cfg)

    if c is None:
        _, vjp = jax.vjp(lambda x, fp: ref(x, None, fp), x, flat)
        dx, dfp = vjp(g)
        return (dx, jnp.zeros_like(eps), None, *dfp)
    _, vjp = jax.vjp(ref, x, c, flat)
    dx, dc, dfp = vjp(g)
    return (dx, jnp.zeros_like(eps), dc, *dfp)


_cnf_op.defvjp(_cnf_fwd, _cnf_bwd)


def _kernel_params(ws, bs, c, cfg):
    """Split the first layer into x / time-embedding / context columns
    (dynamics input order: [te, x, c] — zuko_tpu/flows/continuous.py:30-34);
    the context contribution folds into the first bias. With a BATCHED
    context the folded bias is per-row ``(*B, H)`` — the callers then
    stream it through the kernel alongside the data rows instead of
    pinning it in VMEM."""
    F, C, nf = cfg["F"], cfg["C"], cfg["nf"]
    W1 = ws[0]
    W1_te = W1[:, : 2 * nf]
    W1_x = W1[:, 2 * nf : 2 * nf + F]
    b1_eff = bs[0]
    if C:
        b1_eff = b1_eff + c.astype(W1.dtype) @ W1[:, 2 * nf + F :].T
    params = [W1_x, W1_te, b1_eff]
    for W, b in zip(ws[1:], bs[1:]):
        params += [W, b]
    return params


def _batched_aug(xf, b1):
    """Kernel-path preamble for a batched context: broadcast the data rows
    against the per-row folded bias, flatten both, and concatenate the bias
    columns below the data columns (rows and their parameters then tile —
    and row-chunk — together). Returns
    ``(aug (n, F+H), batch_shape, H)``."""
    F = xf.shape[-1]
    H = b1.shape[-1]
    xb = jnp.broadcast_shapes(xf.shape[:-1], b1.shape[:-1])
    xf = jnp.broadcast_to(xf, xb + (F,))
    b1f = jnp.broadcast_to(b1, xb + (H,)).astype(xf.dtype)
    aug = jnp.concatenate(
        [xf.reshape(-1, F), b1f.reshape(-1, H)], axis=-1
    )
    return aug, xb, H


def _cnf_impl(static, x, eps, c, *flat):
    cfg = static.cfg
    F, C = cfg["F"], cfg["C"]
    ws = [flat[2 * i] for i in range(len(flat) // 2)]
    bs = [flat[2 * i + 1] for i in range(len(flat) // 2)]

    if not _use_pallas_fused(x.dtype):
        return _ref_log_prob(x, eps, ws, bs, c, cfg)

    params = _kernel_params(ws, bs, c, cfg)

    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, F) if params[2].ndim == 1 else x
    W = F
    if params[2].ndim > 1:  # batched context: stream b1 rows with the data
        xf, batch_shape, H = _batched_aug(x, params[2])
        if not cfg["exact"]:
            eps = jnp.broadcast_to(eps, batch_shape + (F,))
        params = params[:2] + params[3:]
        cfg = {**cfg, "bc": H}
        W = F + H
    tb = _cnf_tb(cfg, max(int(w.shape[0]) for w in ws))
    n = xf.shape[0]
    pad = (-n) % tb
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    m = xf.shape[0]

    n_params = len(params)
    param_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for p in params
    ]
    in_specs = [pl.BlockSpec((W, tb), lambda i: (0, i), memory_space=pltpu.VMEM)]
    args = [xf.T]
    if not cfg["exact"]:
        ef = eps.reshape(-1, F)
        if pad:
            ef = jnp.pad(ef, ((0, pad), (0, 0)))
        in_specs.append(
            pl.BlockSpec((F, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(ef.T)

    out = pl.pallas_call(
        functools.partial(_cnf_kernel, n_params=n_params, cfg=cfg),
        grid=(m // tb,),
        in_specs=in_specs + param_specs,
        out_specs=pl.BlockSpec((1, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m), x.dtype),
    )(*args, *params)
    out = out[0, :n] if pad else out[0, :]
    return out.reshape(batch_shape)


def _prep_cnf_sample(module, transform, key, sample_shape, c, want_log_prob):
    """Extract params, draw the base z (and the Hutchinson probe at z's
    shape) and pack the flat differentiable-args calling convention shared
    by the plain and custom-VJP sample ops."""
    ws, bs, c_phi, tkey, cfg = extract_cnf_params(module, transform, c)
    F = cfg["F"]
    try:  # match the base distribution's dtype so draws equal flow.sample's
        dtype = jnp.asarray(module.base.args[0]).dtype
    except (AttributeError, IndexError):
        dtype = ws[0].dtype
    # a batched context (*, C) contributes its batch dims AFTER the draw
    # shape, matching the XLA path's `sample_shape + batch_shape + event`
    cbatch = tuple(c_phi.shape[:-1]) if c_phi is not None else ()
    z = jax.random.normal(key, tuple(sample_shape) + cbatch + (F,), dtype)
    if cfg["exact"]:
        eps = jnp.zeros((), dtype)  # unused placeholder
    else:
        # the XLA inverse path's probe at z (zuko/transforms.py:1171-1172)
        eps = jax.random.normal(tkey, z.shape, dtype)
    flat = []
    for W, b in zip(ws, bs):
        flat += [W, b]
    static = _StaticCfg({**cfg, "want_lp": bool(want_log_prob)})
    return static, z, eps, c_phi, flat


def fused_cnf_sample(module, transform, key, sample_shape, c=None,
                     want_log_prob=False):
    r"""Draw CNF samples with one fused kernel per batch tile: base draws
    integrated backward (t: 1 -> 0) through the adaptive dopri45 loop with
    the ODE net in VMEM; with ``want_log_prob`` the same pass accumulates
    ``log q(x) = base.log_prob(z) - ladj`` of the inverse map (the
    reverse-KL quantity, reference: zuko/distributions.py:129-138).
    Non-differentiable — :func:`fused_cnf_rsample` wraps the same forward
    in a continuous-adjoint custom VJP."""
    static, z, eps, c_phi, flat = _prep_cnf_sample(
        module, transform, key, sample_shape, c, want_log_prob
    )
    return _cnf_sample_impl(static, z, eps, c_phi, *flat)


def fused_cnf_rsample(module, transform, key, sample_shape, c=None,
                      want_log_prob=False):
    r"""Differentiable fused CNF sampling via the continuous adjoint.

    Forward: the fused per-tile dopri45 kernel of :func:`fused_cnf_sample`
    (un-augmented for plain draws, trace-augmented with ``want_log_prob``).
    Backward: ONE augmented adjoint integration (FFJORD / neural-ODE
    adjoint; reference semantics: zuko/distributions.py:129-138 backed by
    the discrete adjoint of zuko/utils.py:515-593) of the system

    .. math::
       \dot x = f, \quad
       \dot a = -\partial_x(a^\top f - \bar L\,\mathrm{tr}), \quad
       \dot{\bar\theta} = -\partial_\theta(a^\top f - \bar L\,\mathrm{tr})

    from the solved sample x(0) back to the base draw z = x(1), with
    :math:`a(0) = \bar x` and :math:`\bar L` the log-q cotangent. This
    replaces the XLA path's forward integration + stored-step discrete
    adjoint with a fused forward + a single fresh adaptive solve; gradients
    agree with the discrete adjoint to solver tolerance (they discretize
    the same continuous adjoint). The backward checks that its
    re-integrated endpoint lands back on the base draw ``z`` within
    :data:`_REINT_ATOL` and NaN-poisons the gradients otherwise (stiff /
    non-reversible dynamics — see the solve-consistency gate note in
    :func:`_cnf_sample_bwd`)."""
    static, z, eps, c_phi, flat = _prep_cnf_sample(
        module, transform, key, sample_shape, c, want_log_prob
    )
    return _cnf_sample_op(static, z, eps, c_phi, *flat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _cnf_sample_op(static, z, eps, c, *flat):
    return _cnf_sample_impl(static, z, eps, c, *flat)


def _cnf_sample_fwd(static, z, eps, c, *flat):
    out = _cnf_sample_impl(static, z, eps, c, *flat)
    x = out[0] if static.cfg["want_lp"] else out
    return out, (z, eps, c, flat, x)


def _cnf_adjoint_pallas(x, gx, glq, eps, c, flat, cfg, want_lp):
    """The in-kernel continuous adjoint: one fused dopri45 per batch tile
    over the whole (u, a, g_theta) state (`_cnf_tile_adjoint`). Returns
    ``(u1, a1, gth)`` in the SAME layout as the XLA fallback: gth as
    {"w": [...], "b": [...], "c"?} over the ORIGINAL flat weights (the
    kernel's split first-layer gradients are reassembled, and the context
    gradient recovered from the folded first bias)."""
    F, C, nf = cfg["F"], cfg["C"], cfg["nf"]
    nw = len(flat) // 2
    ws = [flat[2 * i] for i in range(nw)]
    bs = [flat[2 * i + 1] for i in range(nw)]
    params = _kernel_params(ws, bs, c, cfg)
    dtype = x.dtype

    tb = _cnf_tb(cfg, max(int(w.shape[0]) for w in ws))
    xf = x.reshape(-1, F)
    af = gx.reshape(-1, F).astype(dtype)
    n = xf.shape[0]
    pad = (-n) % tb

    bc = params[2].ndim > 1  # batched context: per-row folded first bias
    b1f = None
    if bc:
        H = params[2].shape[-1]
        b1f = jnp.broadcast_to(
            params[2], x.shape[:-1] + (H,)
        ).reshape(-1, H).astype(dtype)
        params = params[:2] + params[3:]
        cfg = {**cfg, "bc": H}
    n_params = len(params)

    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        af = jnp.pad(af, ((0, pad), (0, 0)))
        if bc:
            b1f = jnp.pad(b1f, ((0, pad), (0, 0)))
    m = xf.shape[0]
    G = m // tb

    tile_spec = pl.BlockSpec((F, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    in_specs = [tile_spec, tile_spec]
    args = [xf.T, af.T]
    if want_lp:
        lqf = glq.reshape(-1).astype(dtype)
        if pad:
            lqf = jnp.pad(lqf, (0, pad))
        in_specs.append(pl.BlockSpec((1, tb), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(lqf[None, :])
    if not cfg["exact"]:
        ef = jnp.broadcast_to(eps, x.shape).reshape(-1, F)
        if pad:
            ef = jnp.pad(ef, ((0, pad), (0, 0)))
        in_specs.append(tile_spec)
        args.append(ef.T)
    b1_spec = None
    if bc:
        b1_spec = pl.BlockSpec((H, tb), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        in_specs.append(b1_spec)
        args.append(b1f.T)
    in_specs += [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in params
    ]

    out_specs = [tile_spec, tile_spec]
    out_shape = [jax.ShapeDtypeStruct((F, m), dtype),
                 jax.ShapeDtypeStruct((F, m), dtype)]
    # gtheta outputs follow the kernel's theta order: [W1_x, W1_te,
    # (b1 per-row tile when batched), rest...]; unbatched entries are
    # per-tile partials summed after the call
    theta_like = params[:2] + ([b1f] if bc else []) + params[2:]
    for j, p in enumerate(theta_like):
        if bc and j == 2:
            out_specs.append(b1_spec)
            out_shape.append(jax.ShapeDtypeStruct((H, m), dtype))
            continue
        shp = p.shape if p.ndim == 2 else (1,) + p.shape
        out_specs.append(pl.BlockSpec(
            (1,) + shp, lambda i, nd=len(shp): (i,) + (0,) * nd,
            memory_space=pltpu.VMEM,
        ))
        out_shape.append(jax.ShapeDtypeStruct((G,) + shp, dtype))

    out = pl.pallas_call(
        functools.partial(_cnf_adjoint_kernel, n_params=n_params, cfg=cfg,
                          want_lp=want_lp),
        grid=(G,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
    )(*args, *params)

    u1 = out[0].T[:n]
    a1 = out[1].T[:n]

    if not bc:
        gks = [jnp.sum(o, axis=0).reshape(p.shape)
               for o, p in zip(out[2:], params)]
        gW1_x, gW1_te, gb1 = gks[0], gks[1], gks[2]
        cols = [gW1_te, gW1_x]
        gc = None
        if C:
            cvec = c.astype(dtype)
            cols.append(gb1[:, None] * cvec[None, :])
            gc = flat[0][:, 2 * nf + F :].T.astype(dtype) @ gb1
        gw = [jnp.concatenate(cols, axis=1)] + [gks[3 + 2 * i]
                                                for i in range(nw - 1)]
        gb = [gb1] + [gks[4 + 2 * i] for i in range(nw - 1)]
        gth = {"w": gw, "b": gb}
        if c is not None:
            gth["c"] = gc
        return u1, a1, gth

    # batched context: the per-row b1 gradient unfolds into gb1 (summed),
    # the W1 context columns, and the per-row context gradient
    gW1_x = jnp.sum(out[2], axis=0).reshape(params[0].shape)
    gW1_te = jnp.sum(out[3], axis=0).reshape(params[1].shape)
    gb1_rows = out[4].T[:n]                           # (n, H)
    gks_rest = [jnp.sum(o, axis=0).reshape(p.shape)
                for o, p in zip(out[5:], params[2:])]
    W1_c = flat[0][:, 2 * nf + F :].astype(dtype)     # (H, C)
    c_rows = jnp.broadcast_to(
        c, x.shape[:-1] + (C,)
    ).reshape(-1, C).astype(dtype)
    gb1 = jnp.sum(gb1_rows, axis=0)
    gW1_c = jnp.matmul(gb1_rows.T, c_rows,
                       precision=jax.lax.Precision.HIGHEST)
    gc_rows = jnp.matmul(gb1_rows, W1_c,
                         precision=jax.lax.Precision.HIGHEST)
    gc = gc_rows.reshape(x.shape[:-1] + (C,))
    k = (x.ndim - 1) - (jnp.ndim(c) - 1)
    if k:
        gc = jnp.sum(gc, axis=tuple(range(k)))
    gw = [jnp.concatenate([gW1_te, gW1_x, gW1_c], axis=1)] + [
        gks_rest[2 * i] for i in range(nw - 1)
    ]
    gb = [gb1] + [gks_rest[2 * i + 1] for i in range(nw - 1)]
    return u1, a1, {"w": gw, "b": gb, "c": gc}


# In-kernel vs XLA-odeint continuous-adjoint backward (TPU only; the
# fallback is always used off-TPU / in f64). "kernel" keeps the whole
# adjoint integration in VMEM per tile.
_CNF_ADJ = os.environ.get("ZUKO_TPU_CNF_ADJ", "kernel")


def _cnf_sample_bwd(static, res, g):
    """Continuous-adjoint backward: integrate (x, a, grad-accumulators)
    forward in density time t: 0 -> 1 (i.e. from the sample back to the
    base draw) — one fused in-kernel integration per batch tile on TPU
    (`_cnf_adjoint_pallas`), the same system through utils.odeint
    off-TPU; no stored forward steps are needed either way."""
    from ..utils import broadcast, odeint

    z, eps, c, flat, x = res
    cfg = static.cfg
    want_lp = cfg["want_lp"]
    F = cfg["F"]
    freqs_t = cfg["freqs"]

    if want_lp:
        gx, glq = g
    else:
        gx, glq = g, None

    nw = len(flat) // 2

    if _use_pallas_fused(x.dtype) and _CNF_ADJ == "kernel":
        u1, a1, gth = _cnf_adjoint_pallas(
            x, gx, glq, eps, c, flat, cfg, want_lp
        )
        return _cnf_bwd_finish(z, eps, c, flat, cfg, want_lp, glq, u1, a1, gth)

    theta = {
        "w": [flat[2 * i] for i in range(nw)],
        "b": [flat[2 * i + 1] for i in range(nw)],
    }
    bc = c is not None and jnp.ndim(c) > 1
    if c is not None:
        # a batched context flattens to per-row vectors alongside x; its
        # per-row gradient is reduced back to c's shape below
        theta["c"] = (
            jnp.broadcast_to(c, x.shape[:-1] + c.shape[-1:]).reshape(
                -1, c.shape[-1]
            )
            if bc else c
        )

    xf = x.reshape(-1, F)
    af = gx.reshape(-1, F).astype(xf.dtype)

    phi = {"theta": theta}
    if want_lp:
        phi["glq"] = glq.reshape(-1).astype(xf.dtype)
        if not cfg["exact"]:
            phi["eps"] = eps.reshape(-1, F)

    def net(t, u, th):
        freqs = jnp.asarray(freqs_t, u.dtype)
        te = freqs * jnp.asarray(t, u.dtype)[..., None]
        te = jnp.concatenate([jnp.cos(te), jnp.sin(te)], axis=-1)
        cth = th.get("c")
        if cth is None:
            parts = broadcast(te, u, ignore=1)
        else:
            parts = broadcast(te, u, cth, ignore=1)
        return _net_apply(jnp.concatenate(parts, axis=-1), th["w"], th["b"])

    def f_and_tr(t, u, th, eps_p):
        # dynamics + trace, exactly the forward's trace estimator
        # (zuko/transforms.py:1147-1179 semantics)
        gfun = lambda v: net(t, v, th)  # noqa: E731
        if cfg["exact"]:
            basis = jnp.eye(F, dtype=u.dtype)

            def column(e):
                return jax.jvp(gfun, (u,), (jnp.broadcast_to(e, u.shape),))

            dxs, jes = jax.vmap(column)(basis)
            return dxs[0], jnp.einsum("i...i->...", jes)
        du, jeps = jax.jvp(gfun, (u,), (eps_p,))
        return du, jnp.sum(jeps * eps_p, axis=-1)

    def adj_dyn(t, state, p):
        u, a, _ = state
        th = p["theta"]
        if want_lp:
            (du, _tr), pull = jax.vjp(
                lambda u_, th_: f_and_tr(t, u_, th_, p.get("eps")), u, th
            )
            da, dth = pull((a, -p["glq"]))
        else:
            du, pull = jax.vjp(lambda u_, th_: net(t, u_, th_), u, th)
            da, dth = pull(a)
        return (
            du,
            jax.tree.map(jnp.negative, da),
            jax.tree.map(jnp.negative, dth),
        )

    gth0 = jax.tree.map(jnp.zeros_like, theta)
    u1, a1, gth = odeint(
        adj_dyn, (xf, af, gth0), 0.0, 1.0, phi=phi,
        atol=cfg["atol"], rtol=cfg["rtol"], max_steps=cfg["max_steps"],
    )
    if bc:
        gc = gth["c"].reshape(x.shape[:-1] + c.shape[-1:])
        k = (x.ndim - 1) - (jnp.ndim(c) - 1)
        gth["c"] = jnp.sum(gc, axis=tuple(range(k))) if k else gc

    return _cnf_bwd_finish(z, eps, c, flat, cfg, want_lp, glq, u1, a1, gth)


def _cnf_bwd_finish(z, eps, c, flat, cfg, want_lp, glq, u1, a1, gth):
    """Shared tail of both adjoint backends: the solve-consistency gate and
    the cotangent assembly.

    Gate (the ift._SOLVE_ATOL analog for the continuous tier): the adjoint
    re-integrates the sample x(0) forward to t=1, which must land back on
    the saved base draw z. Stiff / effectively non-reversible dynamics make
    this re-integration diverge — the classic neural-ODE adjoint
    instability — and the co-integrated adjoints are then garbage. Per-row
    theta contributions are not separable after the fact (gth is
    batch-summed inside the vjp pulls), so failures are made LOUD instead
    of silently wrong: bad rows NaN-poison dz, and any bad row NaN-poisons
    the theta/context gradients."""
    F = cfg["F"]
    err = jnp.max(jnp.abs(u1 - z.reshape(-1, F)), axis=-1)
    ok = err <= jnp.asarray(_REINT_ATOL, err.dtype)
    nan = jnp.asarray(jnp.nan, a1.dtype)
    all_ok = jnp.all(ok)
    gth = jax.tree.map(lambda gr: jnp.where(all_ok, gr, nan), gth)

    dz = jnp.where(ok[:, None], a1, nan)
    if want_lp:
        # the base log N(z) term of log q (reference:
        # zuko/distributions.py:129-138) depends on z directly
        dz = dz - glq.reshape(-1).astype(dz.dtype)[:, None] * z.reshape(-1, F)
    dz = dz.reshape(z.shape).astype(z.dtype)
    dc = gth.get("c") if c is not None else None
    if dc is not None:
        dc = dc.astype(c.dtype)
    dflat = []
    for i, (W, b) in enumerate(zip(gth["w"], gth["b"])):
        dflat += [W.astype(flat[2 * i].dtype), b.astype(flat[2 * i + 1].dtype)]
    return (dz, jnp.zeros_like(eps), dc, *dflat)


_cnf_sample_op.defvjp(_cnf_sample_fwd, _cnf_sample_bwd)


def _cnf_sample_impl(static, z, eps, c, *flat):
    cfg = static.cfg
    want_log_prob = cfg["want_lp"]
    F = cfg["F"]
    dtype = z.dtype
    nw = len(flat) // 2
    ws = [flat[2 * i] for i in range(nw)]
    bs = [flat[2 * i + 1] for i in range(nw)]
    eps_in = None if cfg["exact"] else eps

    if not _use_pallas_fused(dtype):
        return _ref_sample(z, eps_in, ws, bs, c, cfg, want_log_prob)

    params = _kernel_params(ws, bs, c, cfg)
    W = F
    if params[2].ndim > 1:  # batched context: stream b1 rows with the draws
        zf, _, H = _batched_aug(z, params[2])
        params = params[:2] + params[3:]
        cfg = {**cfg, "bc": H}
        W = F + H
    else:
        zf = z.reshape(-1, F)
    tb = _cnf_tb(cfg, max(int(w.shape[0]) for w in ws))
    n = zf.shape[0]
    pad = (-n) % tb
    if pad:
        zf = jnp.pad(zf, ((0, pad), (0, 0)))
    m = zf.shape[0]

    n_params = len(params)
    param_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for p in params
    ]
    in_specs = [pl.BlockSpec((W, tb), lambda i: (0, i), memory_space=pltpu.VMEM)]
    args = [zf.T]
    if not cfg["exact"]:
        ef = eps.reshape(-1, F)
        if pad:
            ef = jnp.pad(ef, ((0, pad), (0, 0)))
        in_specs.append(
            pl.BlockSpec((F, tb), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(ef.T)

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
            _cnf_sample_kernel, n_params=n_params, cfg=cfg,
            want_log_prob=want_log_prob,
        ),
        grid=(m // tb,),
        in_specs=in_specs + param_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*args, *params)

    if want_log_prob:
        x, lq = out
        x = x.T[:n] if pad else x.T
        lq = lq[0, :n] if pad else lq[0, :]
        return x.reshape(z.shape), lq.reshape(z.shape[:-1])
    out = out.T[:n] if pad else out.T
    return out.reshape(z.shape)
