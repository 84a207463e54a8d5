r"""Differentiable fused sampling via the implicit function theorem.

The reference's ``rsample`` / ``rsample_and_log_prob`` (the reverse-KL
workhorse, zuko/distributions.py:121-138) differentiate *through* the
autoregressive inverse — ``passes`` sequential hyper-network sweeps per layer
whose unrolled backward dominates the VI train step ~15:1 over the fused
forward (PERF.md). The TPU-native form avoids differentiating the solve
entirely:

* **forward**: the non-differentiable fused Pallas sampler solves
  :math:`x = T^{-1}(z;\phi)` (and optionally the fused
  :math:`\log q(x)`) at kernel speed;
* **backward**: by the implicit function theorem on :math:`T(x;\phi) = z`,

  .. math::
     \bar z = J^{-\top}\bar x, \qquad
     \bar\phi = -\big(\partial T/\partial\phi\big)^{\top} J^{-\top}\bar x,

  where :math:`J = \partial T/\partial x` is **triangular by
  autoregressivity** with diagonal :math:`d_i = \exp(\mathrm{ladj}_i)` (the
  univariate derivative — the MADE masks guarantee the hyper parameters of
  feature :math:`i` never see :math:`x_i`). Per layer, the transposed
  triangular system :math:`J_l^\top u = v` is solved by the *nilpotent*
  fixed-point iteration :math:`u \leftarrow (v - (J_l^\top - D)u)/d` — exact
  after ``passes`` iterations for exactly the same reason the forward
  fixed-point inverse is exact after ``passes`` sweeps (the strictly
  triangular part has nilpotency index = the dependency depth; reference:
  zuko/transforms.py:994-1000). Each iteration is ONE transposed layer pass
  (a vjp of the jnp layer math), so the whole backward costs
  :math:`\sum_l \mathrm{passes}_l` transposed passes + one parameter
  pullback per layer — no unrolled scan, no solver differentiation.

With ``want_log_prob`` the primal returns the kernel's fused
:math:`\log q(x)` (z-consistent with the solve — the r10/r11 precision
rule), and the backward folds its cotangent in exactly:
:math:`\log q = \ell(x(\phi,z), \phi)` for the density function
:math:`\ell`, so

.. math::
   \bar\phi \mathrel{+}= \bar L\,\partial\ell/\partial\phi, \qquad
   v = \bar x + \bar L\,\partial\ell/\partial x

is fed to the same triangular-solve chain.

Covers every family :func:`zuko_tpu.ops.nsf_fused.extract_nsf_params`
accepts: NSF/NCSF (rqs/crqs), MAF (affine), SOSPF/BPF (sosp/bernstein,
including their softclip interleaves) — plus, via the NAF/UNAF tier at the
bottom of this module, every structure
:func:`zuko_tpu.ops.naf_fused.extract_naf_params` accepts (monotone-net
and UMNN stages; their solved roots carry the solver eps, so gradients
match the XLA path to solver tolerance rather than f64-exactly).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

from . import nsf_fused as nf

__all__ = [
    "fused_gf_rsample",
    "fused_gf_rsample_and_log_prob",
    "fused_naf_rsample",
    "fused_naf_rsample_and_log_prob",
    "fused_nsf_rsample",
    "fused_nsf_rsample_and_log_prob",
]

# Precision of the triangular-solve ITERATIONS (sweep 3). The solve is a
# linear system solved exactly by nilpotency, so running its J^T
# applications at the single-bf16-pass speed perturbs the solved operator
# by ~1e-3 relative — below the measured f32 gradient noise floor vs CPU
# f64 truth (3.3e-3, tools/tpu_validate_r49.py) — while the march, the
# density backward, and the parameter pullbacks stay at the split3
# accuracy default. "fast" = 1-pass iterations, "match" = the density
# precision everywhere. Default "fast" since r62: with the spline-vjp
# chain gone from the iterations (the r58 G-materialization) they are
# hyper-matmul-dominated, and 1-pass buys ~8% on the flagship VI step
# (5.73M vs 5.24M samples/s) at bit-identical measured f32 gradient
# accuracy (2.518e-3 vs CPU both ways); in the f64 test mode the 1-pass
# dot is f64-exact, so the exactness contract is unchanged.
_ITER_PREC = os.environ.get("ZUKO_TPU_IFT_ITER", "fast")

# Solve-consistency gate for the IFT backward. The implicit function
# theorem needs T(x) = z at the solved point; iterative inverses (NAF's
# bisection+Newton, the polynomial coarse+Newton) PEG at the +-bound
# bracket edge for unreachable tail targets (~1e-4 of standard-normal
# draws at 16K batches), where the forward march wanders off the solve
# orbit and the triangular algebra amplifies into O(1) garbage gradients
# (r59: 2 pegged rows drove the worst-leaf error from 3e-3 to 3.7e-1).
# Rows whose reconstruction misses z by more than this tolerance get ZERO
# cotangent — a clipped solve has no meaningful pathwise gradient there
# (the analytic-inverse families, rqs/crqs/affine, never trip this: their
# out-of-domain branch is an exact identity).
_SOLVE_ATOL = 1e-2


def _solve_consistency_mask(zhat, zT, xbar, lbar, atol=_SOLVE_ATOL):
    """Zero the cotangents of rows where the marched forward ``zhat``
    misses the base draw ``zT`` (pegged/failed solves). Returns masked
    ``(xbar_T, lbar_row)`` in transposed layout: (F, n) and (1, n)|None.

    ``atol`` must sit above the march's own reconstruction noise: 1e-2
    for the f32-exact precisions; callers on the 1-pass bf16 march
    (ZUKO_TPU_DENSITY_PREC=fast) pass 1e-1 so bf16 noise cannot zero
    valid rows."""
    ok = (
        jnp.max(jnp.abs(zhat - zT), axis=0, keepdims=True) < atol
    ).astype(zhat.dtype)                        # (1, n)
    xbar_T = xbar.T * ok
    lrow = lbar[None, :] * ok if lbar is not None else None
    return xbar_T, lrow


def fused_nsf_rsample(flow, key, sample_shape, c=None,
                      want_log_prob: bool = False):
    r"""Differentiable fused sampling: the fused Pallas solve forward, an
    implicit-function-theorem custom VJP backward (triangular-transpose
    solves per layer — see the module docstring). Gradients match
    differentiating the XLA scan inverse (reference semantics:
    zuko/distributions.py:121-138) to solver tolerance.

    With ``want_log_prob`` also returns the fused, equally differentiable
    ``log q(x)`` — the reverse-KL path."""
    flat_params, layout, statics, z_shape, zc, F, C, dtype = nf._prep_sample(
        flow, key, sample_shape, c
    )
    K, univ, bound, slope, base = statics
    out = _ift_op(
        layout, F, C, K, bound, slope, univ, base, want_log_prob, zc,
        *flat_params,
    )
    if want_log_prob:
        x, lp = out
        return x.reshape(z_shape), lp.reshape(z_shape[:-1])
    return out.reshape(z_shape)


def fused_nsf_rsample_and_log_prob(flow, key, sample_shape, c=None):
    return fused_nsf_rsample(flow, key, sample_shape, c=c, want_log_prob=True)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8)
)
def _ift_op(layout, F, C, K, bound, slope, univ, base, want_log_prob, zc,
            *flat_params):
    return nf._sample_core(
        layout, F, C, K, bound, slope, univ, base, want_log_prob, zc,
        list(flat_params),
    )


def _ift_fwd(layout, F, C, K, bound, slope, univ, base, want_log_prob, zc,
             *flat_params):
    out = nf._sample_core(
        layout, F, C, K, bound, slope, univ, base, want_log_prob, zc,
        list(flat_params),
    )
    x = out[0] if want_log_prob else out
    return out, (zc, x, flat_params)


def _row_chunked_bwd(math_fn, want_log_prob, res, cot):
    """Shared backward driver: unpack cotangents and row-chunk the math on
    TPU (the same shape-class caution as the density backward,
    `nsf_fused._fused_bwd`, against the documented big-batch XLA:TPU
    miscompile — and smaller programs pipeline better).

    ``math_fn(zc, x, xbar, lbar, flat_params) -> (dzc, dfp_tuple)``."""
    zc, x, flat_params = res
    if want_log_prob:
        xbar, lbar = cot
    else:
        xbar, lbar = cot, None

    rows = zc.shape[0]
    if rows > nf._BWD_CHUNK and jax.default_backend() not in ("cpu", "gpu"):
        n_chunks = -(-rows // nf._BWD_CHUNK)
        pad = n_chunks * nf._BWD_CHUNK - rows

        def padded(a, zero_cot):
            if not pad:
                return a
            if zero_cot:  # zero cotangent on pad rows: no grad contribution
                fill = jnp.zeros((pad,) + a.shape[1:], a.dtype)
            else:  # repeat valid rows (well-defined inputs, sliced off)
                fill = a[:pad]
            return jnp.concatenate([a, fill], axis=0)

        def chunks(a, zero_cot=False):
            a = padded(a, zero_cot)
            return a.reshape((n_chunks, nf._BWD_CHUNK) + a.shape[1:])

        carry = (
            chunks(zc), chunks(x), chunks(xbar, zero_cot=True),
            None if lbar is None else chunks(lbar, zero_cot=True),
        )

        def one(ch):
            zcc, xc, xb, lb = ch
            return math_fn(zcc, xc, xb, lb, flat_params)

        if lbar is None:
            dzc_ch, dfp_ch = jax.lax.map(
                lambda ch: one(ch + (None,)), carry[:3]
            )
        else:
            dzc_ch, dfp_ch = jax.lax.map(one, carry)
        dzc = dzc_ch.reshape((n_chunks * nf._BWD_CHUNK,) + dzc_ch.shape[2:])
        dzc = dzc[:rows]
        dfp = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), dfp_ch)
        return (dzc, *dfp)

    dzc, dfp = math_fn(zc, x, xbar, lbar, flat_params)
    return (dzc, *dfp)


def _ift_bwd(layout, F, C, K, bound, slope, univ, base, want_log_prob, res,
             cot):
    return _row_chunked_bwd(
        functools.partial(
            _ift_bwd_math, layout, F, C, K, bound, slope, univ, base,
            raw=(want_log_prob == "raw"),
        ),
        want_log_prob, res, cot,
    )


_ift_op.defvjp(_ift_fwd, _ift_bwd)


def _ift_bwd_math(layout, F, C, K, bound, slope, univ, base, zc, x, xbar,
                  lbar, flat_params, raw=False):
    """The IFT backward on flat rows: cotangents ``xbar (n, F)`` (and
    ``lbar (n,)`` for the fused log q) -> ``(dzc (n, F+C), dflat_params)``.

    Three sweeps sharing ONE x-linearization per layer (the round-3 r52
    restructuring — a wholesale ``jax.vjp`` of the density re-linearized the
    whole flow and paid a second W-shaped pullback per layer):

    1. **march**: x_l = T_l(x_{l-1}) with `jax.vjp`, storing each layer's
       pullback, elementwise ladj, and input;
    2. **density backward** (only with ``lbar``): the log-q cotangent
       g_l = d(lbar·logq)/dx_l runs x_L -> x_0 through the SAME pullbacks
       with ladj-cotangent ``lbar`` (logq = base(x_L) + sum_l s_l);
    3. **IFT forward**: v = xbar + g_0 chains through one
       transposed-triangular solve per layer (nilpotent iteration, exact
       after ``passes``), and each layer takes a single merged parameter
       pullback with cotangents (g_l - u_l, lbar·1) — the density's
       parameter gradient and -(dT/dphi)^T u in one call."""
    xT = x.T                                    # (F, n) solved samples
    cT = zc[:, F:].T if C else None
    # mirror the density path's precision rule (`_full_math_T`)
    prec = (
        jax.lax.Precision.HIGHEST if univ in ("sosp", "bernstein")
        else nf._DENSITY_HYPER_PREC
    )

    dfp = [jnp.zeros_like(p) for p in flat_params]
    gcT = jnp.zeros_like(cT) if C else None
    per_layer = nf._split_layers(list(flat_params), layout)

    # ---- sweep 1: march + linearize -----------------------------------
    # Each AR layer splits as y = S(x, h), h = H(x): S is the univariate
    # map, DIAGONAL in x at fixed h (y_f depends on x_f and on h rows
    # [t*F + f] only), H is the masked hyper-net. The march stores the two
    # pullbacks separately AND materializes S's whole h-sensitivity in ONE
    # extra pullback — pull_s((1, 0)) returns (d, G) with d the univariate
    # derivative diagonal and G[t*F+f] = dy_f/dh_{t,f}, because every h
    # entry feeds exactly one output feature. The triangular-solve
    # iterations then apply J^T u = d*u + H'(x)^T (G * tile(u)) with NO
    # per-iteration spline vjp chain — elementwise + the hyper backward
    # only (the r57 lever: the spline vjp dominated each iteration).
    recs = []
    xcur = xT
    for entry in per_layer:
        if entry[0] == "softclip":
            recs.append(("softclip", entry[1], xcur))
            q = jnp.abs(xcur / entry[1])
            xcur = xcur / (1.0 + q)
            continue
        tag, ps, passes = entry
        ps = tuple(ps)

        if C:
            def layer_f(xT_, ps_, cT_):
                h = nf._hyper_T(
                    xT_, cT_, list(ps_), precision=prec, barrier=True
                )
                return nf._univ_forward_F(xT_, h, F, K, bound, slope, univ)

            h, pull_h = jax.vjp(
                lambda xx: nf._hyper_T(
                    xx, cT, list(ps), precision=prec, barrier=True
                ),
                xcur,
            )
        else:
            def layer_f(xT_, ps_):
                h = nf._hyper_T(
                    xT_, None, list(ps_), precision=prec, barrier=True
                )
                return nf._univ_forward_F(xT_, h, F, K, bound, slope, univ)

            h, pull_h = jax.vjp(
                lambda xx: nf._hyper_T(
                    xx, None, list(ps), precision=prec, barrier=True
                ),
                xcur,
            )
        (ynext, ladj), pull_s = jax.vjp(
            lambda xx, hh: nf._univ_forward_F(
                xx, hh, F, K, bound, slope, univ
            ),
            xcur, h,
        )
        d_vec, G = pull_s((jnp.ones_like(ynext), jnp.zeros_like(ladj)))

        pull_h_it = pull_h
        if _ITER_PREC == "fast" and prec == "split3":
            # a single-bf16-pass hyper linearization drives ONLY the
            # triangular-solve iterations (see _ITER_PREC note above)
            _, pull_h_it = jax.vjp(
                lambda xx: nf._hyper_T(xx, cT, list(ps), precision=None),
                xcur,
            )
        recs.append((
            "ar", (ps, passes, layer_f, xcur), pull_h, pull_s, ladj,
            d_vec, G, pull_h_it,
        ))
        xcur = ynext

    # Pegged/failed solves contribute zero (see _SOLVE_ATOL); xcur after
    # the march is the reconstruction T(x)
    xbarT, lrow = _solve_consistency_mask(
        xcur, zc[:, :F].T, xbar, lbar,
        atol=1e-1 if prec is None else _SOLVE_ATOL,
    )

    # ---- sweep 2: density backward for g_l = d(lbar logq)/dx_l --------
    # g_out[i] is the cotangent at layer i's OUTPUT (already lbar-scaled)
    g_out = [None] * len(recs)
    g0 = None
    if lbar is not None:
        if raw or base[0] != "normal":
            # raw mode: lbar is the cotangent of the BARE sum-ladj (the
            # inverted-flow density ingredient) — no base term;
            # box: piecewise-constant density, zero gradient a.e.
            g = jnp.zeros_like(xcur)
        else:
            g = -xcur * lrow                    # d base.logpdf / dx_L
        for i in reversed(range(len(recs))):
            g_out[i] = g
            kind = recs[i][0]
            if kind == "softclip":
                B, xin = recs[i][1], recs[i][2]
                q = jnp.abs(xin / B)
                # dy/dx = (1+q)^-2 ; d ladj/dx = -2 sign(x)/(B (1+q))
                g = g / (1.0 + q) ** 2 \
                    - 2.0 * jnp.sign(xin) / (B * (1.0 + q)) * lrow
            else:
                pull_h, pull_s, ladj = recs[i][2], recs[i][3], recs[i][4]
                gxs, gh = pull_s((g, jnp.broadcast_to(lrow, ladj.shape)))
                (gxh,) = pull_h(gh)
                g = gxs + gxh
        g0 = g

    # ---- sweep 3: triangular solves + merged parameter pullbacks ------
    v = xbarT if g0 is None else xbarT + g0     # (F, n)
    idx = 0
    for i, rec in enumerate(recs):
        if rec[0] == "softclip":
            B, xin = rec[1], rec[2]
            q = jnp.abs(xin / B)
            v = v * (1.0 + q) ** 2              # J diagonal: u = v / d
            continue
        (ps, passes, layer_f, xin), ladj, d, G, pull_h_it = (
            rec[1], rec[4], rec[5], rec[6], rec[7],
        )
        # d is the autodiff diagonal (== exp(ladj) to roundoff); using it
        # for BOTH the division and the J^T application keeps the
        # nilpotent-iteration algebra exactly consistent
        T_rows = G.shape[0] // F
        zero_l = jnp.zeros_like(ladj)

        def it(_, u):
            # J^T u = d*u + H'(x)^T (G * tile(u)): the strictly-triangular
            # part rides the hyper backward only (see the sweep-1 note)
            gh = G * jnp.concatenate([u] * T_rows, axis=0)
            (ju_lower,) = pull_h_it(gh)
            return (v - ju_lower) / d

        # u0 = v/d is the first iteration (from u=0); `passes` total are
        # exact by nilpotency of the strictly triangular part
        u = v / d
        n_it = min(int(passes), F)
        if n_it - 1 > 6:  # roll long solves (the program-size rule)
            u = jax.lax.fori_loop(0, n_it - 1, it, u)
        else:
            for _ in range(n_it - 1):
                u = it(0, u)

        # merged parameter (and context) pullback:
        # phibar_l = (dT_l/dphi)^T (g_l - u_l) + lbar * ds_l/dphi
        ycot = g_out[i] - u if g_out[i] is not None else -u
        lcot = (
            jnp.broadcast_to(lrow, ladj.shape)
            if lbar is not None else zero_l
        )
        if C:
            _, pull_p = jax.vjp(
                lambda ps_, cc: layer_f(xin, ps_, cc), ps, cT
            )
            gps, gcc = pull_p((ycot, lcot))
            gcT = gcT + gcc
        else:
            _, pull_p = jax.vjp(lambda ps_: layer_f(xin, ps_), ps)
            (gps,) = pull_p((ycot, lcot))
        for j, g in enumerate(gps):
            dfp[idx + j] = dfp[idx + j] + g

        idx += len(ps)
        v = u

    dz = v.T                                    # zbar = J^{-T} xbar
    dzc = jnp.concatenate([dz, gcT.T], axis=-1) if C else dz
    return dzc, tuple(dfp)


# ------------------------------------------------------- NAF / UNAF tier
#
# Same implicit-function-theorem backward over naf_fused's stage structure:
# each AR stage is y = S(x, h), h = H(x) with S the per-feature monotone
# net (MNN) or its quadrature integral (UMNN) — S is diagonal in x at
# fixed h, and h rows [f*T : (f+1)*T] feed exactly feature f (FEATURE-major,
# unlike nsf_fused's param-major layout — hence jnp.repeat, not tile, for
# the G application). The forward runs the fused bisection+Newton kernel;
# the solved root carries the solver eps (~1e-6), so gradients match the
# XLA path to solver tolerance rather than f64-exactly (reference
# semantics: zuko/distributions.py:121-138 over zuko/transforms.py:609-637).


def fused_naf_rsample(flow, key, sample_shape, c=None,
                      want_log_prob: bool = False):
    r"""Differentiable fused NAF/UNAF sampling: the fused solve forward
    (`naf_fused.fused_naf_sample` kernel), an IFT custom VJP backward with
    per-stage transposed-triangular solves and materialized monotone-net
    sensitivities (see `_ift_bwd_math`'s G note)."""
    from . import naf_fused as nafm

    flat_params, layout, z_shape, zc, F, C, S, dtype = nafm._prep_naf_sample(
        flow, key, sample_shape, c
    )
    out = _naf_ift_op(layout, F, C, S, want_log_prob, zc, *flat_params)
    if want_log_prob:
        x, lp = out
        return x.reshape(z_shape), lp.reshape(z_shape[:-1])
    return out.reshape(z_shape)


def fused_naf_rsample_and_log_prob(flow, key, sample_shape, c=None):
    return fused_naf_rsample(flow, key, sample_shape, c=c,
                             want_log_prob=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _naf_ift_op(layout, F, C, S, want_log_prob, zc, *flat_params):
    from . import naf_fused as nafm

    return nafm._naf_sample_core(
        layout, F, C, S, want_log_prob, zc, list(flat_params)
    )


def _naf_ift_fwd(layout, F, C, S, want_log_prob, zc, *flat_params):
    from . import naf_fused as nafm

    out = nafm._naf_sample_core(
        layout, F, C, S, want_log_prob, zc, list(flat_params)
    )
    x = out[0] if want_log_prob else out
    return out, (zc, x, flat_params)


def _naf_ift_bwd(layout, F, C, S, want_log_prob, res, cot):
    return _row_chunked_bwd(
        functools.partial(_naf_ift_bwd_math, layout, F, C, S),
        want_log_prob, res, cot,
    )


_naf_ift_op.defvjp(_naf_ift_fwd, _naf_ift_bwd)


def _naf_ift_bwd_math(layout, F, C, S, zc, x, xbar, lbar, flat_params):
    """The IFT backward over NAF stages — the three-sweep structure of
    `_ift_bwd_math` on naf_fused's (made, mono) stage params."""
    from . import naf_fused as nafm

    xT = x.T                                    # (F, n) solved samples
    cT = zc[:, F:].T if C else None
    HI = jax.lax.Precision.HIGHEST              # the NAF solver/density rule

    dfp = [jnp.zeros_like(p) for p in flat_params]
    gcT = jnp.zeros_like(cT) if C else None

    def make_s(d, mono_w, mono_b):
        kind2 = d.get("kind", "mnn")
        T = S if kind2 == "mnn" else S + 1

        def s_f(xx, hh):
            sig_all = jnp.concatenate(
                [hh[f * T : f * T + S, :] for f in range(F)], axis=0
            )
            pre1, w1x = nafm._hoist_first_layer(
                sig_all, mono_w, mono_b, F, S, barrier=True
            )
            f_vg = (
                nafm._mono_vg_hoisted if kind2 == "mnn"
                else nafm._umnn_vg_hoisted
            )
            val, g = f_vg(xx, pre1, w1x, mono_w, mono_b, F, barrier=True)
            if kind2 == "umnn":
                consts = jnp.concatenate(
                    [hh[f * T + S : f * T + S + 1, :] for f in range(F)],
                    axis=0,
                )
                val = val + consts
            return val, nf._log_ladj(g)

        return s_f, T

    # ---- sweep 1: march + linearize -----------------------------------
    recs = []
    xcur = xT
    idx = 0
    for kind, v in layout:
        if kind == "softclip":
            recs.append(("softclip", v, xcur))
            q = jnp.abs(xcur / v)
            xcur = xcur / (1.0 + q)
            continue
        d = dict(v)
        nmade, L = d["n_made"], len(d["mono_dims"])
        count = 3 * nmade + 2 * L
        ps = tuple(flat_params[idx : idx + count])
        made = list(ps[: 3 * nmade])
        mono_w = list(ps[3 * nmade : 3 * nmade + L])
        mono_b = list(ps[3 * nmade + L :])
        s_f, T = make_s(d, mono_w, mono_b)

        h, pull_h = jax.vjp(
            lambda xx: nafm._hyper_T(xx, cT, made, precision=HI), xcur
        )
        (ynext, ladj), pull_s = jax.vjp(s_f, xcur, h)
        d_vec, G = pull_s((jnp.ones_like(ynext), jnp.zeros_like(ladj)))

        recs.append((
            "ar", (ps, d, idx, count, xcur), pull_h, pull_s, ladj,
            d_vec, G, T,
        ))
        idx += count
        xcur = ynext

    # Pegged/failed solves contribute zero (see _SOLVE_ATOL); xcur after
    # the march is the reconstruction T(x)
    xbarT, lrow = _solve_consistency_mask(xcur, zc[:, :F].T, xbar, lbar)

    # ---- sweep 2: density backward for g_l = d(lbar logq)/dx_l --------
    g_out = [None] * len(recs)
    g0 = None
    if lbar is not None:
        g = -xcur * lrow                        # standard-normal base (pinned)
        for i in reversed(range(len(recs))):
            g_out[i] = g
            if recs[i][0] == "softclip":
                B, xin = recs[i][1], recs[i][2]
                q = jnp.abs(xin / B)
                g = g / (1.0 + q) ** 2 \
                    - 2.0 * jnp.sign(xin) / (B * (1.0 + q)) * lrow
            else:
                pull_h, pull_s, ladj = recs[i][2], recs[i][3], recs[i][4]
                gxs, gh = pull_s((g, jnp.broadcast_to(lrow, ladj.shape)))
                (gxh,) = pull_h(gh)
                g = gxs + gxh
        g0 = g

    # ---- sweep 3: triangular solves + merged parameter pullbacks ------
    v = xbarT if g0 is None else xbarT + g0     # (F, n)
    for i, rec in enumerate(recs):
        if rec[0] == "softclip":
            B, xin = rec[1], rec[2]
            q = jnp.abs(xin / B)
            v = v * (1.0 + q) ** 2              # J diagonal: u = v / d
            continue
        (ps, d, idx0, count, xin), pull_h = rec[1], rec[2]
        ladj, d_vec, G, T = rec[4], rec[5], rec[6], rec[7]
        zero_l = jnp.zeros_like(ladj)

        def it(_, u):
            gh = G * jnp.repeat(u, T, axis=0)   # feature-major h layout
            (ju_lower,) = pull_h(gh)
            return (v - ju_lower) / d_vec

        u = v / d_vec
        n_it = min(int(d["passes"]), F)
        if n_it - 1 > 6:  # roll long solves (the program-size rule)
            u = jax.lax.fori_loop(0, n_it - 1, it, u)
        else:
            for _ in range(n_it - 1):
                u = it(0, u)

        # merged parameter (and context) pullback
        ycot = g_out[i] - u if g_out[i] is not None else -u
        lcot = (
            jnp.broadcast_to(lrow, ladj.shape)
            if lbar is not None else zero_l
        )
        nmade, L = d["n_made"], len(d["mono_dims"])

        def layer_ps(ps_, cc):
            made_ = list(ps_[: 3 * nmade])
            s2, _ = make_s(
                d, list(ps_[3 * nmade : 3 * nmade + L]),
                list(ps_[3 * nmade + L :]),
            )
            hh = nafm._hyper_T(xin, cc, made_, precision=HI)
            return s2(xin, hh)

        if C:
            _, pull_p = jax.vjp(layer_ps, ps, cT)
            gps, gcc = pull_p((ycot, lcot))
            gcT = gcT + gcc
        else:
            _, pull_p = jax.vjp(lambda ps_: layer_ps(ps_, None), ps)
            (gps,) = pull_p((ycot, lcot))
        for j, g in enumerate(gps):
            dfp[idx0 + j] = dfp[idx0 + j] + g

        v = u

    dz = v.T                                    # zbar = J^{-T} xbar
    dzc = jnp.concatenate([dz, gcT.T], axis=-1) if C else dz
    return dzc, tuple(dfp)


# ------------------------------------------------------------------ GF tier
#
# Gaussianization flows are the EASY IFT case: every layer is either an
# elementwise erf-mixture gaussianization (diagonal Jacobian — the
# triangular solve is a single division) or an orthogonal rotation
# (J^{-T} v = R v exactly, up to the factor's own f32 orthogonality
# roundoff). No nilpotent iteration at all. The pegging hazard is REAL
# here — the erf-mixture saturates and the fused bisection pegs at the
# +-10 bracket for tail targets (the documented GF tail contract) — so
# the solve-consistency gate matters most for this family.


def fused_gf_rsample(flow, key, sample_shape, c=None,
                     want_log_prob: bool = False):
    r"""Differentiable fused GF sampling: the fused bisection kernel
    forward (`gf_fused.fused_gf_sample`), an IFT custom VJP backward of
    diagonal solves + orthogonal-rotation transposes. Batched-context
    per-row parameters ride in the augmented draw rows (the
    `gf_fused._flatten_gf` column layout), so gradients to the hyper
    outputs come back through the zf cotangent's parameter columns."""
    from . import gf_fused as gfm

    flat_params, layout, F, zf, z_shape = gfm._gf_prep_sample(
        flow, key, sample_shape, c
    )
    out = _gf_ift_op(layout, F, want_log_prob, zf, *flat_params)
    if want_log_prob:
        x, lp = out
        return x.reshape(z_shape), lp.reshape(z_shape[:-1])
    return out.reshape(z_shape)


def fused_gf_rsample_and_log_prob(flow, key, sample_shape, c=None):
    return fused_gf_rsample(flow, key, sample_shape, c=c, want_log_prob=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gf_ift_op(layout, F, want_log_prob, zf, *flat_params):
    from . import gf_fused as gfm

    return gfm._gf_sample_core(layout, F, want_log_prob, zf,
                               list(flat_params))


def _gf_ift_fwd(layout, F, want_log_prob, zf, *flat_params):
    from . import gf_fused as gfm

    out = gfm._gf_sample_core(layout, F, want_log_prob, zf,
                              list(flat_params))
    x = out[0] if want_log_prob else out
    return out, (zf, x, flat_params)


def _gf_ift_bwd(layout, F, want_log_prob, res, cot):
    return _row_chunked_bwd(
        functools.partial(_gf_ift_bwd_math, layout, F),
        want_log_prob, res, cot,
    )


_gf_ift_op.defvjp(_gf_ift_fwd, _gf_ift_bwd)


def _gf_ift_bwd_math(layout, F, zc, x, xbar, lbar, flat_params):
    """The IFT backward over GF layers (diagonal gauss + orthogonal rot).

    ``zc`` is the augmented draw matrix ``(n, W)``: base draws in the first
    F columns, then any batched layers' streamed per-row parameter columns
    (the `gf_fused._flatten_gf` layout). Batched layers' parameter
    cotangents are assembled back into the matching columns of the returned
    ``zc`` cotangent; unbatched layers' land in ``dfp``."""
    from . import gf_fused as gfm

    augT = zc.T
    xT = x.T
    dfp = [jnp.zeros_like(p) for p in flat_params]
    dcols = {}  # row offset in augT -> (2*K*F, n) parameter-column cotangent

    # ---- march ---------------------------------------------------------
    recs = []
    xcur = xT
    for st in gfm._gf_stages_T(augT, flat_params, layout, F):
        if st[0] == "gauss":
            _, shift, scale, K, loc = st
            (ynext, ladj), pull = jax.vjp(
                lambda xx, sh, sc, K=K: gfm._gauss_forward_F(xx, sh, sc, K),
                xcur, shift, scale,
            )
            recs.append(("gauss", pull, ladj, loc))
            xcur = ynext
        else:
            _, R, loc = st
            recs.append(("rot", R, xcur, loc))
            xcur = gfm._dot_rot(R, xcur)

    def rot_T(R, g):  # R^T g, f32-exact like the kernel's rotation inverse
        return jax.lax.dot_general(
            R, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.promote_types(R.dtype, g.dtype),
            precision=jax.lax.Precision.HIGHEST,
        )

    xbarT, lrow = _solve_consistency_mask(xcur, augT[:F], xbar, lbar)

    # ---- density backward ----------------------------------------------
    g_out = [None] * len(recs)
    g0 = None
    if lbar is not None:
        g = -xcur * lrow                        # standard-normal base
        for i in reversed(range(len(recs))):
            g_out[i] = g
            if recs[i][0] == "gauss":
                pull, ladj = recs[i][1], recs[i][2]
                gx, _, _ = pull((g, jnp.broadcast_to(lrow, ladj.shape)))
                g = gx
            else:
                g = rot_T(recs[i][1], g)        # |det R| = 1: no lrow term
        g0 = g

    # ---- solves + merged parameter pullbacks ---------------------------
    v = xbarT if g0 is None else xbarT + g0
    for i, rec in enumerate(recs):
        if rec[0] == "gauss":
            pull, ladj, loc = rec[1], rec[2], rec[3]
            u = v / jnp.exp(ladj)               # diagonal solve
            ycot = g_out[i] - u if g_out[i] is not None else -u
            lcot = (
                jnp.broadcast_to(lrow, ladj.shape)
                if lbar is not None else jnp.zeros_like(ladj)
            )
            _, gsh, gsc = pull((ycot, lcot))
            if loc[0] == "p":
                dfp[loc[1]] = dfp[loc[1]] + gsh
                dfp[loc[1] + 1] = dfp[loc[1] + 1] + gsc
            else:  # batched: back into the streamed parameter columns
                dcols[loc[1]] = jnp.concatenate(list(gsh) + list(gsc), axis=0)
            v = u
        else:
            R, xin, loc = rec[1], rec[2], rec[3]
            u = gfm._dot_rot(R, v)              # J^{-T} v = R v (orthogonal)
            ycot = g_out[i] - u if g_out[i] is not None else -u
            # (d(Rx)/dR)^T ycot = ycot x^T
            dfp[loc[1]] = dfp[loc[1]] + jnp.matmul(
                ycot, xin.T, precision=jax.lax.Precision.HIGHEST
            )
            v = u

    if dcols:
        blocks = [v] + [dcols[off] for off in sorted(dcols)]
        return jnp.concatenate(blocks, axis=0).T, tuple(dfp)
    return v.T, tuple(dfp)


# -------------------------------------------------- inverted-flow density
#
# The reference's reverse-KL recipe pre-inverts the flow
# (``Flow(flow.transform.inv, flow.base)``, zuko/lazy.py:81-98). For such a
# flow ``log_prob`` is the SOLVE direction: with u = T^{-1}(x),
# log_prob'(x) = base(u) - sum_ladj_fwd(u). The raw IFT mode returns
# (u, sum_ladj) differentiably — the caller combines with its own base.


def fused_nsf_inverse_and_ladj(flow, x, c=None):
    r"""Differentiable fused inverse at arbitrary targets:
    ``(u, sum_ladj_fwd(u))`` with ``u = T^{-1}(x)`` — the inverted-flow
    density ingredient, via the fused solve forward and the raw-mode IFT
    backward (the sum-ladj cotangent runs the same sweeps with no base
    term)."""
    flat_params, layout, cfg = nf._flatten_flow(flow)
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
        zc = jnp.concatenate([x, c], axis=-1)
    else:
        C = 0
        zc = x

    u, sladj = _ift_op(
        layout, F, C, K, bound, slope, univ, base, "raw",
        zc.reshape(-1, F + C), *flat_params,
    )
    return u.reshape(x.shape), sladj.reshape(x.shape[:-1])
