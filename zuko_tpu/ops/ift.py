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
including their softclip interleaves).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

from . import nsf_fused as nf

__all__ = ["fused_nsf_rsample", "fused_nsf_rsample_and_log_prob"]

# Precision of the triangular-solve ITERATIONS (sweep 3). The solve is a
# linear system solved exactly by nilpotency, so running its J^T
# applications at the single-bf16-pass speed perturbs the solved operator
# by ~1e-3 relative — below the measured f32 gradient noise floor vs CPU
# f64 truth (3.3e-3, tools/tpu_validate_r49.py) — while the march, the
# density backward, and the parameter pullbacks stay at the split3
# accuracy default. "fast" = 1-pass iterations, "match" = the density
# precision everywhere. Default pending the hardware A/B (r54).
_ITER_PREC = os.environ.get("ZUKO_TPU_IFT_ITER", "match")


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


def _ift_bwd(layout, F, C, K, bound, slope, univ, base, want_log_prob, res,
             cot):
    zc, x, flat_params = res
    if want_log_prob:
        xbar, lbar = cot
    else:
        xbar, lbar = cot, None

    rows = zc.shape[0]
    if rows > nf._BWD_CHUNK and jax.default_backend() not in ("cpu", "gpu"):
        # Row-chunk the backward on TPU: the same shape-class caution as the
        # density backward (`nsf_fused._fused_bwd`) against the documented
        # big-batch XLA:TPU miscompile, and smaller programs pipeline better.
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
            return _ift_bwd_math(
                layout, F, C, K, bound, slope, univ, base, zcc, xc, xb, lb,
                flat_params,
            )

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

    dzc, dfp = _ift_bwd_math(
        layout, F, C, K, bound, slope, univ, base, zc, x, xbar, lbar,
        flat_params,
    )
    return (dzc, *dfp)


_ift_op.defvjp(_ift_fwd, _ift_bwd)


def _ift_bwd_math(layout, F, C, K, bound, slope, univ, base, zc, x, xbar,
                  lbar, flat_params):
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

    # ---- sweep 2: density backward for g_l = d(lbar logq)/dx_l --------
    # g_out[i] is the cotangent at layer i's OUTPUT (already lbar-scaled)
    g_out = [None] * len(recs)
    g0 = None
    if lbar is not None:
        lrow = lbar[None, :]                    # (1, n)
        if base[0] == "normal":
            g = -xcur * lrow                    # d base.logpdf / dx_L
        else:  # box: piecewise-constant density, zero gradient a.e.
            g = jnp.zeros_like(xcur)
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
    v = xbar.T if g0 is None else xbar.T + g0   # (F, n)
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
            jnp.broadcast_to(lbar[None, :], ladj.shape)
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
