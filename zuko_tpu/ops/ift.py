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

import jax
import jax.numpy as jnp

from . import nsf_fused as nf

__all__ = ["fused_nsf_rsample", "fused_nsf_rsample_and_log_prob"]


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

    Walks the layers in the FORWARD (x -> z) direction, carrying the
    cotangent ``v`` through one transposed-triangular solve per layer and
    pulling back ``-u`` onto each layer's parameters."""
    xT = x.T                                    # (F, n) solved samples
    cT = zc[:, F:].T if C else None
    # mirror the density path's precision rule (`_full_math_T`)
    prec = (
        jax.lax.Precision.HIGHEST if univ in ("sosp", "bernstein")
        else nf._DENSITY_HYPER_PREC
    )

    dfp = [jnp.zeros_like(p) for p in flat_params]
    gcT = jnp.zeros_like(cT) if C else None
    v = xbar.T                                  # (F, n)

    if lbar is not None:
        # log q cotangent: log q = l(x(phi,z), phi) with l the density —
        # fold dl/dphi in directly and push lbar * dl/dx into the chain.
        if C:
            def density(xT_, fp_, cT_):
                return nf._full_math_T(
                    xT_, list(fp_), layout, F, K, bound, slope, cT_, univ,
                    base, barrier=True,
                )

            _, pull = jax.vjp(density, xT, tuple(flat_params), cT)
            gx, gfp, gcd = pull(lbar[None, :])
            gcT = gcT + gcd
        else:
            def density(xT_, fp_):
                return nf._full_math_T(
                    xT_, list(fp_), layout, F, K, bound, slope, None, univ,
                    base, barrier=True,
                )

            _, pull = jax.vjp(density, xT, tuple(flat_params))
            gx, gfp = pull(lbar[None, :])
        v = v + gx
        dfp = [a + b for a, b in zip(dfp, gfp)]

    idx = 0
    xcur = xT
    for entry in nf._split_layers(list(flat_params), layout):
        if entry[0] == "softclip":
            # diagonal layer: y = x / (1 + |x/B|), d = (1 + |x/B|)^-2
            B = entry[1]
            q = jnp.abs(xcur / B)
            v = v * (1.0 + q) ** 2
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

            (ynext, ladj), pull_x = jax.vjp(
                lambda xx: layer_f(xx, ps, cT), xcur
            )
        else:
            def layer_f(xT_, ps_):
                h = nf._hyper_T(
                    xT_, None, list(ps_), precision=prec, barrier=True
                )
                return nf._univ_forward_F(xT_, h, F, K, bound, slope, univ)

            (ynext, ladj), pull_x = jax.vjp(
                lambda xx: layer_f(xx, ps), xcur
            )

        # J diag: the univariate derivative (positive — monotone increasing)
        d = jnp.exp(ladj)
        zero_l = jnp.zeros_like(ladj)

        def it(_, u):
            (ju,) = pull_x((u, zero_l))
            return (v - ju + d * u) / d

        # u0 = v/d is the first iteration (from u=0); `passes` total are
        # exact by nilpotency of the strictly triangular part
        u = v / d
        n_it = min(int(passes), F)
        if n_it - 1 > 6:  # roll long solves (the program-size rule)
            u = jax.lax.fori_loop(0, n_it - 1, it, u)
        else:
            for _ in range(n_it - 1):
                u = it(0, u)

        # parameter (and context) pullback: -(dT_l/dphi)^T u
        if C:
            _, pull_p = jax.vjp(
                lambda ps_, cc: layer_f(xcur, ps_, cc)[0], ps, cT
            )
            gps, gcc = pull_p(u)
            gcT = gcT - gcc
        else:
            _, pull_p = jax.vjp(lambda ps_: layer_f(xcur, ps_)[0], ps)
            (gps,) = pull_p(u)
        for j, g in enumerate(gps):
            dfp[idx + j] = dfp[idx + j] - g

        idx += len(ps)
        v = u
        xcur = ynext

    dz = v.T                                    # zbar = J^{-T} xbar
    dzc = jnp.concatenate([dz, gcT.T], axis=-1) if C else dz
    return dzc, tuple(dfp)
