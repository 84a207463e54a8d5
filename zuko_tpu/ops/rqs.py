r"""Fused rational-quadratic spline kernel (forward / inverse + log|det J|).

The RQS transform (reference math: zuko/transforms.py:449-567) is the hot
univariate of NSF. This kernel fuses, per element: the branchless
``sum(knots < x)`` bin search, the bin-edge selects, the rational-quadratic
evaluation (or its analytic quadratic-root inverse) and the log-Jacobian —
one pass over the knot tensors, no intermediate materialization.

Layout: the flattened element axis rides the sublane dimension and the knot
axis (K+1, small) rides lanes; blocks of 256 elements per program. All ops are
VPU elementwise/reduction ops — the kernel is HBM-bandwidth-bound, which is
the speed-of-light for this op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # TPU-only import
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["rqs_forward", "rqs_inverse"]

_BLOCK = 256


def _rqs_math(x, hs, vs, ds, inverse: bool):
    """Shared per-block math. x: (B,), hs/vs/ds: (B, K+1). Returns (out, ladj)."""
    K = hs.shape[-1] - 1

    seq = vs if inverse else hs
    k = jnp.sum((seq < x[:, None]).astype(jnp.int32), axis=-1) - 1
    mask = (0 <= k) & (k < K)
    k = k % K

    iota = jax.lax.broadcasted_iota(jnp.int32, hs.shape, 1)
    sel0 = iota == k[:, None]
    sel1 = iota == (k[:, None] + 1)

    def take(arr, sel):
        return jnp.sum(jnp.where(sel, arr, 0.0), axis=-1)

    x0 = take(hs, sel0)
    x1 = take(hs, sel1)
    y0 = take(vs, sel0)
    y1 = take(vs, sel1)
    d0 = take(ds, sel0)
    d1 = take(ds, sel1)
    s = (y1 - y0) / (x1 - x0)

    if not inverse:
        z = jnp.where(mask, (x - x0) / (x1 - x0), 0.0)
    else:
        y_ = jnp.where(mask, x - y0, 0.0)
        a = (y1 - y0) * (s - d0) + y_ * (d0 + d1 - 2 * s)
        b = (y1 - y0) * d0 - y_ * (d0 + d1 - 2 * s)
        c = -s * y_
        disc = jnp.maximum(b**2 - 4 * a * c, 0.0)
        z = 2 * c / (-b - jnp.sqrt(disc))
        z = jnp.where(mask, z, 0.0)

    z1 = z * (1 - z)
    denom = s + (d0 + d1 - 2 * s) * z1
    jac = s**2 * (2 * s * z1 + d0 * (1 - z) ** 2 + d1 * z**2) / denom**2
    log_jac = jnp.log(jac)

    if not inverse:
        out = y0 + (y1 - y0) * (s * z**2 + d0 * z1) / denom
        ladj = jnp.where(mask, log_jac, 0.0)
    else:
        out = x0 + z * (x1 - x0)
        ladj = jnp.where(mask, -log_jac, 0.0)

    return jnp.where(mask, out, x), ladj


def _kernel(x_ref, h_ref, v_ref, d_ref, out_ref, ladj_ref, *, inverse):
    out, ladj = _rqs_math(
        x_ref[:, 0], h_ref[:], v_ref[:], d_ref[:], inverse
    )
    out_ref[:, 0] = out
    ladj_ref[:, 0] = ladj


def _pallas_rqs(x, hs, vs, ds, inverse: bool):
    n, kp1 = hs.shape
    pad = (-n) % _BLOCK
    if pad:
        x = jnp.pad(x, (0, pad))
        hs = jnp.pad(hs, ((0, pad), (0, 0)), constant_values=1.0)
        vs = jnp.pad(vs, ((0, pad), (0, 0)), constant_values=1.0)
        ds = jnp.pad(ds, ((0, pad), (0, 0)), constant_values=1.0)
    m = x.shape[0]

    grid = (m // _BLOCK,)
    spec_x = pl.BlockSpec((_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((_BLOCK, kp1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out, ladj = pl.pallas_call(
        functools.partial(_kernel, inverse=inverse),
        grid=grid,
        in_specs=[spec_x, spec_k, spec_k, spec_k],
        out_specs=(spec_x, spec_x),
        out_shape=(
            jax.ShapeDtypeStruct((m, 1), x.dtype),
            jax.ShapeDtypeStruct((m, 1), x.dtype),
        ),
    )(x[:, None], hs, vs, ds)

    out = out[:, 0]
    ladj = ladj[:, 0]
    if pad:
        out = out[:n]
        ladj = ladj[:n]
    return out, ladj


def _dispatch(x, horizontal, vertical, derivatives, inverse: bool):
    from . import kernels_enabled

    shape = jnp.broadcast_shapes(
        x.shape, horizontal.shape[:-1], vertical.shape[:-1],
        derivatives.shape[:-1],
    )
    kp1 = horizontal.shape[-1]
    x = jnp.broadcast_to(x, shape)
    hs = jnp.broadcast_to(horizontal, shape + (kp1,))
    vs = jnp.broadcast_to(vertical, shape + (kp1,))
    ds = jnp.broadcast_to(derivatives, shape + (kp1,))

    xf = x.reshape(-1)
    hf = hs.reshape(-1, kp1)
    vf = vs.reshape(-1, kp1)
    df = ds.reshape(-1, kp1)

    if kernels_enabled() and pltpu is not None and x.dtype == jnp.float32:
        out, ladj = _pallas_rqs(xf, hf, vf, df, inverse)
    else:
        out, ladj = _rqs_math(xf, hf, vf, df, inverse)
    return out.reshape(shape), ladj.reshape(shape)


def _math_nd(x, hs, vs, ds, inverse):
    """Reference jnp math over arbitrary batch shapes (used for gradients)."""
    shape = jnp.broadcast_shapes(
        x.shape, hs.shape[:-1], vs.shape[:-1], ds.shape[:-1]
    )
    kp1 = hs.shape[-1]
    out, ladj = _rqs_math(
        jnp.broadcast_to(x, shape).reshape(-1),
        jnp.broadcast_to(hs, shape + (kp1,)).reshape(-1, kp1),
        jnp.broadcast_to(vs, shape + (kp1,)).reshape(-1, kp1),
        jnp.broadcast_to(ds, shape + (kp1,)).reshape(-1, kp1),
        inverse,
    )
    return out.reshape(shape), ladj.reshape(shape)


def _make_tpu_op(inverse: bool):
    @jax.custom_vjp
    def op(x, hs, vs, ds):
        return _dispatch(x, hs, vs, ds, inverse)

    def fwd(x, hs, vs, ds):
        return op(x, hs, vs, ds), (x, hs, vs, ds)

    def bwd(res, g):
        x, hs, vs, ds = res
        # analytic jnp backward — the Pallas kernel is forward-only
        _, vjp = jax.vjp(lambda *a: _math_nd(*a, inverse), x, hs, vs, ds)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


_rqs_forward_tpu = _make_tpu_op(False)
_rqs_inverse_tpu = _make_tpu_op(True)


def _use_pallas(x) -> bool:
    from . import kernels_enabled

    return kernels_enabled() and pltpu is not None and x.dtype == jnp.float32


def rqs_forward(x, horizontal, vertical, derivatives):
    r"""Fused spline forward + ladj over arbitrary batch shapes. On TPU this
    is the Pallas kernel behind a custom VJP; elsewhere plain jnp
    (differentiable in both modes)."""
    x = jnp.asarray(x)
    if _use_pallas(x):
        return _rqs_forward_tpu(x, horizontal, vertical, derivatives)
    return _math_nd(x, horizontal, vertical, derivatives, False)


def rqs_inverse(y, horizontal, vertical, derivatives):
    r"""Fused spline inverse + (inverse-map) ladj."""
    y = jnp.asarray(y)
    if _use_pallas(y):
        return _rqs_inverse_tpu(y, horizontal, vertical, derivatives)
    return _math_nd(y, horizontal, vertical, derivatives, True)
