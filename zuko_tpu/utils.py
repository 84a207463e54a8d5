r"""General purpose numerics: broadcasting, packing, root finding, quadrature
and ODE integration.

Capability parity with the reference's ``zuko/utils.py`` (622 LoC), redesigned
for XLA:

* :func:`bisection` — fixed-iteration bisection (reference: zuko/utils.py:118-209)
  as a ``lax.fori_loop`` with a ``jax.custom_vjp`` implementing implicit-function-
  theorem gradients (grad_y = g / f'(x*), grad_phi via VJP of ``-grad_y`` through f).
* :func:`gauss_legendre` — n-point quadrature (reference: zuko/utils.py:247-363);
  nodes precomputed host-side, gradients via plain autodiff through the sum
  (exact for the quadrature approximation, no custom rule needed in JAX).
* :func:`odeint` — adaptive Dormand-Prince 4(5) integrator (reference:
  zuko/utils.py:366-593). Forward is a ``lax.while_loop`` writing accepted
  steps into a bounded preallocated buffer; backward is a reversed ``lax.scan``
  replaying each step under ``jax.vjp`` (discrete adjoint — the XLA-native
  counterpart of the reference's Adaptive Checkpoint Adjoint, with exact
  gradients of the computed trajectory and bounded memory).

The reference's ``NestedTensor`` / pack-unpack machinery (zuko/utils.py:417-439,
500-512) is subsumed by JAX pytrees + ``ravel_pytree``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax
from jax.flatten_util import ravel_pytree
from typing import Any, Callable, Sequence, Tuple, Union

__all__ = [
    "Partial",
    "bisection",
    "broadcast",
    "gauss_legendre",
    "newton_bisection",
    "odeint",
    "unpack",
]


def _make_partial():
    # deferred import to avoid a cycle (core has no deps on utils)
    from .core import Module

    class Partial(Module):
        r"""``functools.partial`` as a module: positional/keyword array
        arguments become parameters (or frozen buffers with ``buffer=True``)
        of the pytree (reference: zuko/utils.py:26-115).

        Example:
            >>> import jax.numpy as jnp
            >>> mul = Partial(jnp.multiply, jnp.asarray(2.0))
            >>> float(mul(jnp.asarray(3.0)))
            6.0
        """

        def __init__(self, f, *args, buffer: bool = False, **kwargs):
            self.f = f
            if buffer:
                self.register_buffer("args", list(args))
                self.register_buffer("kwargs", dict(kwargs))
            else:
                self.args = list(args)
                self.kwargs = dict(kwargs)

        def __call__(self, *args, **kwargs):
            return self.f(*self.args, *args, **{**self.kwargs, **kwargs})

    return Partial


Partial = _make_partial()


def _empty_phi(phi: Any) -> bool:
    return phi is None or (isinstance(phi, (tuple, list)) and len(phi) == 0)


def broadcast(*arrays, ignore: Union[int, Sequence[int]] = 0):
    r"""Broadcast arrays together, ignoring a number of trailing dimensions.

    Reference semantics: zuko/utils.py:212-244.

    Arguments:
        arrays: the arrays to broadcast.
        ignore: the number of trailing dimensions to protect, per array or
            shared.

    Example:
        >>> x = jnp.ones((2, 3))
        >>> y = jnp.ones((5, 1, 4))
        >>> x, y = broadcast(x, y, ignore=1)
        >>> x.shape
        (5, 2, 3)
        >>> y.shape
        (5, 2, 4)
    """
    if isinstance(ignore, int):
        ignore = [ignore] * len(arrays)

    arrays = [jnp.asarray(a) for a in arrays]
    dims = [a.ndim - i for a, i in zip(arrays, ignore)]
    common = jnp.broadcast_shapes(*(a.shape[:d] for a, d in zip(arrays, dims)))

    return [
        jnp.broadcast_to(a, common + a.shape[d:]) for a, d in zip(arrays, dims)
    ]


def unpack(x: jax.Array, shapes: Sequence[Tuple[int, ...]]):
    r"""Unpack a packed array into tensors of given trailing shapes.

    Reference semantics: zuko/utils.py:596-622 — the last dimension of ``x``
    is split into chunks of ``prod(shape)`` elements, each reshaped to
    ``x.shape[:-1] + shape``.

    Example:
        >>> x = jnp.arange(10.0).reshape(2, 5)
        >>> a, b = unpack(x, [(3,), (2,)])
        >>> a.shape, b.shape
        ((2, 3), (2, 2))
    """
    sizes = [int(np.prod(s, dtype=int)) for s in shapes]
    splits = np.cumsum(sizes)[:-1].tolist()
    chunks = jnp.split(x, splits, axis=-1) if splits else [x]
    return [c.reshape(c.shape[:-1] + tuple(s)) for c, s in zip(chunks, shapes)]


# ------------------------------------------------------------------ bisection


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _bisection(f: Callable, n: int, y, a, b, phi):
    def body(_, bounds):
        lo, hi = bounds
        c = (lo + hi) / 2
        mask = f(c, phi) < y
        lo = jnp.where(mask, c, lo)
        hi = jnp.where(mask, hi, c)
        return lo, hi

    lo, hi = lax.fori_loop(0, n, body, (a, b))
    return (lo + hi) / 2


def _bisection_fwd(f, n, y, a, b, phi):
    x = _bisection(f, n, y, a, b, phi)
    return x, (x, phi)


def _bisection_bwd(f, n, res, g):
    x, phi = res
    # Implicit function theorem (reference: zuko/utils.py:185-209):
    #   f(x*, phi) = y  =>  dx/dy = 1 / f'(x*),  dL/dphi via VJP of -dL/dy.
    fx = jax.grad(lambda u: jnp.sum(f(u, phi)))(x)
    grad_y = g / fx
    _, vjp = jax.vjp(lambda p: f(x, p), phi)
    (grad_phi,) = vjp(-grad_y)
    return (grad_y, jnp.zeros_like(x), jnp.zeros_like(x), grad_phi)


_bisection.defvjp(_bisection_fwd, _bisection_bwd)


def bisection(
    f: Callable,
    y: jax.Array,
    a: Union[float, jax.Array],
    b: Union[float, jax.Array],
    n: int = 16,
    phi: Any = (),
) -> jax.Array:
    r"""Solve ``f(x) = y`` elementwise by ``n`` bisection iterations.

    ``f`` must be strictly increasing on ``[a, b]`` with ``f(a) <= y <= f(b)``
    (reference: zuko/utils.py:118-209). ``phi`` is a pytree of arrays ``f``
    depends on, through which gradients are routed (implicit differentiation).
    If ``phi`` is given, ``f`` is called as ``f(x, phi)``; otherwise ``f(x)``.

    Example:
        >>> f = lambda x: x**3
        >>> x = bisection(f, jnp.asarray(8.0), 0.0, 10.0, n=40)
        >>> bool(jnp.allclose(x, 2.0, atol=1e-6))
        True
    """
    if _empty_phi(phi):
        g = lambda x, _: f(x)
        phi = ()
    else:
        g = f

    y = jnp.asarray(y)
    dtype = jnp.result_type(y, jnp.asarray(a), jnp.asarray(b))
    a = jnp.broadcast_to(jnp.asarray(a, dtype), y.shape).astype(dtype)
    b = jnp.broadcast_to(jnp.asarray(b, dtype), y.shape).astype(dtype)
    return _bisection(g, n, y.astype(dtype), a, b, phi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _newton_bisection(f, n, xtol, y, a, b, phi):
    # Safeguarded Newton ("rtsafe"): take the Newton step only when it stays
    # inside the bracket AND makes fast-enough progress (|2 r| <= |dxold f'|,
    # the Numerical-Recipes criterion that prevents oscillation); otherwise
    # bisect — so the bracket provably shrinks. Early exit when every element
    # has converged; the loop is inside a custom_vjp, so non-differentiable
    # control flow is fine.
    def cond(st):
        lo, hi, x, dxold, it = st
        return (it < n) & (jnp.max(jnp.minimum(hi - lo, jnp.abs(dxold))) > xtol)

    def body(st):
        lo, hi, x, dxold, it = st
        fx, dfx = jax.jvp(lambda u: f(u, phi), (x,), (jnp.ones_like(x),))
        r = fx - y
        below = r < 0
        lo = jnp.where(below, x, lo)
        hi = jnp.where(below, hi, x)
        xn = x - r / dfx
        ok = (
            (xn >= lo) & (xn <= hi) & jnp.isfinite(xn)
            & (jnp.abs(2 * r) <= jnp.abs(dxold * dfx))
        )
        x_new = jnp.where(ok, xn, (lo + hi) / 2)
        return lo, hi, x_new, x_new - x, it + 1

    x0 = (a + b) / 2
    _, _, x, _, _ = lax.while_loop(
        cond, body, (a, b, x0, b - a, jnp.asarray(0, jnp.int32))
    )
    return x


def _newton_bisection_fwd(f, n, xtol, y, a, b, phi):
    x = _newton_bisection(f, n, xtol, y, a, b, phi)
    return x, (x, phi)


def _newton_bisection_bwd(f, n, xtol, res, g):
    return _bisection_bwd(f, n, res, g)


_newton_bisection.defvjp(_newton_bisection_fwd, _newton_bisection_bwd)


def newton_bisection(
    f: Callable,
    y: jax.Array,
    a: Union[float, jax.Array],
    b: Union[float, jax.Array],
    n: int = 32,
    xtol: float = 1e-8,
    phi: Any = (),
) -> jax.Array:
    r"""Solve ``f(x) = y`` for increasing ``f`` with safeguarded Newton
    iterations: each step takes the Newton update when it stays inside the
    current bracket and falls back to bisection otherwise. Quadratic
    convergence on smooth regions at roughly half the f-evaluations of pure
    bisection (the reference uses pure bisection, zuko/utils.py:118-209; this
    is the north-star upgrade for the NAF/UNAF sampling path).

    Gradients use the same implicit-function-theorem custom VJP as
    :func:`bisection`.

    Example:
        >>> f = lambda x: x**3 + x
        >>> x = newton_bisection(f, jnp.asarray(10.0), -3.0, 3.0)
        >>> bool(jnp.allclose(f(x), 10.0, atol=1e-6))
        True
    """
    if _empty_phi(phi):
        g = lambda x, _: f(x)
        phi = ()
    else:
        g = f

    y = jnp.asarray(y)
    dtype = jnp.result_type(y, jnp.asarray(a), jnp.asarray(b))
    a = jnp.broadcast_to(jnp.asarray(a, dtype), y.shape).astype(dtype)
    b = jnp.broadcast_to(jnp.asarray(b, dtype), y.shape).astype(dtype)
    return _newton_bisection(g, n, float(xtol), y.astype(dtype), a, b, phi)


# ------------------------------------------------------------- gauss-legendre


@functools.lru_cache(maxsize=None)
def _leggauss(n: int) -> Tuple[np.ndarray, np.ndarray]:
    # Nodes/weights on [-1, 1]; computed host-side once (reference caches
    # similarly: zuko/utils.py:328-347).
    return np.polynomial.legendre.leggauss(n)


def gauss_legendre(
    f: Callable,
    a: Union[float, jax.Array],
    b: Union[float, jax.Array],
    n: int = 3,
    phi: Any = (),
) -> jax.Array:
    r"""Estimate :math:`\int_a^b f(x) dx` with an n-point Gauss-Legendre rule.

    Exact for polynomials of degree up to :math:`2n - 1` (reference:
    zuko/utils.py:247-363). Gradients w.r.t. ``a``, ``b`` and any arrays the
    integrand uses flow by plain autodiff through the weighted sum. If ``phi``
    is given, ``f`` is called as ``f(x, phi)``.

    Example:
        >>> f = lambda x: x**2
        >>> v = gauss_legendre(f, 0.0, 1.0, n=2)
        >>> bool(jnp.allclose(v, 1 / 3))
        True
    """
    nodes, weights = _leggauss(n)

    if _empty_phi(phi):
        g = f
    else:
        g = lambda x: f(x, phi)

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    half = (b - a) / 2
    mid = (a + b) / 2
    dtype = jnp.result_type(half, jnp.float32)
    nodes = jnp.asarray(nodes, dtype)
    weights = jnp.asarray(weights, dtype)

    nd = jnp.ndim(mid)
    xs = mid[None, ...] + half[None, ...] * nodes.reshape((-1,) + (1,) * nd)
    ys = jax.vmap(g)(xs)
    w = weights.reshape((-1,) + (1,) * (ys.ndim - 1))
    return half * jnp.sum(w * ys, axis=0)


# --------------------------------------------------------------------- odeint

# Dormand-Prince 4(5) Butcher tableau (public coefficients; the reference
# carries the same tableau at zuko/utils.py:443-497).
_DP_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = np.zeros((7, 7))
_DP_A[1, :1] = [1 / 5]
_DP_A[2, :2] = [3 / 40, 9 / 40]
_DP_A[3, :3] = [44 / 45, -56 / 15, 32 / 9]
_DP_A[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
_DP_A[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]
_DP_A[6, :6] = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
_DP_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DP_B4 = np.array([
    5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40,
])


def _dp_step(f, x, t, dt, phi):
    """One Dormand-Prince 4(5) step: returns (x5, error_estimate)."""
    dtype = x.dtype
    A = np.asarray(_DP_A, dtype)
    C = np.asarray(_DP_C, dtype)
    B5 = np.asarray(_DP_B5, dtype)
    B4 = np.asarray(_DP_B4, dtype)

    ks = []
    for i in range(7):
        xi = x
        for j in range(i):
            if A[i, j] != 0.0:
                xi = xi + (dt * A[i, j]) * ks[j]
        ks.append(f(t + C[i] * dt, xi, phi))
    x5 = x
    err = jnp.zeros_like(x)
    for i in range(7):
        if B5[i] != 0.0:
            x5 = x5 + (dt * B5[i]) * ks[i]
        d = B5[i] - B4[i]
        if d != 0.0:
            err = err + (dt * d) * ks[i]
    return x5, err


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _odeint_flat(f, rtol, atol, max_steps, x0, phi):
    x, _, _ = _odeint_fwd_loop(f, rtol, atol, max_steps, x0, phi)
    return x


def _odeint_fwd_loop(f, rtol, atol, max_steps, x0, phi):
    D = x0.shape[0]
    dtype = x0.dtype

    buf_x = jnp.zeros((max_steps, D), dtype)
    buf_t = jnp.zeros((max_steps,), dtype)
    buf_dt = jnp.zeros((max_steps,), dtype)
    tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny, dtype)

    def cond(carry):
        x, t, dt, k, attempts, *_ = carry
        return (t < 1.0) & (attempts < 4 * max_steps) & (k < max_steps)

    def body(carry):
        x, t, dt, k, attempts, bx, bt, bdt = carry
        dt = jnp.minimum(dt, 1.0 - t)
        y, err = _dp_step(f, x, t, dt, phi)
        tol = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(y))
        ratio = jnp.max(jnp.abs(err) / tol)
        ratio = jnp.where(jnp.isnan(ratio), jnp.inf, ratio)
        accept = ratio <= 1.0

        bx = bx.at[k].set(jnp.where(accept, x, bx[k]))
        bt = bt.at[k].set(jnp.where(accept, t, bt[k]))
        bdt = bdt.at[k].set(jnp.where(accept, dt, bdt[k]))
        k = k + accept.astype(k.dtype)
        x = jnp.where(accept, y, x)
        t = jnp.where(accept, t + dt, t)

        factor = jnp.clip(0.9 * jnp.maximum(ratio, tiny) ** (-0.2), 0.1, 10.0)
        return x, t, dt * factor, k, attempts + 1, bx, bt, bdt

    t0 = jnp.asarray(0.0, dtype)
    dt0 = jnp.asarray(1.0, dtype)
    k0 = jnp.asarray(0, jnp.int32)
    x, t, dt, k, attempts, bx, bt, bdt = lax.while_loop(
        cond, body, (x0, t0, dt0, k0, jnp.asarray(0, jnp.int32), buf_x, buf_t, buf_dt)
    )
    # Fail loudly on budget exhaustion: a stiff system that runs out of
    # accepted steps (or error-control attempts) before reaching t=1 must not
    # return a silently-truncated state (the reference ACA never truncates,
    # zuko/utils.py:538-552). NaN-poison the output instead. The tolerance
    # absorbs the t + (1-t) != 1 float residue of the final clamped step.
    eps = jnp.asarray(np.finfo(np.dtype(dtype)).eps, dtype)
    exhausted = t < 1.0 - 64.0 * eps
    x = jnp.where(exhausted, jnp.full_like(x, jnp.nan), x)
    return x, (bx, bt, bdt), k


def _odeint_flat_fwd(f, rtol, atol, max_steps, x0, phi):
    x, steps, k = _odeint_fwd_loop(f, rtol, atol, max_steps, x0, phi)
    return x, (steps, k, phi)


def _odeint_flat_bwd(f, rtol, atol, max_steps, res, g):
    (bx, bt, bdt), k, phi = res

    def step_fn(x, t, dt, p):
        y, _ = _dp_step(f, x, t, dt, p)
        return y

    zero_phi = jax.tree_util.tree_map(jnp.zeros_like, phi)

    def scan_body(carry, i):
        a_x, a_phi = carry
        valid = i < k
        x_i, t_i, dt_i = bx[i], bt[i], bdt[i]
        _, vjp = jax.vjp(lambda x, p: step_fn(x, t_i, dt_i, p), x_i, phi)
        dx, dphi = vjp(a_x)
        a_x = jnp.where(valid, dx, a_x)
        a_phi = jax.tree_util.tree_map(
            lambda acc, d: acc + jnp.where(valid, d, jnp.zeros_like(d)), a_phi, dphi
        )
        return (a_x, a_phi), None

    idx = jnp.arange(max_steps - 1, -1, -1)
    (a_x, a_phi), _ = lax.scan(scan_body, (g, zero_phi), idx)
    return a_x, a_phi


_odeint_flat.defvjp(_odeint_flat_fwd, _odeint_flat_bwd)


def odeint(
    f: Callable,
    x: Any,
    t0: Union[float, jax.Array],
    t1: Union[float, jax.Array],
    phi: Any = (),
    atol: float = 1e-6,
    rtol: float = 1e-5,
    max_steps: int = 256,
) -> Any:
    r"""Integrate :math:`dx/dt = f(t, x)` from ``t0`` to ``t1``.

    Adaptive Dormand-Prince 4(5) with error control
    :math:`\tau = \text{atol} + \text{rtol} \max(|x|, |y|)` and step factor
    :math:`0.9\,\varepsilon^{-1/5}` clipped to :math:`[0.1, 10]` (reference
    behavior: zuko/utils.py:538-552). The state ``x`` may be any pytree
    (reference tuple-state support: zuko/utils.py:417-439). Gradients w.r.t.
    ``x``, ``phi``, ``t0`` and ``t1`` use a bounded-memory discrete adjoint
    over the recorded accepted steps (the reference ACA contract,
    zuko/utils.py:515-593, made XLA-native).

    Integration runs in normalized time :math:`s \in [0, 1]`, which handles
    ``t1 < t0`` transparently. If ``phi`` is given, ``f`` is called as
    ``f(t, x, phi)``; otherwise ``f(t, x)``.

    Example:
        >>> f = lambda t, x: -x
        >>> x1 = odeint(f, jnp.ones(2), 0.0, 1.0)
        >>> bool(jnp.allclose(x1, jnp.exp(-1.0), atol=1e-4))
        True
    """
    x0_flat, unravel = ravel_pytree(x)
    dtype = x0_flat.dtype
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)

    has_phi = not _empty_phi(phi)

    def f_flat(s, xf, p):
        t = p["t0"] + s * (p["t1"] - p["t0"])
        state = unravel(xf)
        dx = f(t, state, p["phi"]) if has_phi else f(t, state)
        dx_flat, _ = ravel_pytree(dx)
        return (p["t1"] - p["t0"]) * dx_flat

    phi_tree = {"phi": phi if has_phi else (), "t0": t0, "t1": t1}
    out = _odeint_flat(f_flat, rtol, atol, max_steps, x0_flat, phi_tree)
    return unravel(out)
