r"""Tests for zuko_tpu.utils — values and gradients vs closed forms
(reference contract: tests/test_utils.py, atol 1e-6 in float64)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zuko_tpu.utils import bisection, broadcast, gauss_legendre, odeint, unpack


def test_broadcast():
    x = jnp.ones((2, 3))
    y = jnp.ones((5, 1, 4))
    a, b = broadcast(x, y, ignore=1)
    assert a.shape == (5, 2, 3)
    assert b.shape == (5, 2, 4)

    a, b = broadcast(jnp.ones(()), jnp.ones((2, 3)))
    assert a.shape == (2, 3) and b.shape == (2, 3)


def test_unpack():
    x = jnp.arange(22.0).reshape(2, 11)
    a, b, c = unpack(x, [(3,), (2, 3), (2,)])
    assert a.shape == (2, 3)
    assert b.shape == (2, 2, 3)
    assert c.shape == (2, 2)
    assert jnp.allclose(a, x[:, :3])
    assert jnp.allclose(b.reshape(2, 6), x[:, 3:9])


def test_bisection_value():
    f = lambda x: x**3 + x
    y = jnp.linspace(-5.0, 5.0, 11)
    x = bisection(f, y, -3.0, 3.0, n=60)
    assert jnp.allclose(f(x), y, atol=1e-6)


def test_bisection_grad_y():
    f = lambda x: x**3 + x
    y0 = jnp.asarray(2.0)

    def solve(y):
        return bisection(f, y, -3.0, 3.0, n=60)

    x = solve(y0)
    g = jax.grad(solve)(y0)
    analytic = 1.0 / (3 * x**2 + 1)
    assert jnp.allclose(g, analytic, atol=1e-6)


def test_bisection_grad_phi():
    def f(x, phi):
        return phi * x

    phi0 = jnp.asarray(2.0)
    y = jnp.asarray(3.0)

    def solve(phi):
        return bisection(f, y, 0.0, 10.0, n=60, phi=phi)

    x = solve(phi0)
    assert jnp.allclose(x, 1.5, atol=1e-6)
    g = jax.grad(solve)(phi0)
    # x = y / phi => dx/dphi = -y / phi^2
    assert jnp.allclose(g, -3.0 / 4.0, atol=1e-6)


def test_gauss_legendre_value_and_grads():
    f = lambda x: x**3

    def integral(a, b):
        return gauss_legendre(f, a, b, n=3)

    a, b = jnp.asarray(-0.5), jnp.asarray(1.5)
    v = integral(a, b)
    assert jnp.allclose(v, (b**4 - a**4) / 4, atol=1e-6)

    ga, gb = jax.grad(integral, argnums=(0, 1))(a, b)
    assert jnp.allclose(ga, -f(a), atol=1e-6)
    assert jnp.allclose(gb, f(b), atol=1e-6)


def test_gauss_legendre_phi_grad():
    def f(x, phi):
        return phi * x**2

    phi0 = jnp.asarray(2.0)

    def integral(phi):
        return gauss_legendre(f, 0.0, 1.0, n=3, phi=phi)

    assert jnp.allclose(integral(phi0), 2.0 / 3.0, atol=1e-6)
    g = jax.grad(integral)(phi0)
    assert jnp.allclose(g, 1.0 / 3.0, atol=1e-6)


def test_odeint_value():
    f = lambda t, x: -x
    x0 = jnp.asarray([1.0, 2.0, 3.0])
    x1 = odeint(f, x0, 0.0, 1.0, atol=1e-9, rtol=1e-9)
    assert jnp.allclose(x1, x0 * jnp.exp(-1.0), atol=1e-6)


def test_odeint_reverse_time():
    f = lambda t, x: -x
    x0 = jnp.asarray([1.0, 2.0])
    x1 = odeint(f, x0, 1.0, 0.0, atol=1e-9, rtol=1e-9)
    assert jnp.allclose(x1, x0 * jnp.exp(1.0), atol=1e-6)


def test_odeint_grad_x0():
    f = lambda t, x: -x

    def final(x0):
        return jnp.sum(odeint(f, x0, 0.0, 1.0, atol=1e-9, rtol=1e-9))

    x0 = jnp.asarray([1.0, 2.0])
    g = jax.grad(final)(x0)
    assert jnp.allclose(g, jnp.exp(-1.0), atol=1e-6)


def test_odeint_grad_phi():
    def f(t, x, phi):
        return -phi * x

    x0 = jnp.asarray([1.0])
    phi0 = jnp.asarray(1.5)

    def final(phi):
        return jnp.sum(odeint(f, x0, 0.0, 1.0, phi=phi, atol=1e-9, rtol=1e-9))

    v = final(phi0)
    assert jnp.allclose(v, jnp.exp(-1.5), atol=1e-6)
    g = jax.grad(final)(phi0)
    # d/dphi e^{-phi} = -e^{-phi}
    assert jnp.allclose(g, -jnp.exp(-1.5), atol=1e-6)


def test_odeint_pytree_state():
    def f(t, state):
        x, v = state
        return (v, -x)  # harmonic oscillator

    x0 = (jnp.asarray([1.0]), jnp.asarray([0.0]))
    x1, v1 = odeint(f, x0, 0.0, jnp.pi / 2, atol=1e-9, rtol=1e-9)
    assert jnp.allclose(x1, 0.0, atol=1e-6)
    assert jnp.allclose(v1, -1.0, atol=1e-6)


def test_odeint_under_jit():
    f = lambda t, x: -x

    @jax.jit
    def run(x0):
        return odeint(f, x0, 0.0, 1.0, atol=1e-9, rtol=1e-9)

    x0 = jnp.asarray([1.0, 2.0])
    assert jnp.allclose(run(x0), x0 * jnp.exp(-1.0), atol=1e-6)


def test_newton_bisection_value_and_grad():
    from zuko_tpu.utils import newton_bisection

    f = lambda x: x**3 + x
    y = jnp.linspace(-5.0, 5.0, 11)
    x = newton_bisection(f, y, -3.0, 3.0, n=20)
    assert jnp.allclose(f(x), y, atol=1e-9)

    def solve(y):
        return newton_bisection(f, y, -3.0, 3.0, n=20)

    y0 = jnp.asarray(2.0)
    x0 = solve(y0)
    g = jax.grad(solve)(y0)
    assert jnp.allclose(g, 1.0 / (3 * x0**2 + 1), atol=1e-6)


def test_newton_bisection_phi_grad():
    from zuko_tpu.utils import newton_bisection

    def f(x, phi):
        return phi * x**3

    phi0 = jnp.asarray(2.0)
    y = jnp.asarray(16.0)

    def solve(phi):
        return newton_bisection(f, y, 0.0, 10.0, n=25, phi=phi)

    x = solve(phi0)
    assert jnp.allclose(x, 2.0, atol=1e-8)
    # x = (y/phi)^(1/3) => dx/dphi = -x / (3 phi)
    g = jax.grad(solve)(phi0)
    assert jnp.allclose(g, -2.0 / 6.0, atol=1e-6)


def test_odeint_step_exhaustion_poisons():
    from zuko_tpu.utils import odeint

    # A stiff system with a tiny step budget must NOT return a silently
    # truncated state (reference ACA never truncates, zuko/utils.py:538-552).
    f = lambda t, x: -1e6 * x  # noqa: E731
    x1 = odeint(f, jnp.ones(3), 0.0, 1.0, max_steps=4)
    assert jnp.all(jnp.isnan(x1)), x1

    # A well-behaved system with budget to spare stays clean.
    g = lambda t, x: -x  # noqa: E731
    x1 = odeint(g, jnp.ones(3), 0.0, 1.0, max_steps=256)
    assert jnp.all(jnp.isfinite(x1))
    assert jnp.allclose(x1, jnp.exp(-1.0), atol=1e-4)
