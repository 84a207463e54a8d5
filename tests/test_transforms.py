r"""Tests for zuko_tpu.transforms — mirrors the reference battery
(reference: tests/test_transforms.py): inverse round-trip on a domain-aware
grid, exactly-diagonal Jacobians for univariate transforms, ladj vs autodiff
jacobian, fused call consistency, and inverse Jacobians."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zuko_tpu.transforms import (
    AdditiveTransform,
    AffineTransform,
    ExpTransform,
    SigmoidTransform,
    SoftplusTransform,
    TanhTransform,
    AutoregressiveTransform,
    BernsteinTransform,
    BoundedBernsteinTransform,
    CircularShiftTransform,
    ComposedTransform,
    CosTransform,
    CouplingTransform,
    DependentTransform,
    FreeFormJacobianTransform,
    GaussianizationTransform,
    IdentityTransform,
    LULinearTransform,
    MonotonicAffineTransform,
    MonotonicRQSTransform,
    MonotonicTransform,
    PermutationTransform,
    RotationTransform,
    SignedPowerTransform,
    SinTransform,
    SoftclipTransform,
    SOSPolynomialTransform,
    UnconstrainedMonotonicTransform,
)

N = 64


def _univariate_cases(batched: bool):
    key = jax.random.PRNGKey(0)
    batch = (N,) if batched else ()

    def rnd(*shape):
        nonlocal key
        key, sub = jax.random.split(key)
        return jax.random.normal(sub, batch + shape)

    return [
        (IdentityTransform(), (-5.0, 5.0)),
        (ExpTransform(), (-3.0, 3.0)),
        (SigmoidTransform(), (-5.0, 5.0)),
        (SoftplusTransform(), (-5.0, 5.0)),
        (TanhTransform(), (-3.0, 3.0)),
        (AffineTransform(rnd(), 1.0 + jnp.abs(rnd())), (-5.0, 5.0)),
        (CosTransform(), (1e-2, math.pi - 1e-2)),
        (SinTransform(), (-math.pi / 2 + 1e-2, math.pi / 2 - 1e-2)),
        (SoftclipTransform(), (-5.0, 5.0)),
        (CircularShiftTransform(), (-1.0 + 1e-2, 1.0 - 1e-2)),
        (SignedPowerTransform(rnd()), (-5.0, 5.0)),
        (AdditiveTransform(rnd()), (-5.0, 5.0)),
        (MonotonicAffineTransform(rnd(), rnd()), (-5.0, 5.0)),
        (MonotonicRQSTransform(rnd(8), rnd(8), rnd(7)), (-5.0, 5.0)),
        (MonotonicTransform(lambda x: x**3), (-2.0, 2.0)),
        (BernsteinTransform(rnd(16)), (-5.0, 5.0)),
        (BoundedBernsteinTransform(rnd(16)), (-5.0, 5.0)),
        (GaussianizationTransform(rnd(8), rnd(8)), (-5.0, 5.0)),
        (
            UnconstrainedMonotonicTransform(lambda x: jnp.exp(-(x**2)) + 1e-2),
            (-5.0, 5.0),
        ),
        (SOSPolynomialTransform(0.3 * rnd(3, 5)), (-5.0, 5.0)),
    ]


@pytest.mark.parametrize("batched", [False, True])
def test_univariate_transforms(batched):
    for t, (lo, hi) in _univariate_cases(batched):
        name = type(t).__name__
        x = jnp.linspace(lo, hi, N)

        y = t(x)
        assert y.shape == x.shape, name

        z = t.inv(y)
        assert jnp.allclose(x, z, atol=1e-4), name

        J = jax.jacrev(t)(x)
        assert jnp.allclose(J - jnp.diag(jnp.diag(J)), 0.0), name

        ladj = jnp.log(jnp.abs(jnp.diag(J)))
        assert jnp.allclose(t.log_abs_det_jacobian(x, y), ladj, atol=1e-4), name

        y_comp, ladj_comp = t.call_and_ladj(x)
        assert jnp.allclose(y_comp, y, atol=1e-4), name
        assert jnp.allclose(ladj_comp, ladj, atol=1e-4), name

        # Inverse Jacobian
        Ji = jax.jacrev(t.inv)(y)
        assert jnp.allclose(Ji - jnp.diag(jnp.diag(Ji)), 0.0), name
        ladj_i = jnp.log(jnp.abs(jnp.diag(Ji)))
        assert jnp.allclose(
            t.inv.log_abs_det_jacobian(y, z), ladj_i, atol=1e-4
        ), name


def test_multivariate_transforms():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 6)
    A = jax.random.normal(ks[0], (5, 16))
    B = jax.random.normal(ks[1], (16, 5))
    f = lambda t, x: jax.nn.sigmoid(x @ A) @ B

    ts = [
        FreeFormJacobianTransform(f, 0.0, 1.0, atol=1e-7, rtol=1e-6),
        PermutationTransform(np.random.RandomState(0).permutation(5)),
        RotationTransform(jax.random.normal(ks[2], (5, 5))),
        LULinearTransform(jax.random.normal(ks[3], (5, 5))),
    ]

    for t in ts:
        name = type(t).__name__

        x = jax.random.normal(ks[4], (32, 5))
        y = t(x)
        assert y.shape == x.shape, name

        z = t.inv(y)
        assert jnp.allclose(x, z, atol=1e-4), name

        x = jax.random.normal(ks[5], (5,))
        y = t(x)

        J = jax.jacrev(t)(x)
        _, ladj = jnp.linalg.slogdet(J)

        assert jnp.allclose(t.log_abs_det_jacobian(x, y), ladj, atol=1e-4), name

        y_comp, ladj_comp = t.call_and_ladj(x)
        assert jnp.allclose(y_comp, y, atol=1e-4), name
        assert jnp.allclose(ladj_comp, ladj, atol=1e-4), name

        z = t.inv(y)
        Ji = jax.jacrev(t.inv)(y)
        _, ladj_i = jnp.linalg.slogdet(Ji)
        assert jnp.allclose(
            t.inv.log_abs_det_jacobian(y, z), ladj_i, atol=1e-4
        ), name


def test_composed_transform():
    t = ComposedTransform(
        MonotonicAffineTransform(jnp.asarray(0.5), jnp.asarray(1.0)),
        SoftclipTransform(5.0),
    )
    x = jnp.linspace(-2.0, 2.0, 17)
    y = t(x)
    assert jnp.allclose(t.inverse(y), x, atol=1e-5)

    J = jax.jacrev(t)(x)
    ladj = jnp.log(jnp.abs(jnp.diag(J)))
    _, ladj_comp = t.call_and_ladj(x)
    assert jnp.allclose(ladj_comp, ladj, atol=1e-5)

    # inverse composition
    ti = t.inv
    xi, ladj_inv = ti.call_and_ladj(y)
    assert jnp.allclose(xi, x, atol=1e-5)
    assert jnp.allclose(ladj_inv, -ladj, atol=1e-5)


def test_composed_event_dims():
    t = ComposedTransform(
        SoftclipTransform(5.0),
        PermutationTransform(np.arange(3)[::-1]),
    )
    assert t.domain_dim == 1
    assert t.codomain_dim == 1
    x = jnp.ones((7, 3)) * 0.3
    y, ladj = t.call_and_ladj(x)
    assert y.shape == (7, 3)
    assert ladj.shape == (7,)


def test_dependent_transform():
    t = DependentTransform(SoftclipTransform(5.0), 1)
    x = jnp.ones((7, 3)) * 0.2
    y, ladj = t.call_and_ladj(x)
    assert ladj.shape == (7,)
    assert t.domain_dim == 1


def test_autoregressive_transform():
    # meta builds a shift from strictly-lower-triangular dependencies, so the
    # transform is autoregressive with unit diagonal.
    D = 5
    W = jnp.asarray(np.tril(np.random.RandomState(0).randn(D, D), -1))

    def meta(x):
        shift = x @ W.T
        return DependentTransform(
            MonotonicAffineTransform(shift, jnp.zeros(D)), 1
        )

    t = AutoregressiveTransform(meta, passes=D)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, D))
    y = t(x)
    z = t.inv(y)
    assert jnp.allclose(x, z, atol=1e-6)

    J = jax.jacrev(t)(x[0])
    _, ladj = jnp.linalg.slogdet(J)
    _, ladj_comp = t.call_and_ladj(x[0])
    assert jnp.allclose(ladj_comp, ladj, atol=1e-6)


def test_coupling_transform():
    D = 6
    mask = np.arange(D) % 2 == 0
    Wa = jnp.asarray(np.random.RandomState(1).randn(3, 3))

    def meta(x_a):
        return DependentTransform(
            MonotonicAffineTransform(x_a @ Wa, jnp.zeros(3)), 1
        )

    t = CouplingTransform(meta, mask)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, D))
    y = t(x)
    assert jnp.allclose(y[..., ::2], x[..., ::2])  # constant split

    z = t.inv(y)
    assert jnp.allclose(x, z, atol=1e-6)

    J = jax.jacrev(t)(x[0])
    _, ladj = jnp.linalg.slogdet(J)
    _, ladj_comp = t.call_and_ladj(x[0])
    assert jnp.allclose(ladj_comp, ladj, atol=1e-6)


def test_shape_functions():
    # forward_shape / inverse_shape across the API (torch parity surface)
    t = SoftclipTransform(5.0)
    assert t.forward_shape((3, 4)) == (3, 4)
    assert t.inverse_shape((3, 4)) == (3, 4)

    comp = ComposedTransform(SoftclipTransform(5.0), IdentityTransform())
    assert comp.forward_shape((7,)) == (7,)
    assert comp.inverse_shape((7,)) == (7,)

    inv = comp.inv
    assert inv.forward_shape((7,)) == (7,)

    perm = PermutationTransform(np.asarray([2, 0, 1]))
    assert perm.forward_shape((5, 3)) == (5, 3)


def test_transform_event_dims():
    assert IdentityTransform().domain_dim == 0
    assert PermutationTransform(np.arange(3)).domain_dim == 1
    assert LULinearTransform(jnp.eye(3)).codomain_dim == 1
    inv = PermutationTransform(np.arange(3)).inv
    assert inv.domain_dim == 1 and inv.codomain_dim == 1
