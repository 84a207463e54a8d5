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


def test_torch_namespace_transform_breadth(key):
    r"""The torch-namespace transforms a reference port reaches through
    zuko's re-export surface (reference: zuko/transforms.py:37 re-exports
    all of torch.distributions.transforms): StickBreaking / Reshape / Cat /
    Independent — round trips, shape accounting, and autodiff-checked
    log-Jacobians."""
    from zuko_tpu.transforms import (
        CatTransform,
        ExpTransform,
        IdentityTransform,
        IndependentTransform,
        ReshapeTransform,
        SigmoidTransform,
        StickBreakingTransform,
    )

    # StickBreaking: R^K -> interior of the K-simplex (K+1 coordinates)
    t = StickBreakingTransform()
    x = jax.random.normal(key, (7, 4))
    y = t.forward(x)
    assert y.shape == (7, 5)
    assert jnp.allclose(y.sum(-1), 1.0, atol=1e-12)
    assert bool(jnp.all(y > 0))
    assert jnp.allclose(t.inverse(y), x, atol=1e-12)
    J = jax.vmap(jax.jacobian(lambda u: t.forward(u)[:-1]))(x)
    ladj = t.log_abs_det_jacobian(x, y)
    assert jnp.allclose(ladj, jnp.linalg.slogdet(J)[1], atol=1e-12)
    assert t.forward_shape((9, 4)) == (9, 5)
    assert t.inverse_shape((9, 5)) == (9, 4)

    # Reshape: volume-preserving event reshape
    r = ReshapeTransform((6,), (2, 3))
    x2 = jax.random.normal(key, (5, 6))
    y2 = r.forward(x2)
    assert y2.shape == (5, 2, 3)
    assert jnp.allclose(r.inverse(y2), x2, atol=0.0)
    assert r.log_abs_det_jacobian(x2, y2).shape == (5,)
    assert r.domain_dim == 1 and r.codomain_dim == 2
    with pytest.raises(ValueError):
        ReshapeTransform((6,), (2, 4))

    # Cat: disjoint per-slice transforms along the event axis
    c = CatTransform(
        [ExpTransform(), IdentityTransform(), SigmoidTransform()], [2, 1, 3]
    )
    x3 = jax.random.normal(key, (4, 6))
    y3 = c.forward(x3)
    assert jnp.allclose(c.inverse(y3), x3, atol=1e-12)
    J3 = jax.vmap(jax.jacobian(c.forward))(x3)
    assert jnp.allclose(
        c.log_abs_det_jacobian(x3, y3), jnp.linalg.slogdet(J3)[1], atol=1e-12
    )

    # Independent: reinterpret batch dims as event dims (summed ladj)
    it = IndependentTransform(ExpTransform(), 1)
    x4 = jax.random.normal(key, (4, 3))
    y4, l4 = it.call_and_ladj(x4)
    assert l4.shape == (4,)
    assert jnp.allclose(l4, x4.sum(-1), atol=1e-12)
    xi, li = it.inverse_and_ladj(y4)
    assert jnp.allclose(xi, x4, atol=1e-12)
    assert jnp.allclose(li, -l4, atol=1e-12)


def test_torch_namespace_transforms_parity(key):
    r"""The round-4 transform completion (AbsTransform, SoftmaxTransform,
    StackTransform, LowerCholesky/PositiveDefinite/CorrCholesky,
    CumulativeDistributionTransform): forward/inverse/ladj pinned against
    torch on CPU f64."""
    import torch
    import torch.distributions.transforms as tt

    import zuko_tpu.transforms as zt
    from zuko_tpu.distributions import Normal

    torch.set_default_dtype(torch.float64)
    rng = np.random.RandomState(0)

    # CorrCholesky: D=5 from a 10-vector
    x = rng.randn(5, 10)
    tj, tto = zt.CorrCholeskyTransform(), tt.CorrCholeskyTransform()
    yj = np.asarray(tj.forward(jnp.asarray(x)))
    yt = tto(torch.tensor(x)).numpy()
    assert np.abs(yj - yt).max() < 1e-12
    assert np.abs(np.asarray(tj.inverse(jnp.asarray(yj))) - x).max() < 1e-9
    lj = np.asarray(tj.log_abs_det_jacobian(jnp.asarray(x), jnp.asarray(yj)))
    lt = tto.log_abs_det_jacobian(torch.tensor(x), torch.tensor(yt)).numpy()
    assert np.abs(lj - lt).max() < 1e-12
    # rows of the factor have unit norm; diagonal positive
    assert np.allclose((yj**2).sum(-1), 1.0, atol=1e-12)
    assert (np.diagonal(yj, axis1=-2, axis2=-1) > 0).all()
    assert tj.forward_shape((10,)) == (5, 5)
    assert tj.inverse_shape((5, 5)) == (10,)

    # LowerCholesky / PositiveDefinite
    x2 = rng.randn(3, 4, 4)
    for zc, tc in [
        (zt.LowerCholeskyTransform(), tt.LowerCholeskyTransform()),
        (zt.PositiveDefiniteTransform(), tt.PositiveDefiniteTransform()),
    ]:
        yj = np.asarray(zc.forward(jnp.asarray(x2)))
        yt = tc(torch.tensor(x2)).numpy()
        assert np.abs(yj - yt).max() < 1e-12, type(zc).__name__
        rt = np.asarray(zc.forward(zc.inverse(jnp.asarray(yj))))
        assert np.abs(rt - yj).max() < 1e-9, type(zc).__name__

    # Stack: per-index transforms, ladj re-stacked (torch semantics)
    x3 = rng.randn(7, 2)
    sj = zt.StackTransform([zt.ExpTransform(), zt.IdentityTransform()], dim=-1)
    st = tt.StackTransform([tt.ExpTransform(), tt.identity_transform], dim=-1)
    yj = np.asarray(sj.forward(jnp.asarray(x3)))
    yt = st(torch.tensor(x3)).numpy()
    assert np.abs(yj - yt).max() < 1e-12
    lj = np.asarray(sj.log_abs_det_jacobian(jnp.asarray(x3), jnp.asarray(yj)))
    lt = st.log_abs_det_jacobian(torch.tensor(x3), torch.tensor(yt)).numpy()
    assert np.abs(lj - lt).max() < 1e-12
    assert np.abs(np.asarray(sj.inverse(jnp.asarray(yj))) - x3).max() < 1e-9

    # CumulativeDistribution: cdf forward, icdf inverse, log_prob ladj
    cj = zt.CumulativeDistributionTransform(Normal(0.5, 2.0))
    ct = tt.CumulativeDistributionTransform(
        torch.distributions.Normal(0.5, 2.0)
    )
    x4 = rng.randn(9)
    yj = np.asarray(cj.forward(jnp.asarray(x4)))
    assert np.abs(yj - ct(torch.tensor(x4)).numpy()).max() < 1e-8
    assert np.abs(np.asarray(cj.inverse(jnp.asarray(yj))) - x4).max() < 1e-6
    lj = np.asarray(cj.log_abs_det_jacobian(jnp.asarray(x4), jnp.asarray(yj)))
    lt = ct.log_abs_det_jacobian(
        torch.tensor(x4), torch.tensor(yj)
    ).numpy()
    assert np.abs(lj - lt).max() < 1e-8

    # Abs / Softmax: non-bijective utilities
    aj = zt.AbsTransform()
    assert not aj.bijective
    assert np.allclose(np.asarray(aj.forward(jnp.asarray([-2.0, 3.0]))),
                       [2.0, 3.0])
    smj = zt.SoftmaxTransform()
    y = np.asarray(smj.forward(jnp.asarray(rng.randn(6, 4))))
    assert np.allclose(y.sum(-1), 1.0, atol=1e-12)
    x5 = np.asarray(smj.forward(smj.inverse(jnp.asarray(y))))
    assert np.abs(x5 - y).max() < 1e-12
