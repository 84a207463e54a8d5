r"""Tests for zuko_tpu.flows — mirrors the reference battery
(reference: tests/test_flows.py): log_prob shape+grads, sampling, rsample
grads, invertibility (atol 1e-4), Jacobian correctness (atol 1e-3),
serialization round-trip, triangular builders, and adjacency semantics."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from functools import partial

from zuko_tpu import serial
from zuko_tpu.core import combine, named_parameters, partition
from zuko_tpu.flows import (
    BPF,
    CNF,
    GF,
    MAF,
    NAF,
    NCSF,
    NICE,
    NSF,
    SOSPF,
    UNAF,
    ElementWiseTransform,
    GeneralCouplingTransform,
    MaskedAutoregressiveTransform,
)

FLOWS = [NICE, MAF, NSF, SOSPF, NAF, UNAF, CNF, GF, BPF]


def _make(F, key):
    if F in (NAF, UNAF):
        return F(3, 5, signal=8, key=key)
    return F(3, 5, key=key)


@pytest.mark.parametrize("F", FLOWS)
def test_flows(tmp_path, F, key):
    kf, kx, kc, ks = jax.random.split(key, 4)
    flow = _make(F, kf)
    name = F.__name__

    # log_prob shape and gradients to every parameter
    x = jax.random.normal(kx, (64, 3))
    c = jax.random.normal(kc, (5,))

    log_p = flow(c).log_prob(x)
    assert log_p.shape == (64,), name

    params, static = partition(flow)

    def loss(p):
        return -jnp.mean(combine(p, static)(c).log_prob(x))

    grads = jax.grad(loss)(params)
    for n, g in named_parameters(grads):
        assert jnp.all(jnp.isfinite(g)), (name, n)

    # Sampling
    s = flow(c).sample(ks, (32,))
    assert s.shape == (32, 3), name

    # Reparameterization trick
    def sample_loss(p):
        xs = combine(p, static)(c).rsample(ks, (8,))
        return jnp.sqrt(jnp.sum(xs**2))

    grads = jax.grad(sample_loss)(params)
    for n, g in named_parameters(grads):
        assert jnp.all(jnp.isfinite(g)), (name, n)

    # Invertibility
    xb = jax.random.normal(kx, (64, 3))
    cb = jax.random.normal(kc, (64, 5))
    t = flow(cb).transform
    z = t.inv(t(xb))
    assert jnp.allclose(xb, z, atol=1e-4), name

    # Jacobian
    x1 = jax.random.normal(kx, (3,))
    c1 = jax.random.normal(kc, (5,))
    t = flow(c1).transform
    y1 = t(x1)

    J = jax.jacrev(t)(x1)
    J_inv = jax.jacrev(t.inv)(y1)
    assert jnp.allclose(J, jnp.linalg.inv(J_inv), atol=1e-3), name

    _, ladj = jnp.linalg.slogdet(J)
    assert jnp.allclose(t.log_abs_det_jacobian(x1, y1), ladj, atol=1e-3), name

    # Serialization round-trip (reference: tests/test_flows.py:77-91)
    path = tmp_path / "flow.pkl"
    serial.save(path, flow)
    flow_bis = serial.load(path)

    lp = flow(c1).log_prob(x1)
    lp_bis = flow_bis(c1).log_prob(x1)
    assert jnp.allclose(lp, lp_bis), name

    # Params-only checkpoint
    path2 = tmp_path / "flow.npz"
    serial.save_params(path2, flow)
    flow_ter = serial.load_params(flow, path2)
    assert jnp.allclose(flow_ter(c1).log_prob(x1), lp), name

    # Printing
    assert repr(flow), name


def test_ncsf(key):
    kf, kx = jax.random.split(key)
    flow = NCSF(3, 5, key=kf)
    c = jax.random.normal(kx, (5,))
    x = flow(c).sample(kx, (16,))
    assert x.shape == (16, 3)
    lp = flow(c).log_prob(x)
    assert jnp.all(jnp.isfinite(lp))


def test_triangular_transforms(key):
    rng = np.random.RandomState(7)
    order = rng.permutation(5)

    adjacency = rng.rand(5, 5) < 0.25
    adjacency = adjacency | np.eye(5, dtype=bool)
    adjacency = np.tril(adjacency)
    adjacency[1, 0] = True
    adjacency = adjacency[order, :][:, order]

    Ts = [
        ElementWiseTransform,
        GeneralCouplingTransform,
        partial(GeneralCouplingTransform, mask=order % 2 == 0),
        MaskedAutoregressiveTransform,
        partial(MaskedAutoregressiveTransform, passes=2),
        partial(MaskedAutoregressiveTransform, order=order),
        partial(MaskedAutoregressiveTransform, adjacency=adjacency),
    ]

    for T in Ts:
        tname = getattr(T, "func", T).__name__

        # Without context
        t = T(5, key=key)
        x = jax.random.normal(key, (16, 5))
        y = t(None)(x)
        assert y.shape == x.shape, tname
        assert jnp.allclose(t(None).inv(y), x, atol=1e-4), tname

        # With context
        t = T(5, 7, key=key)
        c = jax.random.normal(key, (7,))
        y = t(c)(x)
        assert y.shape == x.shape, tname
        assert jnp.allclose(t(c).inv(y), x, atol=1e-4), tname

        # Jacobian triangularity: |diag J| log-sum == ladj
        t = T(5, key=key)
        x1 = jax.random.normal(key, (5,))
        tr = t(None)
        y1 = tr(x1)
        J = jax.jacrev(tr)(x1)
        _, ladj = jnp.linalg.slogdet(J)
        assert jnp.allclose(tr.log_abs_det_jacobian(x1, y1), ladj, atol=1e-4), tname
        assert jnp.allclose(
            jnp.sum(jnp.log(jnp.abs(jnp.diag(J)))), ladj, atol=1e-4
        ), tname


def test_adjacency_matrix(key):
    T = MaskedAutoregressiveTransform
    rng = np.random.RandomState(11)
    order = rng.permutation(5)

    adjacency = rng.rand(5, 5) < 0.25
    adjacency = adjacency | np.eye(5, dtype=bool)
    adjacency = np.tril(adjacency)
    adjacency[1, 0] = True
    adjacency = adjacency[order, :][:, order]

    t = T(5, adjacency=adjacency, key=key)
    x = jax.random.normal(key, (5,))

    J = jax.jacrev(t(None))(x)
    assert jnp.allclose(J[~adjacency], 0.0)

    # False on the diagonal
    invalid = adjacency.copy()
    invalid[0, 0] = False
    with pytest.raises(AssertionError, match="ones on the diagonal"):
        T(5, adjacency=invalid, key=key)

    # Cycles
    invalid = adjacency.copy()
    invalid[0, 1] = True
    invalid[1, 0] = True
    with pytest.raises(AssertionError, match="contains cycles"):
        T(5, adjacency=invalid, key=key)


def test_context_adjacency_matrix(key):
    T = MaskedAutoregressiveTransform
    rng = np.random.RandomState(13)
    order = rng.permutation(5)

    adjacency = rng.rand(5, 5) < 0.25
    adjacency = adjacency | np.eye(5, dtype=bool)
    adjacency = np.tril(adjacency)
    adjacency = adjacency[order, :][:, order]

    adjacency_context = rng.rand(5, 2) < 0.5
    valid = np.concatenate([adjacency, adjacency_context], axis=1)

    t = T(features=5, context=2, adjacency=valid, key=key)
    x = jax.random.normal(key, (5,))
    c = jax.random.normal(key, (2,))
    y = t(c)(x)

    assert y.shape == x.shape
    assert jnp.allclose(t(c).inv(y), x, atol=1e-4)

    J = jax.jacrev(t(c))(x)
    assert jnp.allclose(J[~adjacency], 0.0)

    _, ladj = jnp.linalg.slogdet(J)
    assert jnp.allclose(t(c).log_abs_det_jacobian(x, y), ladj, atol=1e-4)
    assert jnp.allclose(jnp.sum(jnp.log(jnp.abs(jnp.diag(J)))), ladj, atol=1e-4)

    invalid = np.concatenate([adjacency, rng.rand(5, 1) < 0.5], axis=1)
    with pytest.raises(AssertionError, match="5 or 7 columns"):
        T(features=5, context=2, adjacency=invalid, key=key)


def test_unconditional_flows(key):
    for F in [MAF, NICE]:
        flow = F(3, key=key)
        d = flow(None)
        x = d.sample(key, (8,))
        assert x.shape == (8, 3)
        lp = d.log_prob(x)
        assert lp.shape == (8,)

        # fused sampling + log_prob
        x2, lp2 = d.rsample_and_log_prob(key, (8,))
        assert jnp.allclose(lp2, d.log_prob(x2), atol=1e-5)


def test_sample_shape_context_combinations(key):
    # sample_shape x batched-context interplay (reference semantics:
    # zuko/lazy.py:167-170 — context batch propagates via expand)
    flow = NSF(3, 5, transforms=2, key=key)

    c1 = jax.random.normal(key, (5,))          # unbatched context
    c2 = jax.random.normal(key, (7, 5))        # batched context

    d1, d2 = flow(c1), flow(c2)
    assert d1.batch_shape == () and d2.batch_shape == (7,)
    assert d1.event_shape == (3,) and d2.event_shape == (3,)

    assert d1.sample(key).shape == (3,)
    assert d1.sample(key, (4,)).shape == (4, 3)
    assert d2.sample(key).shape == (7, 3)
    assert d2.sample(key, (4,)).shape == (4, 7, 3)

    x = d2.sample(key, (4,))
    assert d2.log_prob(x).shape == (4, 7)

    xs, lp = d2.rsample_and_log_prob(key, (4,))
    assert xs.shape == (4, 7, 3) and lp.shape == (4, 7)
    assert jnp.allclose(lp, d2.log_prob(xs), atol=1e-4)


def test_cnf_hutchinson(key):
    r"""Hutchinson trace is reachable through the public flow API
    (reference: zuko/transforms.py:1154,1171-1179) and unbiased within
    tolerance of the exact-trace density."""
    kf, kx, kh = jax.random.split(key, 3)
    flow = CNF(2, exact=False, key=kf)
    x = jax.random.normal(kx, (4, 2))

    # No key -> loud failure, not a silent wrong answer.
    with pytest.raises(ValueError, match="Hutchinson"):
        flow(None).log_prob(x)

    lp = flow(None, key=kh).log_prob(x)
    assert lp.shape == (4,) and jnp.all(jnp.isfinite(lp))

    # Unbiasedness: E[eps^T J eps] = tr J. Average over many keys and compare
    # with the exact-trace path within Monte-Carlo error.
    exact = CNF(2, exact=True, key=kf)
    lp_exact = exact(None).log_prob(x)

    keys = jax.random.split(kh, 256)
    lps = jax.vmap(lambda k: flow(None, key=k).log_prob(x))(keys)
    err = jnp.abs(lps.mean(axis=0) - lp_exact)
    stderr = lps.std(axis=0) / jnp.sqrt(lps.shape[0])
    assert jnp.all(err < 4 * stderr + 1e-2), (err, stderr)

    # Gradients route to the ODE network through the estimator.
    params, static = partition(flow)
    g = jax.grad(
        lambda p: -jnp.mean(combine(p, static)(None, key=kh).log_prob(x))
    )(params)
    for n, gl in named_parameters(g):
        assert jnp.all(jnp.isfinite(gl)), n


@pytest.mark.parametrize("F,kw", [(MAF, "randperm"), (NICE, "randmask")])
def test_random_orders_and_masks(F, kw, key):
    r"""randperm (MAF, reference: zuko/flows/autoregressive.py:294-307) and
    randmask (NICE, reference: zuko/flows/coupling.py:180-190) options."""
    kf, kx, kc, ks = jax.random.split(key, 4)
    flow = F(5, 3, transforms=3, **{kw: True}, key=kf)

    x = jax.random.normal(kx, (16, 5))
    c = jax.random.normal(kc, (3,))
    lp = flow(c).log_prob(x)
    assert lp.shape == (16,) and jnp.all(jnp.isfinite(lp))

    # invertibility + Jacobian contract still hold
    t = flow(c).transform
    assert jnp.allclose(t.inv(t(x)), x, atol=1e-4)

    x1 = jax.random.normal(ks, (5,))
    J = jax.jacrev(t)(x1)
    _, ladj = jnp.linalg.slogdet(J)
    assert jnp.allclose(t.log_abs_det_jacobian(x1, t(x1)), ladj, atol=1e-3)

    s = flow(c).sample(ks, (8,))
    assert s.shape == (8, 5)


def test_deprecated_submodule_shims():
    r"""The deprecated ``flows.core`` / ``flows.mixture`` shims keep
    reference-port imports working (reference: zuko/flows/core.py:1-21,
    zuko/flows/mixture.py:1-12)."""
    from zuko_tpu.flows.core import Flow as CoreFlow
    from zuko_tpu.flows.mixture import GMM as ShimGMM
    from zuko_tpu.lazy import Flow
    from zuko_tpu.mixtures import GMM

    assert CoreFlow is Flow
    assert ShimGMM is GMM

    # reference top-level re-export (zuko/flows/__init__.py:15)
    from zuko_tpu.flows import GMM as TopGMM

    assert TopGMM is GMM


def test_vmap_param_ensembles(key):
    r"""Deep ensembles for free: modules are pytrees, so ``jax.vmap`` over
    a stacked params axis evaluates E independent flows in ONE compiled
    program (no torch equivalent — the idiomatic JAX/TPU win). Each
    ensemble row must match its standalone flow exactly, and gradients
    must flow per-member."""
    from zuko_tpu.core import combine, partition
    from zuko_tpu.flows import NSF

    E = 4
    keys = jax.random.split(key, E)
    members = [
        NSF(3, 0, transforms=2, hidden_features=(8, 8), key=k) for k in keys
    ]
    params_list = [partition(m)[0] for m in members]
    static = partition(members[0])[1]
    stacked = jax.tree_util.tree_map(
        lambda *a: jnp.stack(a), *params_list)

    x = jax.random.normal(jax.random.PRNGKey(1), (16, 3))

    @jax.jit
    def ensemble_lp(stacked, x):
        return jax.vmap(
            lambda p: combine(p, static)(None).log_prob(x))(stacked)

    lp = ensemble_lp(stacked, x)
    assert lp.shape == (E, 16)
    for e, m in enumerate(members):
        ref = m(None).log_prob(x)
        assert jnp.allclose(lp[e], ref, atol=1e-6), e

    # per-member gradients through the vmapped ensemble
    def loss(stacked):
        return jnp.sum(ensemble_lp(stacked, x), axis=-1)  # (E,)

    g = jax.jacrev(lambda s: loss(s))(stacked)
    # each member's gradient row matches its standalone gradient
    g0 = jax.grad(lambda p: -jnp.mean(
        combine(p, static)(None).log_prob(x)))(params_list[0])
    leaves_ens = jax.tree_util.tree_leaves(g)
    assert all(leaf.shape[0] == E for leaf in leaves_ens)
    g0_leaves = jax.tree_util.tree_leaves(g0)
    for le, l0 in zip(leaves_ens, g0_leaves):
        # jacrev of sum(lp) w.r.t. member 0 == -16*mean-grad of member 0
        assert jnp.allclose(le[0, 0], -16.0 * l0, atol=1e-4), (
            le.shape, l0.shape)

    # vmapped sampling: one key per member
    @jax.jit
    def ensemble_sample(stacked, ks):
        return jax.vmap(
            lambda p, k: combine(p, static)(None).sample(k, (8,))
        )(stacked, ks)

    xs = ensemble_sample(stacked, jax.random.split(jax.random.PRNGKey(2), E))
    assert xs.shape == (E, 8, 3)
    x0 = members[0](None).sample(
        jax.random.split(jax.random.PRNGKey(2), E)[0], (8,))
    assert jnp.allclose(xs[0], x0, atol=1e-6)
