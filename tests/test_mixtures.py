r"""Tests for zuko_tpu.mixtures — mirrors the reference battery
(reference: tests/test_mixtures.py): API/shapes per covariance type and
strategy, tied-covariance equality, and error paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zuko_tpu import serial
from zuko_tpu.core import combine, named_parameters, partition
from zuko_tpu.mixtures import GMM

COV_TYPES = ["full", "diagonal", "spherical"]


@pytest.mark.parametrize("cov", COV_TYPES)
@pytest.mark.parametrize("tied", [False, True])
def test_gmm_api(key, cov, tied):
    kx, kc, ks = jax.random.split(key, 3)

    # Unconditional
    gmm = GMM(3, components=4, covariance_type=cov, tied=tied, key=key)
    d = gmm(None)
    assert d.event_shape == (3,)

    x = d.sample(ks, (16,))
    assert x.shape == (16, 3)
    lp = d.log_prob(x)
    assert lp.shape == (16,)
    assert jnp.all(jnp.isfinite(lp))

    # Conditional
    gmm = GMM(3, context=5, components=4, covariance_type=cov, tied=tied, key=key)
    c = jax.random.normal(kc, (8, 5))
    d = gmm(c)
    x = d.sample(ks)
    assert x.shape == (8, 3)
    assert d.log_prob(x).shape == (8,)

    # gradients
    params, static = partition(gmm)

    def loss(p):
        return -jnp.mean(combine(p, static)(c).log_prob(x))

    grads = jax.grad(loss)(params)
    for n, g in named_parameters(grads):
        assert jnp.all(jnp.isfinite(g)), n


@pytest.mark.parametrize("strategy", ["random", "kmeans", "kmeans++"])
@pytest.mark.parametrize("cov", COV_TYPES)
def test_gmm_initialize(key, strategy, cov):
    x = np.random.RandomState(0).randn(100, 3)
    gmm = GMM(3, components=4, covariance_type=cov, key=key)
    gmm2 = gmm.initialize(x, strategy, key=key)

    lp = gmm2(None).log_prob(jnp.asarray(x))
    assert jnp.all(jnp.isfinite(lp))
    # initialization should beat random parameters on the data
    lp0 = gmm(None).log_prob(jnp.asarray(x))
    assert float(lp.mean()) > float(lp0.mean())

    # Conditional initialization writes into the last hyper layer
    gmm = GMM(3, context=5, components=4, covariance_type=cov, key=key)
    gmm2 = gmm.initialize(x, strategy, key=key)
    c = jnp.zeros(5)
    lp = gmm2(c).log_prob(jnp.asarray(x))
    assert jnp.all(jnp.isfinite(lp))


def test_gmm_tied_equality(key):
    # tied covariance: all components share the same scale
    x = np.random.RandomState(1).randn(64, 2)
    gmm = GMM(2, components=3, covariance_type="full", tied=True, key=key)
    gmm = gmm.initialize(x, "kmeans", key=key)
    d = gmm(None)
    tril = d.base.scale_tril
    assert tril.shape[0] == 1 or jnp.allclose(tril, tril[:1])


def test_gmm_errors(key):
    with pytest.raises(NotImplementedError, match="covariance type"):
        GMM(2, covariance_type="banana", key=key)(None)

    gmm = GMM(2, components=8, key=key)
    with pytest.raises(AssertionError, match="number of samples"):
        gmm.initialize(np.zeros((4, 2)), "random", key=key)

    with pytest.raises(NotImplementedError, match="clustering strategy"):
        gmm.initialize(np.random.randn(32, 2), "banana", key=key)


def test_gmm_serialization(tmp_path, key):
    gmm = GMM(2, components=3, key=key)
    path = tmp_path / "gmm.pkl"
    serial.save(path, gmm)
    gmm2 = serial.load(path)
    x = jnp.zeros((4, 2))
    assert jnp.allclose(gmm(None).log_prob(x), gmm2(None).log_prob(x))
