r"""Tests for zuko_tpu.bayesian — mirrors the reference contract
(reference: tests/test_bayesian.py): determinism within/across contexts,
masked-Jacobian preservation, gradient routing to the posterior only,
sampling/invertibility/serialization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zuko_tpu import serial
from zuko_tpu.bayesian import BayesianModel
from zuko_tpu.core import combine, named_parameters, partition
from zuko_tpu.flows import NSF
from zuko_tpu.nn import MLP, MaskedMLP


@pytest.mark.parametrize("local_trick", [False, True])
def test_determinism(key, local_trick):
    net = MLP(3, 2, key=key)
    model = BayesianModel(net, key=key)
    x = jnp.ones(3)

    k1, k2 = jax.random.split(key)

    # same key (same "context") -> identical outputs
    m_a = model.reparameterize(k1, local_trick=local_trick)
    y1 = m_a(x)
    y2 = m_a(x)
    assert jnp.allclose(y1, y2)
    m_b = model.reparameterize(k1, local_trick=local_trick)
    assert jnp.allclose(m_b(x), y1)

    # different key (new context) -> different outputs
    m_c = model.reparameterize(k2, local_trick=local_trick)
    assert not jnp.allclose(m_c(x), y1)


def test_masked_jacobian_preserved(key):
    adjacency = np.tril(np.ones((4, 4), bool))
    net = MaskedMLP(adjacency, (16,), key=key)
    model = BayesianModel(net, key=key)

    for local_trick in (False, True):
        m = model.reparameterize(key, local_trick=local_trick)
        J = jax.jacfwd(m)(jnp.zeros(4))
        assert jnp.allclose(J[~adjacency], 0.0), local_trick


def test_gradients_to_posterior_not_base(key):
    net = MLP(3, 2, (8,), key=key)
    model = BayesianModel(net, key=key)
    x = jnp.ones((5, 3))

    params, static = partition(model)

    def loss(p):
        m = combine(p, static).reparameterize(key)
        return jnp.sum(m(x) ** 2) + 1e-6 * combine(p, static).kl_divergence()

    grads = jax.grad(loss)(params)

    # posterior grads exist and are finite
    mean_grads = [g for n, g in named_parameters(grads) if n.startswith("means")]
    logvar_grads = [g for n, g in named_parameters(grads) if n.startswith("logvars")]
    assert mean_grads and logvar_grads
    assert any(float(jnp.abs(g).max()) > 0 for g in mean_grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in mean_grads + logvar_grads)

    # base params are replaced by the posterior draw -> zero gradients
    base_grads = [g for n, g in named_parameters(grads) if n.startswith("base")]
    assert all(float(jnp.abs(g).max()) == 0 for g in base_grads)


def test_include_exclude_filters(key):
    net = MLP(3, 2, (8,), key=key)
    model = BayesianModel(net, include_params=("layers.0",), key=key)
    assert all(n.startswith("layers.0") for n in model.means)

    model = BayesianModel(net, exclude_params=("layers.0",), key=key)
    assert not any(n.startswith("layers.0") for n in model.means)


def test_bayesian_flow(key, tmp_path):
    flow = NSF(2, transforms=2, key=key)
    model = BayesianModel(flow, key=key)

    sampled_flow = model.reparameterize(key)
    x = sampled_flow(None).sample(key, (16,))
    assert x.shape == (16, 2)

    # invertibility of the sampled flow
    t = sampled_flow(None).transform
    z = t.inv(t(x))
    assert jnp.allclose(x, z, atol=1e-4)

    # sample_model: standalone, no gradient flow needed
    standalone = model.sample_model(key)
    assert jnp.all(jnp.isfinite(standalone(None).log_prob(x)))

    # serialization round-trip
    path = tmp_path / "bayes.pkl"
    serial.save(path, model)
    model2 = serial.load(path)
    lp1 = model.reparameterize(key)(None).log_prob(x)
    lp2 = model2.reparameterize(key)(None).log_prob(x)
    assert jnp.allclose(lp1, lp2)


def test_forward_raises(key):
    model = BayesianModel(MLP(3, 2, key=key), key=key)
    with pytest.raises(RuntimeError, match="should not be called directly"):
        model(jnp.ones(3))
