r"""Tests for zuko_tpu.nn — mirrors the reference contract (tests/test_nn.py):
shapes, MaskedMLP Jacobian zero-pattern == adjacency (incl. cross-batch
zeros), MonotonicMLP strictly-positive Jacobian."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zuko_tpu.core import combine, partition
from zuko_tpu.nn import (
    MLP,
    Linear,
    MaskedMLP,
    MonotonicMLP,
)


def test_linear_shapes(key):
    layer = Linear(3, 5, key=key)
    assert layer(jnp.ones(3)).shape == (5,)
    assert layer(jnp.ones((7, 3))).shape == (7, 5)

    stacked = Linear(3, 5, stack=4, key=key)
    assert stacked(jnp.ones((4, 3))).shape == (4, 5)
    assert stacked(jnp.ones((7, 4, 3))).shape == (7, 4, 5)


def test_mlp(key):
    net = MLP(8, 2, (32, 16), key=key)
    x = jnp.ones((5, 8))
    y = net(x)
    assert y.shape == (5, 2)

    params, static = partition(net)

    def loss(p):
        return jnp.sum(combine(p, static)(x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert len(leaves) == 6  # 3 layers x (weight, bias)
    assert all(jnp.all(jnp.isfinite(l)) for l in leaves)

    net = MLP(8, 2, (32, 16), normalize=True, key=key)
    assert net(x).shape == (5, 2)


@pytest.mark.parametrize("residual", [False, True])
def test_masked_mlp_jacobian(key, residual):
    rng = np.random.RandomState(0)
    adjacency = rng.rand(4, 3) < 0.5
    adjacency[0] = [True, False, True]  # guarantee non-null

    net = MaskedMLP(adjacency, (16, 32), residual=residual, key=key)
    x = jax.random.normal(key, (3,))
    J = jax.jacfwd(net)(x)
    assert J.shape == (4, 3)
    assert jnp.allclose(J[~adjacency], 0.0), J

    # cross-batch independence
    xb = jax.random.normal(key, (2, 3))
    Jb = jax.jacfwd(net)(xb)  # (2, 4, 2, 3)
    assert jnp.allclose(Jb[0, :, 1, :], 0.0)
    assert jnp.allclose(Jb[1, :, 0, :], 0.0)


def test_masked_mlp_null_jacobian_raises(key):
    adjacency = np.zeros((3, 3), bool)
    with pytest.raises(ValueError, match="null Jacobian"):
        MaskedMLP(adjacency, (8,), key=key)


def test_masked_mlp_autoregressive(key):
    # strictly-lower-triangular adjacency = MADE conditioner
    D = 5
    adjacency = np.tril(np.ones((D, D), bool), -1)
    adjacency[0, 0] = True
    net = MaskedMLP(adjacency, (32, 32), key=key)
    J = jax.jacfwd(net)(jnp.zeros(D))
    assert jnp.allclose(J[~adjacency], 0.0)


def test_monotonic_mlp(key):
    net = MonotonicMLP(3, 4, (16, 32), key=key)
    x = jax.random.normal(key, (3,))
    J = jax.jacfwd(net)(x)
    assert (J > 0).all()
