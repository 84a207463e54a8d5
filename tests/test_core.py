r"""Tests for the pytree module system (zuko_tpu.core)."""

import jax
import jax.numpy as jnp
import pytest

from zuko_tpu.core import Module, combine, partition


class Inner(Module):
    def __init__(self, w):
        self.w = w
        self.name = "inner"


class Outer(Module):
    def __init__(self, w, b, mask):
        self.inner = Inner(w)
        self.b = b
        self.register_buffer("mask", mask)
        self.depth = 3


def make():
    return Outer(jnp.ones((2, 2)), jnp.zeros(2), jnp.asarray([1.0, 0.0]))


def test_pytree_roundtrip():
    m = make()
    leaves, treedef = jax.tree_util.tree_flatten(m)
    assert len(leaves) == 3  # w, b, mask
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(m2, Outer)
    assert m2.depth == 3
    assert m2.inner.name == "inner"
    assert jnp.allclose(m2.inner.w, m.inner.w)


def test_static_config_not_traced():
    m = make()
    calls = []

    @jax.jit
    def f(mod):
        calls.append(1)
        return mod.inner.w * mod.depth

    f(m)
    f(make())
    assert len(calls) == 1  # same static config -> cache hit

    m3 = make()
    m3.depth = 4
    f(m3)
    assert len(calls) == 2  # different static config -> retrace


def test_partition_combine():
    m = make()
    params, static = partition(m)
    # trainable: w, b; frozen: mask
    p_leaves = jax.tree_util.tree_leaves(params)
    s_leaves = jax.tree_util.tree_leaves(static)
    assert len(p_leaves) == 2
    assert len(s_leaves) == 1
    m2 = combine(params, static)
    assert jnp.allclose(m2.mask, m.mask)
    assert jnp.allclose(m2.inner.w, m.inner.w)
    assert m2.depth == 3


def test_grad_through_partition():
    m = make()
    params, static = partition(m)

    def loss(p, x):
        mod = combine(p, static)
        return jnp.sum((mod.inner.w @ x + mod.b) * mod.mask)

    g = jax.grad(loss)(params, jnp.ones(2))
    assert g.inner.w.shape == (2, 2)
    # gradient w.r.t. masked-out output is zero
    assert jnp.allclose(g.b, jnp.asarray([1.0, 0.0]))


def test_tree_replace():
    m = make()
    m2 = m.tree_replace(b=jnp.ones(2))
    assert jnp.allclose(m2.b, 1.0)
    assert jnp.allclose(m.b, 0.0)


def test_repr():
    m = make()
    r = repr(m)
    assert "Outer" in r and "Inner" in r and "mask" in r
