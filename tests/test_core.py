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


def test_partial_over_array_is_dynamic():
    """A functools.partial closing over an array must ride the DYNAMIC side
    of the pytree: were it static, a partial built over a traced context
    (AutoregressiveTransform.meta in a conditional flow) would hide a tracer
    in the static aux and leak it across the next jit boundary."""
    import functools

    class Holder(Module):
        def __init__(self, fn):
            self.fn = fn

    def f(c, x):
        return c + x

    # static partial: no array content -> aux side, zero leaves
    m_static = Holder(functools.partial(f, 2.0))
    assert len(jax.tree_util.tree_leaves(m_static)) == 0

    # array-closing partial: dynamic leaf, round-trips through flatten
    m_dyn = Holder(functools.partial(f, jnp.ones(3)))
    leaves, treedef = jax.tree_util.tree_flatten(
        m_dyn, is_leaf=lambda v: isinstance(v, functools.partial)
    )
    assert len(leaves) == 1 and isinstance(leaves[0], functools.partial)
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert jnp.allclose(m2.fn(jnp.zeros(3)), 1.0)

    # and a jit boundary rejects it loudly instead of leaking a tracer
    with pytest.raises(TypeError):
        jax.jit(lambda m: 0.0)(m_dyn)
