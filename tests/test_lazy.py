r"""Tests for the lazy DSL layer (zuko_tpu.lazy) and utils.Partial."""

import warnings

import jax
import jax.numpy as jnp
import pytest

from zuko_tpu.distributions import DiagNormal
from zuko_tpu.flows import MAF, Flow
from zuko_tpu.lazy import (
    LazyComposedTransform,
    LazyInverse,
    Unconditional,
    UnconditionalDistribution,
    UnconditionalTransform,
)
from zuko_tpu.transforms import SoftclipTransform
from zuko_tpu.utils import Partial


def test_lazy_inverse_flip(key):
    flow = MAF(3, transforms=2, key=key)
    inv = flow.transform.inv
    assert isinstance(inv, LazyInverse)
    assert inv.inv is flow.transform

    # flipping swaps forward/inverse
    x = jax.random.normal(key, (8, 3))
    t = flow.transform(None)
    ti = inv(None)
    assert jnp.allclose(ti(t(x)), x, atol=1e-5)

    # reverse-KL pattern: Flow(transform.inv, base) samples via forward pass
    rev = Flow(flow.transform.inv, flow.base)
    z, lp = rev(None).rsample_and_log_prob(key, (16,))
    assert z.shape == (16, 3)
    assert jnp.allclose(lp, rev(None).log_prob(z), atol=1e-5)


def test_lazy_composed(key):
    lazy = LazyComposedTransform(
        UnconditionalTransform(SoftclipTransform, bound=5.0),
        UnconditionalTransform(SoftclipTransform, bound=7.0),
    )
    t = lazy(None)
    x = jnp.asarray([0.3, -0.2])
    assert jnp.allclose(t.inverse(t(x)), x, atol=1e-6)


def test_unconditional_deprecated_shim():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        d = Unconditional(DiagNormal, jnp.zeros(2), jnp.ones(2), buffer=True)
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert isinstance(d, UnconditionalDistribution)

    with warnings.catch_warnings(record=True):
        warnings.simplefilter("ignore")
        t = Unconditional(SoftclipTransform, bound=5.0)
    assert isinstance(t, UnconditionalTransform)


def test_unconditional_buffer_frozen(key):
    from zuko_tpu.core import partition

    base = UnconditionalDistribution(
        DiagNormal, jnp.zeros(2), jnp.ones(2), buffer=True
    )
    params, static = partition(base)
    assert len(jax.tree_util.tree_leaves(params)) == 0
    assert len(jax.tree_util.tree_leaves(static)) == 2


def test_partial_module():
    mul = Partial(jnp.multiply, jnp.asarray(2.0))
    assert float(mul(jnp.asarray(3.0))) == 6.0

    leaves = jax.tree_util.tree_leaves(mul)
    assert len(leaves) == 1  # the bound argument is a parameter
