r"""Tests for zuko_tpu.distributions — mirrors the reference battery
(reference: tests/test_distributions.py): shapes, Monte-Carlo normalization
(mass in [0.9, 1.1] with 2^18 samples), and expand."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zuko_tpu.distributions import (
    BoxUniform,
    DiagNormal,
    GeneralizedNormal,
    Joint,
    Maximum,
    Minimum,
    Mixture,
    Normal,
    NormalizingFlow,
    Sort,
    TopK,
    TransformedUniform,
    Truncated,
    Uniform,
)
from zuko_tpu.transforms import MonotonicAffineTransform, SoftclipTransform


def _cases(key):
    k1, k2 = jax.random.split(key)
    return [
        NormalizingFlow(
            MonotonicAffineTransform(jnp.asarray(0.5), jnp.asarray(1.0)),
            Normal(0.0, 1.0),
        ),
        Joint(Uniform(0.0, 1.0), Normal(0.0, 1.0)),
        Mixture(Normal(jax.random.normal(k1, (2,)), jnp.ones(2)), jax.random.normal(k2, (2,))),
        GeneralizedNormal(2.0),
        DiagNormal(jnp.zeros(2), jnp.ones(2)),
        BoxUniform(-jnp.ones(2), jnp.ones(2)),
        TransformedUniform(SoftclipTransform(2.0), -1.0, 1.0),
        Truncated(Normal(0.0, 1.0), 1.0, 2.0),
        Sort(Normal(0.0, 1.0), 2),
        TopK(Normal(0.0, 1.0), 2, 3),
        Minimum(Normal(0.0, 1.0), 3),
        Maximum(Normal(0.0, 1.0), 3),
    ]


def test_distributions(key):
    shape = (2**18,)

    for d in _cases(key):
        name = type(d).__name__
        assert d.batch_shape == (), name

        # Shapes
        x = d.sample(key, shape)
        assert x.shape == shape + d.event_shape, name

        log_p = d.log_prob(x)
        assert log_p.shape == shape, name

        # Monte-Carlo normalization (reference: tests/test_distributions.py:41-48)
        lower = x.min(axis=0)
        upper = x.max(axis=0)
        width = upper - lower

        u = Uniform(lower - width / 2, upper + width / 2).sample(key, shape)
        p = jnp.mean(jnp.exp(d.log_prob(u))) * jnp.prod(2 * width)

        assert 0.9 <= float(p) <= 1.1, (name, float(p))

        # Expand
        d = d.expand((32,))
        assert d.batch_shape == (32,), name

        x = d.sample(key)
        assert x.shape == d.batch_shape + d.event_shape, name

        log_p = d.log_prob(x)
        assert log_p.shape == d.batch_shape, name


def test_rsample_and_log_prob(key):
    d = NormalizingFlow(
        MonotonicAffineTransform(jnp.asarray(0.5), jnp.asarray(1.0)),
        Normal(0.0, 1.0),
    )
    x, lp = d.rsample_and_log_prob(key, (128,))
    assert x.shape == (128,)
    assert jnp.allclose(lp, d.log_prob(x), atol=1e-6)


def test_truncated_cdf_sampling(key):
    d = Truncated(Normal(0.0, 1.0), -1.0, 2.0)
    x = d.sample(key, (4096,))
    assert float(x.min()) >= -1.0
    assert float(x.max()) <= 2.0
