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


def test_extra_primitives(key):
    from zuko_tpu.distributions import (
        Cauchy,
        Exponential,
        Gamma,
        Gumbel,
        Laplace,
        LogNormal,
        StudentT,
        Beta,
    )

    ds = [
        Exponential(1.5),
        LogNormal(0.2, 0.8),
        Cauchy(0.0, 1.0),
        StudentT(4.0),
        Gumbel(0.0, 1.0),
        Laplace(0.0, 1.0),
        Gamma(2.0, 1.0),
        Beta(2.0, 3.0),
    ]
    shape = (2**16,)

    for d in ds:
        name = type(d).__name__
        x = d.sample(key, shape)
        assert x.shape == shape, name
        lp = d.log_prob(x)
        assert jnp.all(jnp.isfinite(lp)), name

        # MC normalization over the sample range
        lower, upper = x.min(), x.max()
        width = upper - lower
        u = Uniform(lower, upper).sample(key, shape)
        mass = jnp.mean(jnp.exp(d.log_prob(u))) * width
        assert 0.85 <= float(mass) <= 1.1, (name, float(mass))

        d2 = d.expand((7,))
        assert d2.batch_shape == (7,), name
        assert d2.log_prob(d2.sample(key)).shape == (7,), name


def test_topk_k_bounds(key):
    from zuko_tpu.distributions import Normal, TopK

    with pytest.raises(AssertionError):
        TopK(Normal(0.0, 1.0), k=3, n=3)  # reference: 1 <= k < n
    d = TopK(Normal(0.0, 1.0), k=2, n=3)
    x = d.sample(key, (8,))
    assert jnp.all(jnp.isfinite(d.log_prob(x)))


def test_chunked_rows_paths(key):
    # the XLA-miscompile guard (row-chunked lax.map on TPU): exercise the
    # chunked plumbing on CPU via the _FORCE_CHUNK hook — results must be
    # identical to the monolithic path, including non-divisible rows and
    # multi-dim sample shapes
    from zuko_tpu.distributions import NormalizingFlow
    from zuko_tpu.flows import NSF

    flow = NSF(3, 0, transforms=2, hidden_features=(8, 8), key=key)
    d = flow.unconditional() if hasattr(flow, "unconditional") else flow(None)
    import os

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        x = jax.random.normal(jax.random.PRNGKey(2), (100, 91, 3))
        lp_mono = d.log_prob(x)
        ks = jax.random.PRNGKey(3)
        s_mono = d.sample(ks, (9001,))
        _, lq_mono = d.sample_and_log_prob(ks, (100, 91))

        NormalizingFlow._FORCE_CHUNK = True
        NormalizingFlow._XLA_SAFE_ROWS = 1000  # force multiple chunks + pad
        try:
            lp_ch = d.log_prob(x)
            s_ch = d.sample(ks, (9001,))
            _, lq_ch = d.sample_and_log_prob(ks, (100, 91))
        finally:
            NormalizingFlow._FORCE_CHUNK = False
            NormalizingFlow._XLA_SAFE_ROWS = 8192

        assert jnp.allclose(lp_ch, lp_mono, atol=1e-12)
        assert jnp.allclose(s_ch, s_mono, atol=1e-12)
        assert jnp.allclose(lq_ch, lq_mono, atol=1e-12)
    finally:
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]


def test_chunked_rows_conditional_rebuild(key):
    # conditional flows capture a full-batch context inside the transform:
    # row-chunking from outside cannot see it, so the guard REBUILDS the
    # transform per (x, c) row-chunk from the lazy module attached by
    # Flow.forward (the round-2 conditional big-batch hole) — density,
    # sampling, and sample_and_log_prob must all equal the monolithic path
    from zuko_tpu.distributions import NormalizingFlow
    from zuko_tpu.flows import NSF

    flow = NSF(3, 2, transforms=2, hidden_features=(8, 8), key=key)
    c = jax.random.normal(jax.random.PRNGKey(5), (2500, 2))
    x = jax.random.normal(jax.random.PRNGKey(6), (2500, 3))
    import os

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        d = flow(c)
        assert d._rebuild is not None
        lp_mono = d.log_prob(x)
        ks = jax.random.PRNGKey(7)
        s_mono = d.sample(ks, ())
        _, lq_mono = d.sample_and_log_prob(ks, ())
        NormalizingFlow._FORCE_CHUNK = True
        NormalizingFlow._XLA_SAFE_ROWS = 1000  # multiple chunks + pad
        try:
            lp_ch = d.log_prob(x)
            s_ch = d.sample(ks, ())
            _, lq_ch = d.sample_and_log_prob(ks, ())
        finally:
            NormalizingFlow._FORCE_CHUNK = False
            NormalizingFlow._XLA_SAFE_ROWS = 8192
        assert jnp.allclose(lp_ch, lp_mono, atol=1e-12)
        assert jnp.allclose(s_ch, s_mono, atol=1e-12)
        assert jnp.allclose(lq_ch, lq_mono, atol=1e-12)

        # a sample axis ON TOP of the context batch also chunks (the context
        # broadcasts against the leading draw axis)
        NormalizingFlow._FORCE_CHUNK = True
        NormalizingFlow._XLA_SAFE_ROWS = 1000
        try:
            s2 = d.sample(ks, (3,))
        finally:
            NormalizingFlow._FORCE_CHUNK = False
            NormalizingFlow._XLA_SAFE_ROWS = 8192
        assert jnp.allclose(s2, d.sample(ks, (3,)), atol=1e-12)
    finally:
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
