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


def test_torch_namespace_breadth(key):
    r"""The torch-namespace distributions a reference port actually hits
    (the reference re-exports all of torch.distributions,
    zuko/distributions.py:23): each passes the MC-normalization contract
    (reference: tests/test_distributions.py:41-48) plus shape/expand."""
    from zuko_tpu.distributions import (
        Binomial,
        Chi2,
        Dirichlet,
        HalfNormal,
        Poisson,
        VonMises,
        Weibull,
    )

    shape = (2**16,)

    # continuous univariate: MC normalization over the sample range
    for d in [
        HalfNormal(1.5),
        Chi2(3.0),
        Weibull(2.0, 1.5),
        VonMises(0.3, 2.0),
    ]:
        name = type(d).__name__
        x = d.sample(key, shape)
        assert x.shape == shape, name
        lower, upper = x.min(), x.max()
        width = upper - lower
        u = Uniform(lower, upper).sample(key, shape)
        mass = jnp.mean(jnp.exp(d.log_prob(u))) * width
        assert 0.85 <= float(mass) <= 1.1, (name, float(mass))
        d2 = d.expand((7,))
        assert d2.batch_shape == (7,), name
        assert d2.sample(key).shape == (7,), name

    # discrete: pmf sums to one over an ample support prefix
    for d, sup in [(Poisson(3.5), 64), (Binomial(10, probs=0.3), 11)]:
        name = type(d).__name__
        pm = jnp.exp(d.log_prob(jnp.arange(float(sup))))
        assert 0.999 <= float(pm.sum()) <= 1.001, name
        x = d.sample(key, shape)
        assert x.shape == shape, name
        assert abs(float(x.mean()) - float(d.mean)) < 0.1, name

    # simplex: Dirichlet normalizes over the simplex (MC with uniform
    # Dirichlet proposals) and samples live on the simplex
    d = Dirichlet(jnp.asarray([1.5, 2.0, 3.0]))
    x = d.sample(key, shape)
    assert jnp.allclose(x.sum(-1), 1.0, atol=1e-6)
    u = Dirichlet(jnp.ones(3)).sample(key, shape)
    # uniform density on the 2-simplex is Gamma(3) = 2
    mass = jnp.mean(jnp.exp(d.log_prob(u))) / 2.0
    assert 0.9 <= float(mass) <= 1.1, float(mass)


def test_cdf_icdf_breadth(key):
    r"""cdf/icdf parity for the bases the reference gets free from torch
    (zuko/distributions.py:481-488): round-trip icdf(cdf(x)) = x, and
    Truncated works over Gamma/Beta/StudentT/GeneralizedNormal bases."""
    from zuko_tpu.distributions import Beta, Gamma, HalfNormal, StudentT, Weibull

    cases = [
        (Gamma(2.5, 1.7), jnp.linspace(0.1, 6.0, 13)),
        (Beta(2.0, 3.0), jnp.linspace(0.05, 0.95, 13)),
        (StudentT(4.0, 0.5, 2.0), jnp.linspace(-6.0, 6.0, 13)),
        (GeneralizedNormal(3.0), jnp.linspace(-1.8, 1.8, 13)),
        (HalfNormal(1.5), jnp.linspace(0.05, 4.0, 13)),
        (Weibull(2.0, 1.5), jnp.linspace(0.1, 5.0, 13)),
    ]
    for d, x in cases:
        name = type(d).__name__
        q = d.cdf(x)
        assert jnp.all((q >= 0) & (q <= 1)), name
        assert jnp.all(jnp.diff(q) > 0), name
        assert jnp.allclose(d.icdf(q), x, atol=1e-6), name

    # the VERDICT "done" criterion: Truncated(Gamma) works end-to-end
    for base in [Gamma(2.0), Beta(2.0, 3.0), StudentT(4.0)]:
        t = Truncated(base, 0.5, 0.9) if isinstance(base, Beta) else Truncated(base, 0.5, 3.0)
        x = t.sample(key, (2**14,))
        lo, hi = (0.5, 0.9) if isinstance(base, Beta) else (0.5, 3.0)
        assert float(x.min()) >= lo and float(x.max()) <= hi
        assert jnp.all(jnp.isfinite(t.log_prob(x)))
        lower, upper = x.min(), x.max()
        width = upper - lower
        u = Uniform(lower, upper).sample(key, (2**14,))
        mass = jnp.mean(jnp.exp(t.log_prob(u))) * width
        assert 0.9 <= float(mass) <= 1.1, (type(base).__name__, float(mass))

    # Truncated(Gamma) sampling is differentiable wrt the base parameters
    f = lambda a: jnp.mean(Truncated(Gamma(a), 0.5, 3.0).sample(key, (256,)))
    g = jax.grad(f)(2.0)
    assert jnp.isfinite(g) and jnp.abs(g) > 1e-3


def test_composite_distributions(key):
    r"""Cross-composition property sweep (reference contract:
    tests/test_distributions.py:10-62 applied to composites): a Joint over a
    trained-flow marginal, a Mixture over expanded flows, and a
    TransformedUniform with a learned monotone f all satisfy normalization,
    expand, and sample-shape semantics."""
    from zuko_tpu.flows import MAF
    from zuko_tpu.transforms import MonotonicAffineTransform

    kf, kb, ks = jax.random.split(key, 3)
    flow_d = MAF(2, 0, transforms=2, hidden_features=(8, 8), key=kf)(None)

    # learned scalar monotone map for TransformedUniform
    a = jnp.asarray(0.3)
    f = MonotonicAffineTransform(a, jnp.asarray(0.5))

    composites = [
        Joint(flow_d, Normal(0.0, 1.0)),  # flow marginal + scalar marginal
        Mixture(  # mixture over two expanded flow components
            NormalizingFlow(
                MonotonicAffineTransform(jnp.asarray([-1.0, 1.0]), jnp.asarray([0.8, 1.2])),
                Normal(jnp.zeros(2), jnp.ones(2)),
            ),
            jnp.zeros(2),
        ),
        TransformedUniform(f, -1.0, 1.0),
    ]

    shape = (2**16,)
    for d in composites:
        name = type(d).__name__
        assert d.batch_shape == (), name

        x = d.sample(ks, shape)
        assert x.shape == shape + d.event_shape, name
        lp = d.log_prob(x)
        assert lp.shape == shape, name

        # MC normalization over a box covering the samples
        lower = x.min(axis=0)
        upper = x.max(axis=0)
        width = upper - lower
        u = Uniform(lower - width / 2, upper + width / 2).sample(ks, shape)
        p = jnp.mean(jnp.exp(d.log_prob(u))) * jnp.prod(2 * width)
        assert 0.9 <= float(p) <= 1.1, (name, float(p))

        # expand: batch semantics survive composition
        de = d.expand((5,))
        assert de.batch_shape == (5,), name
        xe = de.sample(ks)
        assert xe.shape == (5,) + d.event_shape, name
        assert de.log_prob(xe).shape == (5,), name
