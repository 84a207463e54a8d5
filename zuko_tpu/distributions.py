r"""Parameterizable probability distributions.

This module supplies both:

* the substrate the reference borrows from ``torch.distributions`` and
  re-exports (reference: zuko/distributions.py:23 — ``Normal``, ``Uniform``,
  ``Independent``, ``Categorical``, ``MultivariateNormal``, ``Beta``,
  ``Gamma``), re-implemented natively on JAX, and
* the reference's own distributions (reference: zuko/distributions.py:39-699):
  ``NormalizingFlow``, ``Joint``, ``Mixture``, ``GeneralizedNormal``,
  ``DiagNormal``, ``BoxUniform``, ``TransformedUniform``, ``Truncated``,
  ``Sort``, ``TopK``, ``Minimum``, ``Maximum``.

Conventions (TPU-first):

* Shapes are static; ``log_prob(x)`` broadcasts ``x`` of shape
  ``sample_shape + batch_shape + event_shape`` to ``sample_shape + batch_shape``.
* Sampling is explicit-PRNG: ``sample(key, sample_shape=())``. ``rsample`` is
  an alias — every JAX sampler here is reparameterized where the reference's is.
* Validation is off by construction (reference pins
  ``Distribution._validate_args = False``, zuko/distributions.py:35-36);
  out-of-support inputs produce ``-inf``/``nan`` rather than raising.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.scipy import special as jsp
from typing import Tuple

from .core import Module

__all__ = [
    "Distribution",
    "Normal",
    "Uniform",
    "Independent",
    "Categorical",
    "MultivariateNormal",
    "Beta",
    "Gamma",
    "Laplace",
    "Bernoulli",
    "Exponential",
    "LogNormal",
    "Cauchy",
    "StudentT",
    "Gumbel",
    "HalfNormal",
    "Chi2",
    "Weibull",
    "Poisson",
    "Binomial",
    "Dirichlet",
    "VonMises",
    "ExponentialFamily",
    "Geometric",
    "Pareto",
    "HalfCauchy",
    "InverseGamma",
    "Kumaraswamy",
    "ContinuousBernoulli",
    "FisherSnedecor",
    "GeneralizedPareto",
    "NegativeBinomial",
    "Multinomial",
    "OneHotCategorical",
    "OneHotCategoricalStraightThrough",
    "RelaxedBernoulli",
    "RelaxedOneHotCategorical",
    "LowRankMultivariateNormal",
    "Wishart",
    "LKJCholesky",
    "TransformedDistribution",
    "LogisticNormal",
    "MixtureSameFamily",
    "kl_divergence",
    "register_kl",
    "register_entropy",
    "register_mode",
    "register_support",
    "register_variance",
    "NormalizingFlow",
    "Joint",
    "Mixture",
    "GeneralizedNormal",
    "DiagNormal",
    "BoxUniform",
    "TransformedUniform",
    "Truncated",
    "Sort",
    "TopK",
    "Minimum",
    "Maximum",
]

Shape = Tuple[int, ...]


def _sum_rightmost(x: jax.Array, n: int) -> jax.Array:
    """Sum over the ``n`` rightmost dimensions (reference:
    torch.distributions.utils._sum_rightmost, used at zuko/distributions.py:33)."""
    if n == 0:
        return x
    return jnp.sum(x, axis=tuple(range(-n, 0)))


def _gammaincinv(a: jax.Array, q: jax.Array) -> jax.Array:
    """Inverse of the regularized lower incomplete gamma function in its
    second argument: solve ``gammainc(a, t) = q`` for ``t >= 0``.

    The role of ``torch.distributions.Gamma``'s icdf machinery (the
    reference gets cdf/icdf free from torch, zuko/distributions.py:481-488);
    here a safeguarded-Newton solve (:func:`zuko_tpu.utils.newton_bisection`)
    with an implicit-function-theorem backward. The upper bracket covers
    quantiles up to ~1 - 1e-12 for any ``a``.
    """
    from .utils import newton_bisection

    a = jnp.asarray(a)
    q = jnp.asarray(q)
    a, q = jnp.broadcast_arrays(a, q)
    upper = a + 60.0 * jnp.sqrt(a) + 60.0
    f = lambda t, aa: jsp.gammainc(aa, t)  # noqa: E731
    return newton_bisection(f, q, jnp.zeros_like(q), upper, n=96, xtol=0.0, phi=a)


def _betaincinv(a: jax.Array, b: jax.Array, q: jax.Array) -> jax.Array:
    """Inverse of the regularized incomplete beta function in ``x``:
    solve ``betainc(a, b, x) = q`` on ``[0, 1]`` (safeguarded Newton +
    implicit-function-theorem backward; torch-namespace parity for
    ``Beta.icdf``/``StudentT.icdf``)."""
    from .utils import newton_bisection

    a, b, q = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(b), jnp.asarray(q))
    f = lambda x, ab: jsp.betainc(ab[0], ab[1], x)  # noqa: E731
    return newton_bisection(
        f, q, jnp.zeros_like(q), jnp.ones_like(q), n=96, xtol=0.0, phi=(a, b)
    )


class Distribution(Module):
    r"""Abstract distribution: ``batch_shape`` of independent-but-not-identical
    instances, each over events of shape ``event_shape``.

    torch-style custom subclasses may call
    ``super().__init__(batch_shape, event_shape, validate_args)`` — the
    shapes are stored and served by the default properties
    (``validate_args`` is accepted and ignored: value validation cannot
    raise on traced arrays)."""

    has_rsample: bool = True

    def __init__(self, batch_shape: Shape = (), event_shape: Shape = (),
                 validate_args=None):
        self._batch_shape = tuple(batch_shape)
        self._event_shape = tuple(event_shape)

    @property
    def batch_shape(self) -> Shape:
        bs = self.__dict__.get("_batch_shape")
        if bs is None:
            raise NotImplementedError
        return bs

    @property
    def event_shape(self) -> Shape:
        return self.__dict__.get("_event_shape", ())

    def log_prob(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def sample(self, key: jax.Array, sample_shape: Shape = ()) -> jax.Array:
        raise NotImplementedError

    def rsample(self, key: jax.Array, sample_shape: Shape = ()) -> jax.Array:
        return self.sample(key, sample_shape)

    def sample_and_log_prob(self, key, sample_shape: Shape = ()):
        x = self.sample(key, sample_shape)
        return x, self.log_prob(x)

    rsample_and_log_prob = sample_and_log_prob

    def cdf(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def icdf(self, q: jax.Array) -> jax.Array:
        raise NotImplementedError

    def expand(self, batch_shape: Shape) -> "Distribution":
        raise NotImplementedError

    @property
    def mean(self) -> jax.Array:
        raise NotImplementedError


# ------------------------------------------------------------------ primitives


class Normal(Distribution):
    r"""Univariate normal :math:`\mathcal{N}(\mu, \sigma^2)`.

    Example:
        >>> d = Normal(jnp.zeros(3), jnp.ones(3))
        >>> d.batch_shape
        (3,)
        >>> d.log_prob(jnp.zeros(3)).shape
        (3,)
    """

    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.loc.shape, self.scale.shape)

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * z**2 - jnp.log(self.scale) - 0.5 * math.log(2 * math.pi)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
        return self.loc + self.scale * eps

    def cdf(self, x):
        return 0.5 * (1 + jsp.erf((x - self.loc) / (self.scale * math.sqrt(2))))

    def icdf(self, q):
        return self.loc + self.scale * math.sqrt(2) * jsp.erfinv(2 * q - 1)

    def expand(self, batch_shape: Shape):
        return Normal(
            jnp.broadcast_to(self.loc, batch_shape),
            jnp.broadcast_to(self.scale, batch_shape),
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def mode(self):
        return self.mean


class Uniform(Distribution):
    r"""Uniform on :math:`[low, high)`.

    Example:
        >>> d = Uniform(0.0, 2.0)
        >>> bool(jnp.isclose(d.log_prob(jnp.asarray(1.0)), -jnp.log(2.0)))
        True
    """

    def __init__(self, low, high):
        self.low = jnp.asarray(low)
        self.high = jnp.asarray(high)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.low.shape, self.high.shape)

    def log_prob(self, x):
        inside = (x >= self.low) & (x <= self.high)
        lp = -jnp.log(self.high - self.low)
        return jnp.where(inside, lp, -jnp.inf)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape, dtype=self.low.dtype)
        return self.low + (self.high - self.low) * u

    def cdf(self, x):
        return jnp.clip((x - self.low) / (self.high - self.low), 0.0, 1.0)

    def icdf(self, q):
        return self.low + (self.high - self.low) * q

    def expand(self, batch_shape: Shape):
        return Uniform(
            jnp.broadcast_to(self.low, batch_shape),
            jnp.broadcast_to(self.high, batch_shape),
        )

    @property
    def mean(self):
        return jnp.broadcast_to((self.low + self.high) / 2, self.batch_shape)


class Bernoulli(Distribution):
    r"""Bernoulli distribution (torch namespace parity; the reference's VAE
    tutorial uses it as the decoder likelihood)."""

    has_rsample: bool = False

    def __init__(self, probs=None, logits=None):
        # torch argument order: Bernoulli(p) means probs=p
        if logits is None:
            probs = jnp.asarray(probs)
            logits = jnp.log(probs) - jnp.log1p(-probs)
        self.logits = jnp.asarray(logits)

    @property
    def batch_shape(self) -> Shape:
        return self.logits.shape

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    def log_prob(self, x):
        # -BCE-with-logits: x*log p + (1-x)*log(1-p)
        return x * self.logits - jax.nn.softplus(self.logits)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape)
        return (u < self.probs).astype(self.logits.dtype)

    def expand(self, batch_shape: Shape):
        return Bernoulli(logits=jnp.broadcast_to(self.logits, batch_shape))

    @property
    def mean(self):
        return self.probs


class Laplace(Distribution):
    r"""Laplace distribution with location ``loc`` and scale ``scale``."""

    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.loc.shape, self.scale.shape)

    def log_prob(self, x):
        return -jnp.abs(x - self.loc) / self.scale - jnp.log(2 * self.scale)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(
            key, shape, dtype=self.loc.dtype, minval=-0.5, maxval=0.5
        )
        return self.loc - self.scale * jnp.sign(u) * jnp.log1p(-2 * jnp.abs(u))

    def cdf(self, x):
        z = (x - self.loc) / self.scale
        return 0.5 - 0.5 * jnp.sign(z) * jnp.expm1(-jnp.abs(z))

    def icdf(self, q):
        s = q - 0.5
        return self.loc - self.scale * jnp.sign(s) * jnp.log1p(-2 * jnp.abs(s))

    def expand(self, batch_shape: Shape):
        return Laplace(
            jnp.broadcast_to(self.loc, batch_shape),
            jnp.broadcast_to(self.scale, batch_shape),
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)


class Exponential(Distribution):
    r"""Exponential distribution with ``rate`` (torch namespace parity)."""

    def __init__(self, rate=1.0):
        self.rate = jnp.asarray(rate)

    @property
    def batch_shape(self) -> Shape:
        return self.rate.shape

    def log_prob(self, x):
        return jnp.log(self.rate) - self.rate * x + jnp.where(x >= 0, 0.0, -jnp.inf)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.exponential(key, shape, self.rate.dtype) / self.rate

    def cdf(self, x):
        return -jnp.expm1(-self.rate * x)

    def icdf(self, q):
        return -jnp.log1p(-q) / self.rate

    def expand(self, batch_shape: Shape):
        return Exponential(jnp.broadcast_to(self.rate, batch_shape))

    @property
    def mean(self):
        return 1 / self.rate


class LogNormal(Distribution):
    r"""Log-normal distribution (torch namespace parity)."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.loc.shape, self.scale.shape)

    def log_prob(self, x):
        lx = jnp.log(x)
        z = (lx - self.loc) / self.scale
        return (
            -0.5 * z**2 - lx - jnp.log(self.scale)
            - 0.5 * math.log(2 * math.pi)
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
        return jnp.exp(self.loc + self.scale * eps)

    def cdf(self, x):
        return 0.5 * (1 + jsp.erf((jnp.log(x) - self.loc) / (self.scale * math.sqrt(2))))

    def icdf(self, q):
        return jnp.exp(self.loc + self.scale * math.sqrt(2) * jsp.erfinv(2 * q - 1))

    def expand(self, batch_shape: Shape):
        return LogNormal(
            jnp.broadcast_to(self.loc, batch_shape),
            jnp.broadcast_to(self.scale, batch_shape),
        )

    @property
    def mean(self):
        return jnp.exp(self.loc + self.scale**2 / 2)


class Cauchy(Distribution):
    r"""Cauchy distribution (torch namespace parity)."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.loc.shape, self.scale.shape)

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -jnp.log1p(z**2) - jnp.log(math.pi * self.scale)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        return self.loc + self.scale * jax.random.cauchy(key, shape, self.loc.dtype)

    def cdf(self, x):
        return jnp.arctan((x - self.loc) / self.scale) / math.pi + 0.5

    def icdf(self, q):
        return self.loc + self.scale * jnp.tan(math.pi * (q - 0.5))

    def expand(self, batch_shape: Shape):
        return Cauchy(
            jnp.broadcast_to(self.loc, batch_shape),
            jnp.broadcast_to(self.scale, batch_shape),
        )


class StudentT(Distribution):
    r"""Student's t distribution (torch namespace parity)."""

    def __init__(self, df, loc=0.0, scale=1.0):
        self.df = jnp.asarray(df)
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(
            self.df.shape, self.loc.shape, self.scale.shape
        )

    def log_prob(self, x):
        v = self.df
        z = (x - self.loc) / self.scale
        return (
            jsp.gammaln((v + 1) / 2) - jsp.gammaln(v / 2)
            - 0.5 * jnp.log(v * math.pi) - jnp.log(self.scale)
            - (v + 1) / 2 * jnp.log1p(z**2 / v)
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        t = jax.random.t(key, jnp.broadcast_to(self.df, shape), shape)
        return self.loc + self.scale * t

    def cdf(self, x):
        v = self.df
        z = (x - self.loc) / self.scale
        w = jsp.betainc(v / 2, jnp.asarray(0.5, z.dtype), v / (v + z**2))
        return jnp.where(z >= 0, 1 - w / 2, w / 2)

    def icdf(self, q):
        v = self.df
        tail = 2 * jnp.minimum(q, 1 - q)
        w = _betaincinv(v / 2, jnp.asarray(0.5, jnp.asarray(q).dtype), tail)
        z = jnp.sqrt(v * (1 - w) / jnp.maximum(w, jnp.finfo(w.dtype).tiny))
        return self.loc + self.scale * jnp.where(q >= 0.5, z, -z)

    def expand(self, batch_shape: Shape):
        return StudentT(
            jnp.broadcast_to(self.df, batch_shape),
            jnp.broadcast_to(self.loc, batch_shape),
            jnp.broadcast_to(self.scale, batch_shape),
        )


class Gumbel(Distribution):
    r"""Gumbel (extreme value) distribution (torch namespace parity)."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.loc.shape, self.scale.shape)

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -(z + jnp.exp(-z)) - jnp.log(self.scale)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        return self.loc + self.scale * jax.random.gumbel(key, shape, self.loc.dtype)

    def cdf(self, x):
        return jnp.exp(-jnp.exp(-(x - self.loc) / self.scale))

    def icdf(self, q):
        return self.loc - self.scale * jnp.log(-jnp.log(q))

    def expand(self, batch_shape: Shape):
        return Gumbel(
            jnp.broadcast_to(self.loc, batch_shape),
            jnp.broadcast_to(self.scale, batch_shape),
        )

    @property
    def mean(self):
        return self.loc + self.scale * 0.5772156649015329


class Gamma(Distribution):
    r"""Gamma distribution with ``concentration`` and ``rate``.

    Sampling is reparameterized via JAX's implicitly-differentiated gamma
    sampler (the role of ``torch._standard_gamma`` at
    reference zuko/distributions.py:330-334).
    """

    def __init__(self, concentration, rate=1.0):
        self.concentration = jnp.asarray(concentration)
        self.rate = jnp.asarray(rate)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.concentration.shape, self.rate.shape)

    def log_prob(self, x):
        a, b = self.concentration, self.rate
        return a * jnp.log(b) + (a - 1) * jnp.log(x) - b * x - jsp.gammaln(a)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        g = jax.random.gamma(key, jnp.broadcast_to(self.concentration, shape))
        return g / self.rate

    def cdf(self, x):
        return jsp.gammainc(self.concentration, self.rate * x)

    def icdf(self, q):
        return _gammaincinv(self.concentration, q) / self.rate

    def expand(self, batch_shape: Shape):
        return Gamma(
            jnp.broadcast_to(self.concentration, batch_shape),
            jnp.broadcast_to(self.rate, batch_shape),
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.concentration / self.rate, self.batch_shape)


class Beta(Distribution):
    r"""Beta distribution (reference usage: the Bernstein basis at
    zuko/transforms.py:733 and doctests). torch calls the parameters
    ``concentration1``/``concentration0`` (same positional order) — both
    spellings are accepted and exposed."""

    def __init__(self, alpha=None, beta=None, *, concentration1=None,
                 concentration0=None):
        if alpha is None:
            alpha = concentration1
        if beta is None:
            beta = concentration0
        self.alpha = jnp.asarray(alpha)
        self.beta = jnp.asarray(beta)

    @property
    def concentration1(self):
        return self.alpha

    @property
    def concentration0(self):
        return self.beta

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.alpha.shape, self.beta.shape)

    def log_prob(self, x):
        a, b = self.alpha, self.beta
        return (
            (a - 1) * jnp.log(x)
            + (b - 1) * jnp.log1p(-x)
            - (jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b))
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        k1, k2 = jax.random.split(key)
        ga = jax.random.gamma(k1, jnp.broadcast_to(self.alpha, shape))
        gb = jax.random.gamma(k2, jnp.broadcast_to(self.beta, shape))
        return ga / (ga + gb)

    def cdf(self, x):
        return jsp.betainc(self.alpha, self.beta, jnp.clip(x, 0.0, 1.0))

    def icdf(self, q):
        return _betaincinv(self.alpha, self.beta, q)

    def expand(self, batch_shape: Shape):
        return Beta(
            jnp.broadcast_to(self.alpha, batch_shape),
            jnp.broadcast_to(self.beta, batch_shape),
        )

    @property
    def mean(self):
        return jnp.broadcast_to(
            self.alpha / (self.alpha + self.beta), self.batch_shape
        )


class HalfNormal(Distribution):
    r"""Half-normal distribution (torch namespace parity — the reference
    re-exports all of ``torch.distributions``, zuko/distributions.py:23)."""

    def __init__(self, scale=1.0):
        self.scale = jnp.asarray(scale)

    @property
    def batch_shape(self) -> Shape:
        return self.scale.shape

    def log_prob(self, x):
        lp = (
            0.5 * math.log(2.0 / math.pi)
            - jnp.log(self.scale)
            - x**2 / (2 * self.scale**2)
        )
        return jnp.where(x >= 0, lp, -jnp.inf)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.abs(self.scale * jax.random.normal(key, shape, self.scale.dtype))

    def cdf(self, x):
        return jsp.erf(x / (self.scale * math.sqrt(2.0)))

    def icdf(self, q):
        return self.scale * math.sqrt(2.0) * jsp.erfinv(q)

    def expand(self, batch_shape: Shape):
        return HalfNormal(jnp.broadcast_to(self.scale, batch_shape))

    @property
    def mean(self):
        return self.scale * math.sqrt(2.0 / math.pi)


class Chi2(Gamma):
    r"""Chi-squared distribution: ``Gamma(df / 2, 1 / 2)`` (torch namespace
    parity; torch.distributions.Chi2 uses the same reduction)."""

    def __init__(self, df):
        df = jnp.asarray(df)
        super().__init__(df / 2, jnp.asarray(0.5, df.dtype))

    @property
    def df(self):
        return 2 * self.concentration

    def expand(self, batch_shape: Shape):
        return Chi2(jnp.broadcast_to(self.df, batch_shape))


class Weibull(Distribution):
    r"""Weibull distribution with ``scale`` :math:`\lambda` and
    ``concentration`` :math:`k` (torch namespace parity). Sampling is
    reparameterized through the closed-form quantile function."""

    def __init__(self, scale=1.0, concentration=1.0):
        self.scale = jnp.asarray(scale)
        self.concentration = jnp.asarray(concentration)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.scale.shape, self.concentration.shape)

    def log_prob(self, x):
        lam, k = self.scale, self.concentration
        z = x / lam
        lp = jnp.log(k / lam) + (k - 1) * jnp.log(z) - z**k
        return jnp.where(x >= 0, lp, -jnp.inf)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(
            key, shape, self.scale.dtype, jnp.finfo(self.scale.dtype).tiny, 1.0
        )
        # icdf of 1 - u (u ~ U(0, 1]): lambda * (-log u)^(1/k)
        return self.scale * (-jnp.log(u)) ** (1 / self.concentration)

    def cdf(self, x):
        z = jnp.maximum(x, 0.0) / self.scale
        return -jnp.expm1(-(z**self.concentration))

    def icdf(self, q):
        return self.scale * (-jnp.log1p(-q)) ** (1 / self.concentration)

    def expand(self, batch_shape: Shape):
        return Weibull(
            jnp.broadcast_to(self.scale, batch_shape),
            jnp.broadcast_to(self.concentration, batch_shape),
        )

    @property
    def mean(self):
        return self.scale * jnp.exp(jsp.gammaln(1 + 1 / self.concentration))


class Poisson(Distribution):
    r"""Poisson distribution (torch namespace parity). Discrete: ``sample``
    is not reparameterized."""

    has_rsample: bool = False

    def __init__(self, rate):
        self.rate = jnp.asarray(rate, dtype=float)

    @property
    def batch_shape(self) -> Shape:
        return self.rate.shape

    def log_prob(self, x):
        return x * jnp.log(self.rate) - self.rate - jsp.gammaln(x + 1)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.poisson(key, self.rate, shape).astype(self.rate.dtype)

    def cdf(self, x):
        # P(X <= x) = Q(floor(x) + 1, rate), the regularized upper gamma
        return jsp.gammaincc(jnp.floor(x) + 1, self.rate)

    def expand(self, batch_shape: Shape):
        return Poisson(jnp.broadcast_to(self.rate, batch_shape))

    @property
    def mean(self):
        return self.rate


class Binomial(Distribution):
    r"""Binomial distribution over ``total_count`` trials (torch namespace
    parity). Discrete: ``sample`` is not reparameterized."""

    has_rsample: bool = False

    def __init__(self, total_count=1, probs=None, logits=None):
        if probs is None:
            probs = jax.nn.sigmoid(jnp.asarray(logits))
        self.total_count = jnp.asarray(total_count, dtype=float)
        self.probs = jnp.asarray(probs)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.total_count.shape, self.probs.shape)

    @property
    def logits(self):
        return jnp.log(self.probs) - jnp.log1p(-self.probs)

    def log_prob(self, x):
        n, p = self.total_count, self.probs
        return (
            jsp.gammaln(n + 1)
            - jsp.gammaln(x + 1)
            - jsp.gammaln(n - x + 1)
            + x * jnp.log(p)
            + (n - x) * jnp.log1p(-p)
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.binomial(key, self.total_count, self.probs, shape)

    def expand(self, batch_shape: Shape):
        return Binomial(
            jnp.broadcast_to(self.total_count, batch_shape),
            jnp.broadcast_to(self.probs, batch_shape),
        )

    @property
    def mean(self):
        return self.total_count * self.probs


class Dirichlet(Distribution):
    r"""Dirichlet distribution over the simplex (torch namespace parity).
    Sampling is reparameterized through JAX's implicitly-differentiated
    gamma sampler, like :class:`Gamma`."""

    def __init__(self, concentration):
        self.concentration = jnp.asarray(concentration)

    @property
    def batch_shape(self) -> Shape:
        return self.concentration.shape[:-1]

    @property
    def event_shape(self) -> Shape:
        return self.concentration.shape[-1:]

    def log_prob(self, x):
        a = self.concentration
        return (
            jnp.sum((a - 1) * jnp.log(x), axis=-1)
            + jsp.gammaln(jnp.sum(a, axis=-1))
            - jnp.sum(jsp.gammaln(a), axis=-1)
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        g = jax.random.gamma(key, jnp.broadcast_to(self.concentration, shape))
        return g / jnp.sum(g, axis=-1, keepdims=True)

    def expand(self, batch_shape: Shape):
        return Dirichlet(
            jnp.broadcast_to(
                self.concentration, tuple(batch_shape) + self.event_shape
            )
        )

    @property
    def mean(self):
        a = self.concentration
        return a / jnp.sum(a, axis=-1, keepdims=True)


class VonMises(Distribution):
    r"""von Mises (circular normal) distribution on :math:`[-\pi, \pi]`
    (torch namespace parity). Sampling uses the Best–Fisher (1979)
    rejection algorithm, vectorized as a fixed number of masked proposal
    rounds (static shapes for XLA; 32 rounds push the failure probability
    below :math:`10^{-9}` at the ~66% per-round acceptance floor). Not
    reparameterized."""

    has_rsample: bool = False
    _ROUNDS = 32

    def __init__(self, loc, concentration):
        self.loc = jnp.asarray(loc)
        self.concentration = jnp.asarray(concentration)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.loc.shape, self.concentration.shape)

    def log_prob(self, x):
        k = self.concentration
        # log I0(k) = log(i0e(k)) + k keeps large k finite
        return (
            k * jnp.cos(x - self.loc)
            - math.log(2 * math.pi)
            - (jnp.log(jsp.i0e(k)) + k)
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = self.loc.dtype
        k = jnp.maximum(jnp.broadcast_to(self.concentration, shape), 1e-8)
        tau = 1 + jnp.sqrt(1 + 4 * k**2)
        rho = (tau - jnp.sqrt(2 * tau)) / (2 * k)
        r = (1 + rho**2) / (2 * rho)

        def round_(carry, kr):
            out, done = carry
            u1, u2, u3 = jax.random.uniform(kr, (3,) + shape, dtype)
            z = jnp.cos(math.pi * u1)
            f = (1 + r * z) / (r + z)
            c = k * (r - f)
            accept = (c * (2 - c) - u2 > 0) | (jnp.log(c / u2) + 1 - c >= 0)
            angle = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
            out = jnp.where(~done & accept, angle, out)
            return (out, done | accept), None

        keys = jax.random.split(key, self._ROUNDS)
        (angle, _), _ = jax.lax.scan(
            round_, (jnp.zeros(shape, dtype), jnp.zeros(shape, bool)), keys
        )
        x = angle + self.loc
        return x - 2 * math.pi * jnp.floor((x + math.pi) / (2 * math.pi))

    def expand(self, batch_shape: Shape):
        return VonMises(
            jnp.broadcast_to(self.loc, batch_shape),
            jnp.broadcast_to(self.concentration, batch_shape),
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)


class Categorical(Distribution):
    r"""Categorical over the last axis of ``logits``
    (reference usage: mixture sampling, zuko/distributions.py:275-286)."""

    has_rsample: bool = False

    def __init__(self, probs=None, logits=None):
        # torch argument order: Categorical(p) means probs=p
        if logits is None:
            logits = jnp.log(jnp.asarray(probs))
        self.logits = jnp.asarray(logits)

    @property
    def batch_shape(self) -> Shape:
        return self.logits.shape[:-1]

    @property
    def num_categories(self) -> int:
        return self.logits.shape[-1]

    def log_prob(self, x):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        x = jnp.asarray(x)
        shape = jnp.broadcast_shapes(x.shape, self.batch_shape)
        logp = jnp.broadcast_to(logp, shape + (self.num_categories,))
        x = jnp.broadcast_to(x, shape)
        return jnp.take_along_axis(
            logp, x[..., None].astype(jnp.int32), axis=-1
        )[..., 0]

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.categorical(key, self.logits, axis=-1, shape=shape)

    def expand(self, batch_shape: Shape):
        return Categorical(
            logits=jnp.broadcast_to(
                self.logits, tuple(batch_shape) + (self.num_categories,)
            )
        )


class MultivariateNormal(Distribution):
    r"""Multivariate normal parameterized by ``loc`` and lower-triangular
    ``scale_tril`` (reference usage: GMM full covariance,
    zuko/mixtures.py:86-93).

    Argument order matches torch (``loc, covariance_matrix,
    precision_matrix, scale_tril``): ``MultivariateNormal(mu, Sigma)``
    passes a COVARIANCE second, like a ported script expects — the
    earlier scale_tril-second order silently Cholesky-skipped it."""

    def __init__(self, loc, covariance_matrix=None, precision_matrix=None,
                 scale_tril=None):
        self.loc = jnp.asarray(loc)
        if scale_tril is None:
            if covariance_matrix is None:
                # Sigma = P^-1; L = chol(Sigma) from chol(P) by inverse
                Lp = jnp.linalg.cholesky(jnp.asarray(precision_matrix))
                eye = jnp.broadcast_to(
                    jnp.eye(Lp.shape[-1], dtype=Lp.dtype), Lp.shape)
                Lp_inv = jax.scipy.linalg.solve_triangular(
                    Lp, eye, lower=True)
                covariance_matrix = jnp.swapaxes(Lp_inv, -1, -2) @ Lp_inv
            scale_tril = jnp.linalg.cholesky(jnp.asarray(covariance_matrix))
        self.scale_tril = jnp.asarray(scale_tril)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(
            self.loc.shape[:-1], self.scale_tril.shape[:-2]
        )

    @property
    def event_shape(self) -> Shape:
        return self.loc.shape[-1:]

    def log_prob(self, x):
        d = x.shape[-1]
        diff = x - self.loc
        # Invert the shared triangular factor ONCE (batched over L's own
        # dims — typically the K mixture components) and apply it as a
        # matmul. The data-batched triangular solve this replaces
        # broadcast L over the full data batch and computed garbage on
        # TPU at scale (tools/tpu_validate_r34/r35.py: full-covariance
        # GMM off by ~8e5 nats median at b=65536 while diagonal was
        # fine); a triangular inverse is numerically safe, and the
        # einsum runs at HIGHEST precision (trivial cost at these d).
        eye = jnp.broadcast_to(
            jnp.eye(d, dtype=self.scale_tril.dtype), self.scale_tril.shape
        )
        Linv = jax.scipy.linalg.solve_triangular(
            self.scale_tril, eye, lower=True
        )
        z = jnp.einsum(
            "...ed,...d->...e", Linv, diff,
            precision=jax.lax.Precision.HIGHEST,
        )
        half_log_det = jnp.sum(
            jnp.log(jnp.abs(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1))),
            axis=-1,
        )
        return (
            -0.5 * jnp.sum(z**2, axis=-1)
            - half_log_det
            - 0.5 * d * math.log(2 * math.pi)
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    def expand(self, batch_shape: Shape):
        d = self.event_shape[0]
        return MultivariateNormal(
            jnp.broadcast_to(self.loc, tuple(batch_shape) + (d,)),
            scale_tril=jnp.broadcast_to(
                self.scale_tril, tuple(batch_shape) + (d, d)),
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape + self.event_shape)


class Independent(Distribution):
    r"""Reinterprets the ``ndims`` rightmost batch dimensions of ``base`` as
    event dimensions (the torch ``Independent`` the reference builds on, e.g.
    zuko/distributions.py:337-363)."""

    def __init__(self, base_distribution: Distribution = None,
                 reinterpreted_batch_ndims: int = None, *, base=None,
                 ndims=None):
        # torch keyword names accepted alongside the short local ones
        self.base = base if base is not None else base_distribution
        self.ndims = int(
            ndims if ndims is not None else reinterpreted_batch_ndims)

    @property
    def has_rsample(self) -> bool:
        return self.base.has_rsample

    @property
    def batch_shape(self) -> Shape:
        shape = self.base.batch_shape
        return shape[: len(shape) - self.ndims]

    @property
    def event_shape(self) -> Shape:
        shape = self.base.batch_shape
        return shape[len(shape) - self.ndims :] + self.base.event_shape

    def log_prob(self, x):
        return _sum_rightmost(self.base.log_prob(x), self.ndims)

    def sample(self, key, sample_shape: Shape = ()):
        return self.base.sample(key, sample_shape)

    def expand(self, batch_shape: Shape):
        shape = self.base.batch_shape
        inner = shape[len(shape) - self.ndims :]
        return Independent(
            self.base.expand(tuple(batch_shape) + inner), self.ndims
        )

    @property
    def mean(self):
        return self.base.mean


# --------------------------------------------------------- flow / composition


class NormalizingFlow(Distribution):
    r"""Pushforward of ``base`` through the inverse of ``transform``:
    :math:`p(x) = p_{base}(f(x)) |\det J_f(x)|`.

    The engine of the framework (reference: zuko/distributions.py:39-138):

    * ``log_prob`` uses the fused ``call_and_ladj`` protocol
      (reference: zuko/distributions.py:115-119),
    * ``sample`` pulls base samples back through :math:`f^{-1}`
      (reference: zuko/distributions.py:121-127),
    * ``sample_and_log_prob`` fuses one inverse pass to produce both — the
      reverse-KL workhorse (reference: zuko/distributions.py:129-138).

    If the transform's codomain has more event dimensions than the base, the
    base is auto-wrapped in :class:`Independent`
    (reference: zuko/distributions.py:79-86).

    Example:
        >>> from zuko_tpu.transforms import MonotonicAffineTransform
        >>> d = NormalizingFlow(MonotonicAffineTransform(0.0, 1.0), Normal(0.0, 1.0))
        >>> d.log_prob(jnp.asarray(0.5)).shape
        ()
    """

    def __init__(self, transform, base: Distribution):
        reinterpreted = transform.codomain_dim - len(base.event_shape)
        if reinterpreted > 0:
            base = Independent(base, reinterpreted)
        self.transform = transform
        self.base = base

    @property
    def batch_shape(self) -> Shape:
        return self.base.batch_shape

    @property
    def event_shape(self) -> Shape:
        # reference: zuko/distributions.py:101-103
        return self.transform.inverse_shape(self.base.event_shape)

    # Maximum batch rows per XLA program on TPU. XLA:TPU miscompiles the
    # composed multi-layer density graph above a batch threshold at some
    # feature counts — measured ~21 nats median error at (16384, 43) while
    # b <= 12288 is correct, every layer standalone is correct, and the
    # unjitted op sequence is correct (tools/tpu_validate_r19/r22/r26.py).
    # Chunked `lax.map` execution is the one mitigation that works
    # (r27; barriers, remat, matmul precision, dot/gather rewrites do
    # not). The fused Pallas tier is unaffected — this guards the
    # fallback/regular path only.
    _XLA_SAFE_ROWS = 8192
    _FORCE_CHUNK = False  # test hook: exercise the chunked paths on CPU
    # Set by lazy.Flow.forward for conditional flows: (lazy module, context,
    # build key). Lets the chunk guard REBUILD the transform per row-chunk —
    # a transform whose captured context carries the full batch cannot be
    # chunked from outside, but chunking x and c together *before* building
    # can (the round-2 conditional big-batch hole, PERF.md).
    _rebuild = None

    def _chunk_guard_active(self):
        return self._FORCE_CHUNK or jax.default_backend() not in ("cpu", "gpu")

    def log_prob(self, x):
        x = jnp.asarray(x)
        k = len(self.event_shape)
        batch = x.shape[: x.ndim - k]
        rows = math.prod(batch) if batch else 1
        if rows > self._XLA_SAFE_ROWS and self._chunk_guard_active():
            if self.batch_shape == ():
                flat = x.reshape((rows,) + x.shape[x.ndim - k :])
                n_chunks = -(-rows // self._XLA_SAFE_ROWS)
                pad = n_chunks * self._XLA_SAFE_ROWS - rows
                if pad:  # repeat leading rows (valid, sliced off below)
                    flat = jnp.concatenate([flat, flat[:pad]], axis=0)
                chunks = flat.reshape(
                    (n_chunks, self._XLA_SAFE_ROWS) + flat.shape[1:]
                )
                if self._chunkable(self._log_prob_impl, chunks, x):
                    out = jax.lax.map(self._log_prob_impl, chunks).reshape(-1)
                    return out[:rows].reshape(batch)
            elif self._rebuild is not None:
                out = self._rebuilt_chunked("log_prob", x, k, batch, rows)
                if out is not None:
                    return out
        return self._log_prob_impl(x)

    def _rebuilt_chunked(self, method, arr, k, batch, rows):
        """Conditional big-batch guard: chunk ``arr`` and the context
        TOGETHER, rebuild the transform per chunk from the lazy module, and
        ``lax.map`` the chunks — the same mitigation as the unconditional
        guard (the XLA:TPU miscompile is batch-size-triggered), made
        possible because the module + context are available here. Returns
        None when the context does not broadcast to ``arr``'s batch (the
        caller then runs the monolithic program, matching its semantics)."""
        module, c, key = self._rebuild
        try:
            cb = jnp.broadcast_to(c, batch + c.shape[-1:])
        except Exception:
            return None
        flat = arr.reshape((rows,) + arr.shape[arr.ndim - k :])
        flat_c = cb.reshape((rows, c.shape[-1]))
        n_chunks = -(-rows // self._XLA_SAFE_ROWS)
        pad = n_chunks * self._XLA_SAFE_ROWS - rows
        if pad:  # repeat leading rows (valid inputs, sliced off below)
            flat = jnp.concatenate([flat, flat[:pad]], axis=0)
            flat_c = jnp.concatenate([flat_c, flat_c[:pad]], axis=0)
        shape = (n_chunks, self._XLA_SAFE_ROWS)
        chunks = (
            flat.reshape(shape + flat.shape[1:]),
            flat_c.reshape(shape + flat_c.shape[1:]),
        )

        def one(chunk):
            ac, cc = chunk
            d = NormalizingFlow(
                module.transform(cc, key=key),
                module.base(cc).expand(cc.shape[:-1]),
            )
            if method == "log_prob":
                return d._log_prob_impl(ac)
            if method == "inverse":
                return d.transform.inverse(ac)
            return d.transform.inverse_and_ladj(ac)

        try:
            jax.eval_shape(one, jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype), chunks
            ))
        except Exception:
            return None
        out = jax.lax.map(one, chunks)

        def unchunk(a):
            a = a.reshape((n_chunks * self._XLA_SAFE_ROWS,) + a.shape[2:])
            return a[:rows].reshape(batch + a.shape[1:])

        return jax.tree_util.tree_map(unchunk, out)

    @staticmethod
    def _chunkable(fn, chunks, full):
        """Whether ``fn`` traces on one chunk — a transform whose captured
        context carries the FULL batch (conditional flows through the
        regular path) cannot be row-chunked from outside; fall back to the
        monolithic program for it. The MONOLITHIC trace must succeed too:
        a captured context whose batch happens to equal the chunk size
        would broadcast against every chunk (pairing the same context rows
        with all of them) — the unchunked program raises a broadcast error
        there, and chunking must not convert that error into silently
        wrong numbers."""
        try:
            jax.eval_shape(fn, jax.ShapeDtypeStruct(
                chunks.shape[1:], chunks.dtype))
            jax.eval_shape(fn, jax.ShapeDtypeStruct(full.shape, full.dtype))
            return True
        except Exception:
            return False

    def _log_prob_impl(self, x):
        z, ladj = self.transform.call_and_ladj(x)
        return self.base.log_prob(z) + ladj

    def sample(self, key, sample_shape: Shape = ()):
        z = self.base.sample(key, sample_shape)
        out = self._maybe_rebuilt_inverse("inverse", z)
        if out is not None:
            return out
        return self._chunked_rows(self.transform.inverse, z)

    def sample_and_log_prob(self, key, sample_shape: Shape = ()):
        z = self.base.sample(key, sample_shape)
        out = self._maybe_rebuilt_inverse("inverse_and_ladj", z)
        if out is not None:
            x, ladj = out
        else:
            x, ladj = self._chunked_rows(self.transform.inverse_and_ladj, z)
        return x, self.base.log_prob(z) - ladj

    rsample_and_log_prob = sample_and_log_prob

    def _maybe_rebuilt_inverse(self, method, z):
        """Conditional big-batch guard for the inverse direction (the
        miscompile hits it too — r28: NaN samples at (16384, 43))."""
        if self._rebuild is None or self.batch_shape == ():
            return None
        k = len(self.base.event_shape)
        batch = z.shape[: z.ndim - k]
        rows = math.prod(batch) if batch else 1
        if rows <= self._XLA_SAFE_ROWS or not self._chunk_guard_active():
            return None
        return self._rebuilt_chunked(method, z, k, batch, rows)

    def _chunked_rows(self, fn, z):
        """Apply ``fn`` over row chunks of ``z`` on TPU — the inverse
        direction carries the same big-batch XLA miscompile as the density
        (r28: NaN samples / 50% wrong log q at (16384, 43))."""
        k = len(self.base.event_shape)
        batch = z.shape[: z.ndim - k]
        rows = math.prod(batch) if batch else 1
        if (
            rows <= self._XLA_SAFE_ROWS
            or self.batch_shape != ()
            or (
                not self._FORCE_CHUNK
                and jax.default_backend() in ("cpu", "gpu")
            )
        ):
            return fn(z)
        flat = z.reshape((rows,) + z.shape[z.ndim - k :])
        n_chunks = -(-rows // self._XLA_SAFE_ROWS)
        pad = n_chunks * self._XLA_SAFE_ROWS - rows
        if pad:  # repeat leading rows (valid inputs, sliced off below)
            flat = jnp.concatenate([flat, flat[:pad]], axis=0)
        chunks = flat.reshape((n_chunks, self._XLA_SAFE_ROWS) + flat.shape[1:])
        if not self._chunkable(fn, chunks, z):
            return fn(z)
        out = jax.lax.map(fn, chunks)

        def unchunk(a):
            a = a.reshape((n_chunks * self._XLA_SAFE_ROWS,) + a.shape[2:])
            return a[:rows].reshape(batch + a.shape[1:])

        return jax.tree_util.tree_map(unchunk, out)

    def expand(self, batch_shape: Shape):
        # reference: zuko/distributions.py:105-113 — only the base is expanded.
        return NormalizingFlow(self.transform, self.base.expand(batch_shape))


class Joint(Distribution):
    r"""Concatenation of independent marginals, flattened to one event
    dimension (reference: zuko/distributions.py:141-213).

    Example:
        >>> d = Joint(Normal(0.0, 1.0), BoxUniform(jnp.zeros(2), jnp.ones(2)))
        >>> d.event_shape
        (3,)
    """

    def __init__(self, *marginals: Distribution):
        self.marginals = list(marginals)

    @property
    def has_rsample(self) -> bool:
        return all(m.has_rsample for m in self.marginals)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(*(m.batch_shape for m in self.marginals))

    @property
    def event_shape(self) -> Shape:
        return (sum(int(np.prod(m.event_shape, dtype=int)) for m in self.marginals),)

    def _split(self, x):
        sizes = [int(np.prod(m.event_shape, dtype=int)) for m in self.marginals]
        splits = np.cumsum(sizes)[:-1].tolist()
        chunks = jnp.split(x, splits, axis=-1) if splits else [x]
        return [
            c.reshape(c.shape[:-1] + m.event_shape)
            for c, m in zip(chunks, self.marginals)
        ]

    def log_prob(self, x):
        # _split already reshaped each chunk to batch + event_shape.
        lp = 0.0
        for c, m in zip(self._split(x), self.marginals):
            lp = lp + m.log_prob(c)
        return lp

    def sample(self, key, sample_shape: Shape = ()):
        keys = jax.random.split(key, len(self.marginals))
        parts = []
        for k, m in zip(keys, self.marginals):
            # Align every marginal to the joint batch shape first, so samples
            # have shape sample_shape + batch_shape + event_shape directly.
            s = m.expand(self.batch_shape).sample(k, sample_shape)
            parts.append(
                s.reshape(
                    s.shape[: s.ndim - len(m.event_shape)]
                    + (int(np.prod(m.event_shape, dtype=int)),)
                )
            )
        return jnp.concatenate(parts, axis=-1)

    def expand(self, batch_shape: Shape):
        return Joint(*(m.expand(batch_shape) for m in self.marginals))


class Mixture(Distribution):
    r"""Mixture over the last batch dimension of ``base`` with mixing
    ``logits`` (reference: zuko/distributions.py:216-286).

    Example:
        >>> base = Normal(jnp.asarray([-1.0, 1.0]), jnp.ones(2))
        >>> d = Mixture(base, jnp.zeros(2))
        >>> d.batch_shape
        ()
    """

    has_rsample: bool = False

    def __init__(self, base: Distribution, logits):
        self.base = base
        self.logits = jnp.asarray(logits)

    @property
    def batch_shape(self) -> Shape:
        return self.base.batch_shape[:-1]

    @property
    def event_shape(self) -> Shape:
        return self.base.event_shape

    def log_prob(self, x):
        # x: (*, batch, event) -> insert component dim before event dims
        k = len(self.event_shape)
        xc = jnp.expand_dims(x, axis=-k - 1) if k else x[..., None]
        logp = self.base.log_prob(xc)  # (*, batch, K)
        logw = jax.nn.log_softmax(self.logits, axis=-1)
        return jsp.logsumexp(logw + logp, axis=-1)

    def sample(self, key, sample_shape: Shape = ()):
        k1, k2 = jax.random.split(key)
        xs = self.base.sample(k1, sample_shape)  # (*, batch, K, event)
        idx = Categorical(logits=self.logits).sample(k2, sample_shape)  # (*, batch)
        k = len(self.event_shape)
        idx_exp = idx.reshape(idx.shape + (1,) * (k + 1))
        idx_exp = jnp.broadcast_to(
            idx_exp, idx.shape + (1,) + self.event_shape
        )
        picked = jnp.take_along_axis(xs, idx_exp, axis=idx.ndim)
        return picked.squeeze(axis=idx.ndim)

    def expand(self, batch_shape: Shape):
        K = self.base.batch_shape[-1]
        return Mixture(
            self.base.expand(tuple(batch_shape) + (K,)),
            jnp.broadcast_to(self.logits, tuple(batch_shape) + (K,)),
        )


class GeneralizedNormal(Distribution):
    r"""Generalized normal :math:`p(x) \propto \exp(-|x|^\beta)`
    (reference: zuko/distributions.py:289-334)."""

    def __init__(self, beta):
        self.beta = jnp.asarray(beta)

    @property
    def batch_shape(self) -> Shape:
        return self.beta.shape

    def log_prob(self, x):
        b = self.beta
        return jnp.log(b / 2) - jsp.gammaln(1 / b) - jnp.abs(x) ** b

    def sample(self, key, sample_shape: Shape = ()):
        # reference recipe: Gamma(1/beta)^(1/beta) * random sign
        # (zuko/distributions.py:330-334)
        shape = tuple(sample_shape) + self.batch_shape
        k1, k2 = jax.random.split(key)
        b = jnp.broadcast_to(self.beta, shape)
        g = jax.random.gamma(k1, 1 / b) ** (1 / b)
        sign = jax.random.rademacher(k2, shape, dtype=g.dtype)
        return g * sign

    def cdf(self, x):
        b = self.beta
        half = jsp.gammainc(1 / b, jnp.abs(x) ** b) / 2
        return jnp.where(x >= 0, 0.5 + half, 0.5 - half)

    def icdf(self, q):
        b = self.beta
        t = _gammaincinv(1 / b, jnp.abs(2 * q - 1))
        return jnp.sign(q - 0.5) * t ** (1 / b)

    def expand(self, batch_shape: Shape):
        return GeneralizedNormal(jnp.broadcast_to(self.beta, batch_shape))


class DiagNormal(Independent):
    r"""Multivariate normal with diagonal covariance
    (reference: zuko/distributions.py:337-363) — the default flow base.

    Example:
        >>> d = DiagNormal(jnp.zeros(3), jnp.ones(3))
        >>> d.event_shape
        (3,)
    """

    def __init__(self, loc, scale, ndims: int = 1):
        super().__init__(Normal(jnp.asarray(loc), jnp.asarray(scale)), ndims)

    def expand(self, batch_shape: Shape):
        shape = self.base.batch_shape
        inner = shape[len(shape) - self.ndims :]
        full = tuple(batch_shape) + inner
        return DiagNormal(
            jnp.broadcast_to(self.base.loc, full),
            jnp.broadcast_to(self.base.scale, full),
            self.ndims,
        )


class BoxUniform(Independent):
    r"""Uniform over a hyper-box (reference: zuko/distributions.py:366-396) —
    the NCSF base.

    Example:
        >>> d = BoxUniform(-jnp.ones(2), jnp.ones(2))
        >>> d.event_shape
        (2,)
    """

    def __init__(self, lower, upper, ndims: int = 1):
        super().__init__(Uniform(jnp.asarray(lower), jnp.asarray(upper)), ndims)

    def expand(self, batch_shape: Shape):
        shape = self.base.batch_shape
        inner = shape[len(shape) - self.ndims :]
        full = tuple(batch_shape) + inner
        return BoxUniform(
            jnp.broadcast_to(self.base.low, full),
            jnp.broadcast_to(self.base.high, full),
            self.ndims,
        )


class TransformedUniform(NormalizingFlow):
    r"""Distribution of :math:`X` such that :math:`f(X) \sim U[f(l), f(u)]`
    (reference: zuko/distributions.py:399-426)."""

    def __init__(self, f, lower, upper):
        super().__init__(f, Uniform(f(jnp.asarray(lower)), f(jnp.asarray(upper))))


class Truncated(Distribution):
    r"""Truncation of a univariate ``base`` to :math:`[lower, upper]`
    (reference: zuko/distributions.py:429-488)."""

    def __init__(self, base: Distribution, lower=-jnp.inf, upper=jnp.inf):
        assert base.event_shape == (), "only univariate distributions can be truncated"
        self.base = base
        self.lower = jnp.asarray(lower)
        self.upper = jnp.asarray(upper)

    @property
    def batch_shape(self) -> Shape:
        return self.base.batch_shape

    def _bounds(self):
        return self.base.cdf(self.lower), self.base.cdf(self.upper)

    def log_prob(self, x):
        ql, qu = self._bounds()
        inside = (x >= self.lower) & (x <= self.upper)
        lp = self.base.log_prob(x) - jnp.log(qu - ql)
        return jnp.where(inside, lp, -jnp.inf)

    def cdf(self, x):
        ql, qu = self._bounds()
        return jnp.clip((self.base.cdf(x) - ql) / (qu - ql), 0.0, 1.0)

    def sample(self, key, sample_shape: Shape = ()):
        # reference squeezes u into (eps, 1 - eps): zuko/distributions.py:481-488
        ql, qu = self._bounds()
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape, dtype=ql.dtype)
        eps = jnp.finfo(ql.dtype).eps
        q = ql + (qu - ql) * u
        q = jnp.clip(q, eps, 1 - eps)
        return self.base.icdf(q)

    def expand(self, batch_shape: Shape):
        return Truncated(
            self.base.expand(batch_shape),
            jnp.broadcast_to(self.lower, batch_shape),
            jnp.broadcast_to(self.upper, batch_shape),
        )


class Sort(Distribution):
    r"""Order statistics: ``n`` draws from ``base`` sorted (reference:
    zuko/distributions.py:491-567)."""

    has_rsample: bool = False

    def __init__(self, base: Distribution, n: int = 2, descending: bool = False):
        assert base.event_shape == (), "only univariate distributions can be sorted"
        self.base = base
        self.n = int(n)
        self.descending = bool(descending)

    @property
    def batch_shape(self) -> Shape:
        return self.base.batch_shape

    @property
    def event_shape(self) -> Shape:
        return (self.n,)

    def log_prob(self, x):
        # log n! + sum log p + ordered indicator (zuko/distributions.py:551-561)
        if self.descending:
            ordered = jnp.all(x[..., :-1] >= x[..., 1:], axis=-1)
        else:
            ordered = jnp.all(x[..., :-1] <= x[..., 1:], axis=-1)
        lp = jnp.sum(self.base.log_prob(jnp.moveaxis(x, -1, 0)), axis=0)
        return jnp.where(
            ordered, lp + jsp.gammaln(self.n + 1.0), -jnp.inf
        )

    def sample(self, key, sample_shape: Shape = ()):
        x = self.base.sample(key, tuple(sample_shape) + (self.n,))
        x = jnp.moveaxis(x, len(sample_shape), -1)
        x = jnp.sort(x, axis=-1)
        if self.descending:
            x = jnp.flip(x, axis=-1)
        return x

    def expand(self, batch_shape: Shape):
        return Sort(self.base.expand(batch_shape), self.n, self.descending)


class TopK(Sort):
    r"""Top-k of ``n`` draws from ``base``
    (reference: zuko/distributions.py:570-630)."""

    def __init__(self, base: Distribution, k: int = 1, n: int = 2, **kwargs):
        super().__init__(base, n, **kwargs)
        assert 1 <= k < n, "k has to be in [1, n)"
        self.k = int(k)

    @property
    def event_shape(self) -> Shape:
        return (self.k,)

    def log_prob(self, x):
        # Tail mass of the n-k unselected draws: below x[-1] when descending,
        # above x[-1] when ascending (zuko/distributions.py:622-627).
        if self.descending:
            ordered = jnp.all(x[..., :-1] >= x[..., 1:], axis=-1)
            tail = jnp.log(self.base.cdf(x[..., -1]))
        else:
            ordered = jnp.all(x[..., :-1] <= x[..., 1:], axis=-1)
            tail = jnp.log1p(-self.base.cdf(x[..., -1]))
        lp = jnp.sum(self.base.log_prob(jnp.moveaxis(x, -1, 0)), axis=0)
        # log n!/(n-k)! + (n - k) * log tail-mass (zuko/distributions.py:621-627)
        const = jsp.gammaln(self.n + 1.0) - jsp.gammaln(self.n - self.k + 1.0)
        lp = lp + const + (self.n - self.k) * tail
        return jnp.where(ordered, lp, -jnp.inf)

    def sample(self, key, sample_shape: Shape = ()):
        x = Sort(self.base, self.n, self.descending).sample(key, sample_shape)
        return x[..., : self.k]

    def expand(self, batch_shape: Shape):
        return TopK(
            self.base.expand(batch_shape), self.k, self.n,
            descending=self.descending,
        )


class Minimum(TopK):
    r"""Minimum of ``n`` draws, with scalar event
    (reference: zuko/distributions.py:633-699)."""

    def __init__(self, base: Distribution, n: int = 2):
        super().__init__(base, k=1, n=n, descending=False)

    @property
    def event_shape(self) -> Shape:
        return ()

    def log_prob(self, x):
        return super().log_prob(x[..., None])

    def sample(self, key, sample_shape: Shape = ()):
        return super().sample(key, sample_shape)[..., 0]

    def expand(self, batch_shape: Shape):
        return Minimum(self.base.expand(batch_shape), self.n)


class Maximum(TopK):
    r"""Maximum of ``n`` draws, with scalar event
    (reference: zuko/distributions.py:633-699)."""

    def __init__(self, base: Distribution, n: int = 2):
        super().__init__(base, k=1, n=n, descending=True)

    @property
    def event_shape(self) -> Shape:
        return ()

    def log_prob(self, x):
        return super().log_prob(x[..., None])

    def sample(self, key, sample_shape: Shape = ()):
        return super().sample(key, sample_shape)[..., 0]

    def expand(self, batch_shape: Shape):
        return Maximum(self.base.expand(batch_shape), self.n)


# ------------------------------------------------- torch-namespace breadth
# The reference re-exports ALL of ``torch.distributions``
# (zuko/distributions.py:23); the classes below complete that surface so a
# port never hits an ImportError. Each is parity-tested against torch on CPU
# (tests/test_distributions.py::test_torch_namespace_parity).


class ExponentialFamily(Distribution):
    r"""Abstract exponential-family marker (torch namespace parity). The
    torch class provides Bregman-divergence entropy machinery; here it is a
    plain :class:`Distribution` marker for ported ``isinstance`` checks."""


class Geometric(Distribution):
    r"""Geometric distribution over failures before the first success
    (torch namespace parity: support :math:`\{0, 1, 2, \dots\}`)."""

    has_rsample: bool = False

    def __init__(self, probs=None, logits=None):
        if probs is None:
            probs = jax.nn.sigmoid(jnp.asarray(logits))
        self.probs = jnp.asarray(probs)

    @property
    def batch_shape(self) -> Shape:
        return self.probs.shape

    def log_prob(self, x):
        p = self.probs
        return x * jnp.log1p(-p) + jnp.log(p)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        tiny = jnp.finfo(self.probs.dtype).tiny
        u = jax.random.uniform(key, shape, self.probs.dtype, tiny, 1.0)
        return jnp.floor(jnp.log(u) / jnp.log1p(-self.probs))

    def cdf(self, x):
        return -jnp.expm1(jnp.log1p(-self.probs) * (jnp.floor(x) + 1))

    def expand(self, batch_shape: Shape):
        return Geometric(jnp.broadcast_to(self.probs, batch_shape))

    @property
    def mean(self):
        return (1 - self.probs) / self.probs


class Pareto(Distribution):
    r"""Pareto Type I distribution with ``scale`` (minimum) and ``alpha``
    (torch namespace parity). Reparameterized through the closed-form
    quantile function."""

    def __init__(self, scale, alpha):
        self.scale = jnp.asarray(scale)
        self.alpha = jnp.asarray(alpha)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.scale.shape, self.alpha.shape)

    def log_prob(self, x):
        lp = (
            jnp.log(self.alpha)
            + self.alpha * jnp.log(self.scale)
            - (self.alpha + 1) * jnp.log(x)
        )
        return jnp.where(x >= self.scale, lp, -jnp.inf)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        tiny = jnp.finfo(self.scale.dtype).tiny
        u = jax.random.uniform(key, shape, self.scale.dtype, tiny, 1.0)
        return self.scale * u ** (-1 / self.alpha)

    def cdf(self, x):
        z = jnp.maximum(x, self.scale)
        return -jnp.expm1(self.alpha * (jnp.log(self.scale) - jnp.log(z)))

    def icdf(self, q):
        return self.scale * (1 - q) ** (-1 / self.alpha)

    def expand(self, batch_shape: Shape):
        return Pareto(
            jnp.broadcast_to(self.scale, batch_shape),
            jnp.broadcast_to(self.alpha, batch_shape),
        )

    @property
    def mean(self):
        return jnp.where(
            self.alpha > 1, self.alpha * self.scale / (self.alpha - 1), jnp.inf
        )


class HalfCauchy(Distribution):
    r"""Half-Cauchy distribution on :math:`[0, \infty)` (torch namespace
    parity). Reparameterized through the quantile function."""

    def __init__(self, scale=1.0):
        self.scale = jnp.asarray(scale)

    @property
    def batch_shape(self) -> Shape:
        return self.scale.shape

    def log_prob(self, x):
        lp = (
            math.log(2 / math.pi)
            - jnp.log(self.scale)
            - jnp.log1p((x / self.scale) ** 2)
        )
        return jnp.where(x >= 0, lp, -jnp.inf)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape, self.scale.dtype)
        return self.icdf(u)

    def cdf(self, x):
        return (2 / math.pi) * jnp.arctan(jnp.maximum(x, 0.0) / self.scale)

    def icdf(self, q):
        return self.scale * jnp.tan((math.pi / 2) * q)

    def expand(self, batch_shape: Shape):
        return HalfCauchy(jnp.broadcast_to(self.scale, batch_shape))


class InverseGamma(Distribution):
    r"""Inverse-gamma distribution (torch namespace parity:
    ``X = 1 / Gamma(concentration, rate)``). Reparameterized through JAX's
    implicitly-differentiated gamma sampler."""

    def __init__(self, concentration, rate=1.0):
        self.concentration = jnp.asarray(concentration)
        self.rate = jnp.asarray(rate)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.concentration.shape, self.rate.shape)

    def log_prob(self, x):
        a, r = self.concentration, self.rate
        lp = a * jnp.log(r) - jsp.gammaln(a) - (a + 1) * jnp.log(x) - r / x
        return jnp.where(x > 0, lp, -jnp.inf)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        g = jax.random.gamma(key, jnp.broadcast_to(self.concentration, shape))
        return self.rate / g

    def cdf(self, x):
        z = self.rate / jnp.maximum(x, jnp.finfo(self.rate.dtype).tiny)
        return jsp.gammaincc(self.concentration, z)

    def expand(self, batch_shape: Shape):
        return InverseGamma(
            jnp.broadcast_to(self.concentration, batch_shape),
            jnp.broadcast_to(self.rate, batch_shape),
        )

    @property
    def mean(self):
        return jnp.where(
            self.concentration > 1,
            self.rate / (self.concentration - 1),
            jnp.nan,
        )


class Kumaraswamy(Distribution):
    r"""Kumaraswamy distribution on :math:`(0, 1)` (torch namespace parity).
    Reparameterized through the closed-form quantile function."""

    def __init__(self, concentration1, concentration0):
        self.concentration1 = jnp.asarray(concentration1)
        self.concentration0 = jnp.asarray(concentration0)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(
            self.concentration1.shape, self.concentration0.shape
        )

    def log_prob(self, x):
        a, b = self.concentration1, self.concentration0
        return (
            jnp.log(a)
            + jnp.log(b)
            + (a - 1) * jnp.log(x)
            + (b - 1) * jnp.log1p(-(x**a))
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        tiny = jnp.finfo(self.concentration1.dtype).tiny
        u = jax.random.uniform(key, shape, self.concentration1.dtype, tiny, 1.0)
        # (1 - u^{1/b})^{1/a} with u ~ U(0, 1]
        return (
            -jnp.expm1(jnp.log(u) / self.concentration0)
        ) ** (1 / self.concentration1)

    def cdf(self, x):
        return -jnp.expm1(
            self.concentration0 * jnp.log1p(-(x**self.concentration1))
        )

    def icdf(self, q):
        return (
            -jnp.expm1(jnp.log1p(-q) / self.concentration0)
        ) ** (1 / self.concentration1)

    def expand(self, batch_shape: Shape):
        return Kumaraswamy(
            jnp.broadcast_to(self.concentration1, batch_shape),
            jnp.broadcast_to(self.concentration0, batch_shape),
        )


class ContinuousBernoulli(Distribution):
    r"""Continuous Bernoulli on :math:`[0, 1]` (torch namespace parity;
    Loaiza-Ganem & Cunningham, 2019). Reparameterized through the
    closed-form quantile function."""

    def __init__(self, probs=None, logits=None, lims=(0.499, 0.501)):
        if probs is None:
            probs = jax.nn.sigmoid(jnp.asarray(logits))
        self.probs = jnp.asarray(probs)
        # torch's unstable-region window: inside |p - 1/2| < lims[1] - 1/2
        # the log-normalizer/cdf/mean switch to their Taylor forms
        self._half = float(lims[1] - 0.5)

    @property
    def batch_shape(self) -> Shape:
        return self.probs.shape

    @property
    def logits(self):
        return jnp.log(self.probs) - jnp.log1p(-self.probs)

    def _log_norm(self):
        p = self.probs
        # C(p) = 2 atanh(1-2p) / (1-2p) for p != 1/2, C(1/2) = 2
        safe = jnp.where(jnp.abs(p - 0.5) < self._half, 0.4, p)
        ln = jnp.log(2 * jnp.abs(jnp.arctanh(1 - 2 * safe))) - jnp.log(
            jnp.abs(1 - 2 * safe)
        )
        # quadratic Taylor expansion around p = 1/2: log 2 + 4/3 eps^2
        eps = p - 0.5
        taylor = math.log(2.0) + (4.0 / 3.0) * eps**2
        return jnp.where(jnp.abs(p - 0.5) < self._half, taylor, ln)

    def log_prob(self, x):
        p = self.probs
        return (
            x * jnp.log(p) + (1 - x) * jnp.log1p(-p) + self._log_norm()
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape, self.probs.dtype)
        return self.icdf(u)

    def cdf(self, x):
        p = self.probs
        safe = jnp.where(jnp.abs(p - 0.5) < self._half, 0.4, p)
        num = safe**x * (1 - safe) ** (1 - x) + safe - 1
        out = num / (2 * safe - 1)
        return jnp.clip(jnp.where(jnp.abs(p - 0.5) < self._half, x, out), 0.0, 1.0)

    def icdf(self, q):
        p = self.probs
        safe = jnp.where(jnp.abs(p - 0.5) < self._half, 0.4, p)
        out = (
            jnp.log1p(q * (2 * safe - 1) / (1 - safe))
            / (jnp.log(safe) - jnp.log1p(-safe))
        )
        return jnp.where(jnp.abs(p - 0.5) < self._half, q, out)

    def expand(self, batch_shape: Shape):
        return ContinuousBernoulli(
            jnp.broadcast_to(self.probs, batch_shape),
            lims=(0.5 - self._half, 0.5 + self._half),
        )

    @property
    def mean(self):
        p = self.probs
        safe = jnp.where(jnp.abs(p - 0.5) < self._half, 0.4, p)
        out = safe / (2 * safe - 1) + 1 / (2 * jnp.arctanh(1 - 2 * safe))
        return jnp.where(jnp.abs(p - 0.5) < self._half, 0.5, out)


class FisherSnedecor(Distribution):
    r"""Fisher–Snedecor (F) distribution (torch namespace parity).
    Reparameterized through two gamma draws."""

    def __init__(self, df1, df2):
        self.df1 = jnp.asarray(df1)
        self.df2 = jnp.asarray(df2)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.df1.shape, self.df2.shape)

    def log_prob(self, x):
        d1, d2 = self.df1, self.df2
        lp = (
            0.5 * d1 * jnp.log(d1 / d2)
            + (0.5 * d1 - 1) * jnp.log(x)
            - 0.5 * (d1 + d2) * jnp.log1p(d1 * x / d2)
            - (jsp.gammaln(0.5 * d1) + jsp.gammaln(0.5 * d2)
               - jsp.gammaln(0.5 * (d1 + d2)))
        )
        return jnp.where(x > 0, lp, -jnp.inf)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        k1, k2 = jax.random.split(key)
        g1 = jax.random.gamma(k1, jnp.broadcast_to(0.5 * self.df1, shape))
        g2 = jax.random.gamma(k2, jnp.broadcast_to(0.5 * self.df2, shape))
        return (g1 / self.df1) / jnp.maximum(
            g2 / self.df2, jnp.finfo(g2.dtype).tiny
        )

    def cdf(self, x):
        d1, d2 = self.df1, self.df2
        z = jnp.maximum(x, 0.0)
        return jsp.betainc(0.5 * d1, 0.5 * d2, d1 * z / (d1 * z + d2))

    def expand(self, batch_shape: Shape):
        return FisherSnedecor(
            jnp.broadcast_to(self.df1, batch_shape),
            jnp.broadcast_to(self.df2, batch_shape),
        )

    @property
    def mean(self):
        return jnp.where(self.df2 > 2, self.df2 / (self.df2 - 2), jnp.nan)


class GeneralizedPareto(Distribution):
    r"""Generalized Pareto distribution (torch namespace parity): location,
    scale, and shape ``concentration`` :math:`\xi` (any sign).
    Reparameterized through the closed-form quantile function."""

    def __init__(self, loc=0.0, scale=1.0, concentration=0.0):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        self.concentration = jnp.asarray(concentration)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(
            self.loc.shape, self.scale.shape, self.concentration.shape
        )

    def _log1pxz(self, z):
        # log(1 + xi z) / xi, with the xi -> 0 limit z
        xi = self.concentration
        safe = jnp.where(jnp.abs(xi) < 1e-6, 1.0, xi)
        out = jnp.log1p(safe * z) / safe
        return jnp.where(jnp.abs(xi) < 1e-6, z - 0.5 * xi * z * z, out)

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        lp = -jnp.log(self.scale) - (1 + self.concentration) * self._log1pxz(z)
        inside = (z >= 0) & (
            (self.concentration >= 0) | (z <= -1 / jnp.where(
                jnp.abs(self.concentration) < 1e-12, -jnp.inf,
                self.concentration))
        )
        return jnp.where(inside, lp, -jnp.inf)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(
            key, shape, self.scale.dtype, jnp.finfo(self.scale.dtype).tiny, 1.0
        )
        return self.icdf(1.0 - u)

    def cdf(self, x):
        z = jnp.maximum((x - self.loc) / self.scale, 0.0)
        return -jnp.expm1(-self._log1pxz(z))

    def icdf(self, q):
        xi = self.concentration
        safe = jnp.where(jnp.abs(xi) < 1e-6, 1.0, xi)
        t = -jnp.log1p(-q)
        z = jnp.expm1(safe * t) / safe
        z = jnp.where(jnp.abs(xi) < 1e-6, t * (1 + 0.5 * xi * t), z)
        return self.loc + self.scale * z

    def expand(self, batch_shape: Shape):
        return GeneralizedPareto(
            jnp.broadcast_to(self.loc, batch_shape),
            jnp.broadcast_to(self.scale, batch_shape),
            jnp.broadcast_to(self.concentration, batch_shape),
        )


class NegativeBinomial(Distribution):
    r"""Negative binomial: successes before ``total_count`` failures, with
    success probability ``probs`` (torch namespace parity). Discrete;
    sampled through the gamma–Poisson mixture."""

    has_rsample: bool = False

    def __init__(self, total_count, probs=None, logits=None):
        if probs is None:
            probs = jax.nn.sigmoid(jnp.asarray(logits))
        self.total_count = jnp.asarray(total_count, dtype=float)
        self.probs = jnp.asarray(probs)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.total_count.shape, self.probs.shape)

    @property
    def logits(self):
        return jnp.log(self.probs) - jnp.log1p(-self.probs)

    def log_prob(self, x):
        n, p = self.total_count, self.probs
        return (
            n * jnp.log1p(-p)
            + x * jnp.log(p)
            + jsp.gammaln(n + x)
            - jsp.gammaln(x + 1)
            - jsp.gammaln(n)
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        k1, k2 = jax.random.split(key)
        g = jax.random.gamma(k1, jnp.broadcast_to(self.total_count, shape))
        rate = g * self.probs / (1 - self.probs)
        return jax.random.poisson(k2, rate).astype(self.probs.dtype)

    def expand(self, batch_shape: Shape):
        return NegativeBinomial(
            jnp.broadcast_to(self.total_count, batch_shape),
            jnp.broadcast_to(self.probs, batch_shape),
        )

    @property
    def mean(self):
        return self.total_count * self.probs / (1 - self.probs)


class Multinomial(Distribution):
    r"""Multinomial counts over ``total_count`` trials (torch namespace
    parity). ``total_count`` must be a Python int (static trial count for
    XLA). Discrete."""

    has_rsample: bool = False

    def __init__(self, total_count=1, probs=None, logits=None):
        if logits is None:
            logits = jnp.log(jnp.asarray(probs))
        assert isinstance(total_count, int), (
            "Multinomial requires a Python int total_count (static shape)"
        )
        self.total_count = total_count
        self.logits_ = jnp.asarray(logits)

    @property
    def logits(self):
        return jax.nn.log_softmax(self.logits_, axis=-1)

    @property
    def probs(self):
        return jax.nn.softmax(self.logits_, axis=-1)

    @property
    def batch_shape(self) -> Shape:
        return self.logits_.shape[:-1]

    @property
    def event_shape(self) -> Shape:
        return self.logits_.shape[-1:]

    def log_prob(self, x):
        logp = self.logits
        return (
            jsp.gammaln(self.total_count + 1.0)
            - jnp.sum(jsp.gammaln(x + 1.0), axis=-1)
            + jnp.sum(x * logp, axis=-1)
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        K = self.logits_.shape[-1]
        draws = jax.random.categorical(
            key, self.logits_, axis=-1, shape=(self.total_count,) + shape
        )
        counts = jax.nn.one_hot(draws, K, dtype=self.logits_.dtype)
        return jnp.sum(counts, axis=0)

    def expand(self, batch_shape: Shape):
        return Multinomial(
            self.total_count,
            logits=jnp.broadcast_to(
                self.logits_, tuple(batch_shape) + self.event_shape
            ),
        )

    @property
    def mean(self):
        return self.total_count * self.probs


class OneHotCategorical(Distribution):
    r"""One-hot-coded categorical (torch namespace parity)."""

    has_rsample: bool = False

    def __init__(self, probs=None, logits=None):
        if logits is None:
            logits = jnp.log(jnp.asarray(probs))
        self.logits_ = jnp.asarray(logits)

    @property
    def logits(self):
        return jax.nn.log_softmax(self.logits_, axis=-1)

    @property
    def probs(self):
        return jax.nn.softmax(self.logits_, axis=-1)

    @property
    def batch_shape(self) -> Shape:
        return self.logits_.shape[:-1]

    @property
    def event_shape(self) -> Shape:
        return self.logits_.shape[-1:]

    def log_prob(self, x):
        return jnp.sum(x * self.logits, axis=-1)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        idx = jax.random.categorical(key, self.logits_, axis=-1, shape=shape)
        return jax.nn.one_hot(
            idx, self.logits_.shape[-1], dtype=self.logits_.dtype
        )

    def expand(self, batch_shape: Shape):
        return type(self)(
            logits=jnp.broadcast_to(
                self.logits_, tuple(batch_shape) + self.event_shape
            )
        )

    @property
    def mean(self):
        return self.probs


class OneHotCategoricalStraightThrough(OneHotCategorical):
    r"""One-hot categorical with straight-through reparameterized gradients
    (torch namespace parity): the sample is the hard one-hot, the gradient
    flows to ``probs``."""

    has_rsample: bool = True

    def rsample(self, key, sample_shape: Shape = ()):
        hard = self.sample(key, sample_shape)
        p = self.probs
        return p + jax.lax.stop_gradient(hard - p)


class RelaxedBernoulli(Distribution):
    r"""Relaxed (Concrete / Gumbel-sigmoid) Bernoulli on :math:`(0, 1)` at
    ``temperature`` (torch namespace parity). Reparameterized."""

    def __init__(self, temperature, probs=None, logits=None):
        if logits is None:
            p = jnp.asarray(probs)
            logits = jnp.log(p) - jnp.log1p(-p)
        self.temperature = jnp.asarray(temperature)
        self.logits = jnp.asarray(logits)

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(self.temperature.shape, self.logits.shape)

    def log_prob(self, x):
        t = self.temperature
        z = jnp.log(x) - jnp.log1p(-x)  # logit(x)
        d = self.logits - t * z
        # logit-space density + |d logit / dx| = 1 / (x (1 - x))
        return (
            jnp.log(t) + d - 2 * jax.nn.softplus(d)
            - jnp.log(x) - jnp.log1p(-x)
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        tiny = jnp.finfo(self.logits.dtype).tiny
        u = jax.random.uniform(key, shape, self.logits.dtype, tiny, 1.0)
        noise = jnp.log(u) - jnp.log1p(-u)  # standard logistic
        return jax.nn.sigmoid((self.logits + noise) / self.temperature)

    def expand(self, batch_shape: Shape):
        return RelaxedBernoulli(
            jnp.broadcast_to(self.temperature, batch_shape),
            logits=jnp.broadcast_to(self.logits, batch_shape),
        )


class RelaxedOneHotCategorical(Distribution):
    r"""Relaxed (Concrete / Gumbel-softmax) one-hot categorical on the
    simplex at ``temperature`` (torch namespace parity). Reparameterized."""

    def __init__(self, temperature, probs=None, logits=None):
        if logits is None:
            logits = jnp.log(jnp.asarray(probs))
        self.temperature = jnp.asarray(temperature)
        self.logits_ = jnp.asarray(logits)

    @property
    def logits(self):
        return jax.nn.log_softmax(self.logits_, axis=-1)

    @property
    def probs(self):
        return jax.nn.softmax(self.logits_, axis=-1)

    @property
    def batch_shape(self) -> Shape:
        return self.logits_.shape[:-1]

    @property
    def event_shape(self) -> Shape:
        return self.logits_.shape[-1:]

    def log_prob(self, x):
        K = self.logits_.shape[-1]
        t = self.temperature
        logx = jnp.log(x)
        score = self.logits - t[..., None] * logx
        score = jnp.sum(
            score - jsp.logsumexp(score, axis=-1, keepdims=True), axis=-1
        )
        # + lgamma(K) + (K-1) log t from the Concrete density, - sum log x
        # from the exp map off the ExpRelaxed base (torch's construction)
        return (
            score
            + jsp.gammaln(jnp.asarray(float(K)))
            + (K - 1) * jnp.log(t)
            - jnp.sum(logx, axis=-1)
        )

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        g = jax.random.gumbel(key, shape, self.logits_.dtype)
        return jax.nn.softmax(
            (self.logits_ + g) / self.temperature[..., None], axis=-1
        )

    def expand(self, batch_shape: Shape):
        return RelaxedOneHotCategorical(
            jnp.broadcast_to(self.temperature, batch_shape),
            logits=jnp.broadcast_to(
                self.logits_, tuple(batch_shape) + self.event_shape
            ),
        )


class LowRankMultivariateNormal(Distribution):
    r"""Multivariate normal with covariance
    :math:`W W^\top + \mathrm{diag}(d)` (torch namespace parity). The
    density uses the Woodbury identity and the matrix determinant lemma —
    :math:`O(D k^2)` instead of :math:`O(D^3)`; on TPU the inner products
    ride the MXU."""

    def __init__(self, loc, cov_factor, cov_diag):
        self.loc = jnp.asarray(loc)
        self.cov_factor = jnp.asarray(cov_factor)  # (..., D, k)
        self.cov_diag = jnp.asarray(cov_diag)  # (..., D)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(
            self.loc.shape[:-1],
            self.cov_factor.shape[:-2],
            self.cov_diag.shape[:-1],
        )

    @property
    def event_shape(self) -> Shape:
        return self.loc.shape[-1:]

    def _capacitance_tril(self):
        W, d = self.cov_factor, self.cov_diag
        Wt_Dinv = jnp.swapaxes(W, -1, -2) / d[..., None, :]
        K = Wt_Dinv @ W + jnp.eye(W.shape[-1], dtype=W.dtype)
        return jnp.linalg.cholesky(K)

    def log_prob(self, x):
        W, d = self.cov_factor, self.cov_diag
        diff = x - self.loc
        L = self._capacitance_tril()
        # Mahalanobis via Woodbury: diff^T D^-1 diff - ||L^-1 W^T D^-1 diff||^2
        Dinv_diff = diff / d
        Wt_Dinv_diff = jnp.einsum("...dk,...d->...k", W, Dinv_diff)
        k = W.shape[-1]
        Lb = jnp.broadcast_to(L, Wt_Dinv_diff.shape[:-1] + (k, k))
        y = jax.scipy.linalg.solve_triangular(
            Lb, Wt_Dinv_diff[..., None], lower=True
        )[..., 0]
        maha = jnp.sum(diff * Dinv_diff, axis=-1) - jnp.sum(y * y, axis=-1)
        logdet = (
            jnp.sum(jnp.log(d), axis=-1)
            + 2 * jnp.sum(
                jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
            )
        )
        D = self.loc.shape[-1]
        return -0.5 * (D * math.log(2 * math.pi) + logdet + maha)

    def sample(self, key, sample_shape: Shape = ()):
        shape = tuple(sample_shape) + self.batch_shape
        k1, k2 = jax.random.split(key)
        D, k = self.cov_factor.shape[-2:]
        eps_k = jax.random.normal(k1, shape + (k,), self.loc.dtype)
        eps_d = jax.random.normal(k2, shape + (D,), self.loc.dtype)
        return (
            self.loc
            + jnp.einsum("...dk,...k->...d", self.cov_factor, eps_k)
            + jnp.sqrt(self.cov_diag) * eps_d
        )

    def expand(self, batch_shape: Shape):
        D, k = self.cov_factor.shape[-2:]
        return LowRankMultivariateNormal(
            jnp.broadcast_to(self.loc, tuple(batch_shape) + (D,)),
            jnp.broadcast_to(self.cov_factor, tuple(batch_shape) + (D, k)),
            jnp.broadcast_to(self.cov_diag, tuple(batch_shape) + (D,)),
        )

    @property
    def mean(self):
        return jnp.broadcast_to(
            self.loc, self.batch_shape + self.event_shape
        )


class Wishart(Distribution):
    r"""Wishart distribution over positive-definite matrices (torch
    namespace parity). Sampling uses the Bartlett decomposition
    (reparameterized through gamma/normal draws); requires
    ``df > D - 1``."""

    def __init__(self, df, covariance_matrix=None, precision_matrix=None,
                 scale_tril=None):
        if scale_tril is None:
            if covariance_matrix is None:
                # torch option: Sigma = inv(P); with P = Lp Lp^T,
                # chol(Sigma) is the reversed-triangular solve of Lp
                Lp = jnp.linalg.cholesky(jnp.asarray(precision_matrix))
                eye = jnp.broadcast_to(
                    jnp.eye(Lp.shape[-1], dtype=Lp.dtype), Lp.shape)
                Lp_inv = jax.scipy.linalg.solve_triangular(Lp, eye, lower=True)
                covariance_matrix = jnp.swapaxes(Lp_inv, -1, -2) @ Lp_inv
            scale_tril = jnp.linalg.cholesky(jnp.asarray(covariance_matrix))
        self.df = jnp.asarray(df, dtype=float)
        self.scale_tril = jnp.asarray(scale_tril)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(
            self.df.shape, self.scale_tril.shape[:-2]
        )

    @property
    def event_shape(self) -> Shape:
        return self.scale_tril.shape[-2:]

    def log_prob(self, x):
        D = self.scale_tril.shape[-1]
        df = self.df
        L = self.scale_tril
        # tr(Sigma^-1 X) = ||L^-1 Lx||_F^2 with X = Lx Lx^T
        Lx = jnp.linalg.cholesky(x)
        sol = jax.scipy.linalg.solve_triangular(
            jnp.broadcast_to(L, x.shape), Lx, lower=True
        )
        trace = jnp.sum(sol * sol, axis=(-2, -1))
        logdet_x = 2 * jnp.sum(
            jnp.log(jnp.diagonal(Lx, axis1=-2, axis2=-1)), axis=-1
        )
        logdet_s = 2 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
        )
        return (
            0.5 * (df - D - 1) * logdet_x
            - 0.5 * trace
            - 0.5 * df * D * math.log(2.0)
            - 0.5 * df * logdet_s
            - jsp.multigammaln(0.5 * df, D)
        )

    def sample(self, key, sample_shape: Shape = ()):
        D = self.scale_tril.shape[-1]
        shape = tuple(sample_shape) + self.batch_shape
        k1, k2 = jax.random.split(key)
        # Bartlett: A lower-triangular, A_ii = sqrt(chi2(df - i)),
        # A_ij ~ N(0,1) below the diagonal
        i = jnp.arange(D, dtype=self.df.dtype)
        chi2 = 2 * jax.random.gamma(
            k1, jnp.broadcast_to(0.5 * (self.df[..., None] - i),
                                 shape + (D,))
        )
        normals = jax.random.normal(k2, shape + (D, D), self.scale_tril.dtype)
        A = jnp.tril(normals, -1) + jnp.zeros(
            shape + (D, D), self.scale_tril.dtype
        ).at[..., jnp.arange(D), jnp.arange(D)].set(jnp.sqrt(chi2))
        LA = self.scale_tril @ A
        return LA @ jnp.swapaxes(LA, -1, -2)

    def expand(self, batch_shape: Shape):
        D = self.scale_tril.shape[-1]
        return Wishart(
            jnp.broadcast_to(self.df, batch_shape),
            scale_tril=jnp.broadcast_to(
                self.scale_tril, tuple(batch_shape) + (D, D)
            ),
        )

    @property
    def mean(self):
        S = self.scale_tril @ jnp.swapaxes(self.scale_tril, -1, -2)
        return self.df[..., None, None] * S


class LKJCholesky(Distribution):
    r"""LKJ distribution over Cholesky factors of correlation matrices
    (torch namespace parity; Lewandowski–Kurowicka–Joe 2009, onion method
    sampling). ``concentration == 1`` is uniform over correlation
    matrices."""

    has_rsample: bool = False

    def __init__(self, dim: int, concentration=1.0):
        assert dim >= 2, "dim must be >= 2"
        self.dim = int(dim)
        self.concentration = jnp.asarray(concentration, dtype=float)

    @property
    def batch_shape(self) -> Shape:
        return self.concentration.shape

    @property
    def event_shape(self) -> Shape:
        return (self.dim, self.dim)

    def log_prob(self, x):
        D = self.dim
        diag = jnp.diagonal(x, axis1=-2, axis2=-1)[..., 1:]
        order = jnp.arange(2, D + 1, dtype=x.dtype)
        order = 2 * (self.concentration[..., None] - 1) + D - order
        unnorm = jnp.sum(order * jnp.log(diag), axis=-1)
        dm1 = D - 1
        alpha = self.concentration + 0.5 * dm1
        denom = jsp.gammaln(alpha) * dm1
        numer = jsp.multigammaln(alpha - 0.5, dm1)
        pi_const = 0.5 * dm1 * math.log(math.pi)
        return unnorm - (pi_const + numer - denom)

    def sample(self, key, sample_shape: Shape = ()):
        D = self.dim
        shape = tuple(sample_shape) + self.batch_shape
        k1, k2 = jax.random.split(key)
        # beta draws per row (vectorized onion, torch's parameterization)
        offset = jnp.concatenate(
            [jnp.zeros(1), jnp.arange(D - 1, dtype=float)]
        )
        c1 = offset + 0.5
        c0 = (self.concentration + 0.5 * (D - 2))[..., None] - 0.5 * offset
        ka, kb = jax.random.split(k1)
        ga = jax.random.gamma(ka, jnp.broadcast_to(c1, shape + (D,)))
        gb = jax.random.gamma(kb, jnp.broadcast_to(c0, shape + (D,)))
        y = (ga / (ga + gb))[..., None]
        u = jnp.tril(jax.random.normal(k2, shape + (D, D)), -1)
        norm = jnp.linalg.norm(u, axis=-1, keepdims=True)
        u_sphere = u / jnp.where(norm == 0, 1.0, norm)
        w = jnp.sqrt(y) * u_sphere
        diag = jnp.sqrt(
            jnp.clip(1 - jnp.sum(w**2, axis=-1), jnp.finfo(w.dtype).tiny)
        )
        return w + jnp.zeros_like(w).at[
            ..., jnp.arange(D), jnp.arange(D)
        ].set(diag)

    def expand(self, batch_shape: Shape):
        return LKJCholesky(
            self.dim, jnp.broadcast_to(self.concentration, batch_shape)
        )


class TransformedDistribution(NormalizingFlow):
    r"""torch-namespace ``TransformedDistribution(base, transforms)``: the
    transforms apply in the SAMPLING direction (:math:`x = f(z)`), so this
    is :class:`NormalizingFlow` over the lazy inverse. Accepts a single
    transform or a list."""

    def __init__(self, base: Distribution = None, transforms=None,
                 *, base_distribution: Distribution = None):
        from .transforms import ComposedTransform

        if base is None:
            base = base_distribution  # torch keyword spelling
        if isinstance(transforms, (list, tuple)):
            t = (
                transforms[0]
                if len(transforms) == 1
                else ComposedTransform(*transforms)
            )
        else:
            t = transforms
        super().__init__(t.inv, base)


class LogisticNormal(TransformedDistribution):
    r"""Logistic-normal over the simplex (torch namespace parity): a
    diagonal normal pushed through :class:`StickBreakingTransform`. Event
    shape is one longer than the base's."""

    def __init__(self, loc, scale):
        from .transforms import DependentTransform, StickBreakingTransform

        loc = jnp.asarray(loc)
        scale = jnp.asarray(scale)
        base = Independent(Normal(loc, scale), 1)
        super().__init__(base, StickBreakingTransform())
        self.loc = loc
        self.scale = scale


class MixtureSameFamily(Distribution):
    r"""torch-namespace mixture API: ``mixture_distribution`` is a
    :class:`Categorical` over the LAST batch axis of
    ``component_distribution`` (the reference's own :class:`Mixture` takes
    (base, logits) directly — this wrapper is the torch calling
    convention)."""

    has_rsample: bool = False

    def __init__(self, mixture_distribution, component_distribution):
        self.mixture_distribution = mixture_distribution
        self.component_distribution = component_distribution
        self._mix = Mixture(
            component_distribution, mixture_distribution.logits
        )

    @property
    def batch_shape(self) -> Shape:
        return self._mix.batch_shape

    @property
    def event_shape(self) -> Shape:
        return self._mix.event_shape

    def log_prob(self, x):
        return self._mix.log_prob(x)

    def sample(self, key, sample_shape: Shape = ()):
        return self._mix.sample(key, sample_shape)

    def expand(self, batch_shape: Shape):
        K = self.component_distribution.batch_shape[-1]
        return MixtureSameFamily(
            Categorical(
                logits=jnp.broadcast_to(
                    self.mixture_distribution.logits,
                    tuple(batch_shape) + (K,),
                )
            ),
            self.component_distribution.expand(tuple(batch_shape) + (K,)),
        )

    @property
    def mean(self):
        w = jax.nn.softmax(self.mixture_distribution.logits, axis=-1)
        k = len(self.event_shape)
        m = self.component_distribution.mean
        w = w.reshape(w.shape + (1,) * k)
        return jnp.sum(w * m, axis=-1 - k if k else -1)


# The reference's distributions namespace also carries every transform
# (zuko/distributions.py:23 wildcard-imports torch.distributions, whose
# __init__ re-exports torch.distributions.transforms) — mirror that so
# ported code reaching e.g. ``zuko.distributions.AffineTransform`` works.
from .transforms import *  # noqa: E402,F401,F403
from .transforms import __all__ as _transforms_all  # noqa: E402

__all__ = __all__ + list(_transforms_all)


# ------------------------------------------------ entropy / KL registries
# The reference's namespace carries torch's ``kl_divergence`` /
# ``register_kl`` and every distribution's ``.entropy()``
# (zuko/distributions.py:23 wildcard). Both are type-registry dispatched,
# like torch: the most-derived registered (type(p), type(q)) pair wins.

_ENTROPY_REGISTRY: dict = {}
_KL_REGISTRY: dict = {}


def register_entropy(cls):
    def decorator(fn):
        _ENTROPY_REGISTRY[cls] = fn
        return fn
    return decorator


def register_kl(p_cls, q_cls):
    r"""Register a closed-form KL for a (type(p), type(q)) pair (torch
    namespace parity with ``torch.distributions.register_kl``)."""
    def decorator(fn):
        _KL_REGISTRY[(p_cls, q_cls)] = fn
        return fn
    return decorator


def _entropy_impl(self):
    for cls in type(self).__mro__:
        fn = _ENTROPY_REGISTRY.get(cls)
        if fn is not None:
            return fn(self)
    raise NotImplementedError(
        f"entropy is not implemented for {type(self).__name__}"
    )


Distribution.entropy = _entropy_impl


def kl_divergence(p: Distribution, q: Distribution) -> jax.Array:
    r"""KL(p || q) via the registry (torch namespace parity with
    ``torch.distributions.kl_divergence``): the most specific registered
    (type(p), type(q)) pair by MRO order wins."""
    matches = []
    for pc in type(p).__mro__:
        for qc in type(q).__mro__:
            fn = _KL_REGISTRY.get((pc, qc))
            if fn is not None:
                matches.append((type(p).__mro__.index(pc)
                                + type(q).__mro__.index(qc), fn))
    if not matches:
        raise NotImplementedError(
            f"no KL(p || q) is registered for "
            f"({type(p).__name__}, {type(q).__name__})"
        )
    return min(matches, key=lambda t: t[0])[1](p, q)


_EULER = 0.5772156649015329
_LOG_2PI = math.log(2 * math.pi)


@register_entropy(Normal)
def _(d):
    return 0.5 + 0.5 * _LOG_2PI + jnp.log(
        jnp.broadcast_to(d.scale, d.batch_shape))


@register_entropy(Uniform)
def _(d):
    return jnp.broadcast_to(jnp.log(d.high - d.low), d.batch_shape)


@register_entropy(Laplace)
def _(d):
    return 1 + jnp.log(2 * jnp.broadcast_to(d.scale, d.batch_shape))


@register_entropy(Exponential)
def _(d):
    return 1 - jnp.log(d.rate)


@register_entropy(Cauchy)
def _(d):
    return jnp.log(4 * math.pi * jnp.broadcast_to(d.scale, d.batch_shape))


@register_entropy(HalfCauchy)
def _(d):
    return jnp.log(2 * math.pi * d.scale)


@register_entropy(Gamma)
def _(d):
    a, r = d.concentration, d.rate
    return a - jnp.log(r) + jsp.gammaln(a) + (1 - a) * jsp.digamma(a)


@register_entropy(Beta)
def _(d):
    a, b = jnp.broadcast_arrays(d.alpha, d.beta)
    lbeta = jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b)
    return (
        lbeta
        - (a - 1) * jsp.digamma(a)
        - (b - 1) * jsp.digamma(b)
        + (a + b - 2) * jsp.digamma(a + b)
    )


@register_entropy(Gumbel)
def _(d):
    return jnp.log(jnp.broadcast_to(d.scale, d.batch_shape)) + 1 + _EULER


@register_entropy(StudentT)
def _(d):
    v = jnp.broadcast_to(d.df, d.batch_shape)
    s = jnp.broadcast_to(d.scale, d.batch_shape)
    lbeta = (jsp.gammaln(0.5 * v) + jsp.gammaln(0.5)
             - jsp.gammaln(0.5 * (v + 1)))
    return (
        jnp.log(s)
        + 0.5 * (v + 1) * (jsp.digamma(0.5 * (v + 1)) - jsp.digamma(0.5 * v))
        + 0.5 * jnp.log(v) + lbeta
    )


@register_entropy(HalfNormal)
def _(d):
    return 0.5 * jnp.log(math.pi * d.scale**2 / 2) + 0.5


@register_entropy(LogNormal)
def _(d):
    return (jnp.broadcast_to(d.loc, d.batch_shape) + 0.5
            + 0.5 * jnp.log(2 * math.pi * d.scale**2))


@register_entropy(Weibull)
def _(d):
    lam, k = jnp.broadcast_arrays(d.scale, d.concentration)
    return _EULER * (1 - 1 / k) + jnp.log(lam / k) + 1


@register_entropy(Pareto)
def _(d):
    s, a = jnp.broadcast_arrays(d.scale, d.alpha)
    return jnp.log(s / a) + 1 + 1 / a


@register_entropy(Bernoulli)
def _(d):
    p = jnp.broadcast_to(d.probs, d.batch_shape)
    return -(jsp.xlogy(p, p) + jsp.xlogy(1 - p, 1 - p))


@register_entropy(Geometric)
def _(d):
    p = d.probs
    return -(jsp.xlogy(1 - p, 1 - p) + jsp.xlogy(p, p)) / p


@register_entropy(Categorical)
def _(d):
    logp = jax.nn.log_softmax(d.logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


@register_entropy(OneHotCategorical)
def _(d):
    logp = d.logits
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


@register_entropy(Dirichlet)
def _(d):
    a = d.concentration
    a0 = jnp.sum(a, axis=-1)
    K = a.shape[-1]
    lnB = jnp.sum(jsp.gammaln(a), axis=-1) - jsp.gammaln(a0)
    return (
        lnB
        + (a0 - K) * jsp.digamma(a0)
        - jnp.sum((a - 1) * jsp.digamma(a), axis=-1)
    )


@register_entropy(MultivariateNormal)
def _(d):
    D = d.event_shape[-1]
    halflogdet = jnp.sum(
        jnp.log(jnp.diagonal(d.scale_tril, axis1=-2, axis2=-1)), axis=-1
    )
    return 0.5 * D * (1 + _LOG_2PI) + halflogdet


@register_entropy(Independent)
def _(d):
    return _sum_rightmost(d.base.entropy(), d.ndims)


@register_kl(Normal, Normal)
def _(p, q):
    var_ratio = (p.scale / q.scale) ** 2
    t1 = ((p.loc - q.loc) / q.scale) ** 2
    return 0.5 * (var_ratio + t1 - 1 - jnp.log(var_ratio))


@register_kl(Independent, Independent)
def _(p, q):
    assert p.ndims == q.ndims
    return _sum_rightmost(kl_divergence(p.base, q.base), p.ndims)


@register_kl(Categorical, Categorical)
def _(p, q):
    lp = jax.nn.log_softmax(p.logits, axis=-1)
    lq = jax.nn.log_softmax(q.logits, axis=-1)
    return jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)


@register_kl(OneHotCategorical, OneHotCategorical)
def _(p, q):
    return jnp.sum(jnp.exp(p.logits) * (p.logits - q.logits), axis=-1)


@register_kl(Bernoulli, Bernoulli)
def _(p, q):
    pp = jnp.broadcast_to(p.probs, p.batch_shape)
    qp = jnp.broadcast_to(q.probs, q.batch_shape)
    t1 = jsp.xlogy(pp, pp) - jsp.xlogy(pp, qp)
    t2 = jsp.xlogy(1 - pp, 1 - pp) - jsp.xlogy(1 - pp, 1 - qp)
    return t1 + t2


@register_kl(Gamma, Gamma)
def _(p, q):
    t1 = q.concentration * (jnp.log(p.rate) - jnp.log(q.rate))
    t2 = jsp.gammaln(q.concentration) - jsp.gammaln(p.concentration)
    t3 = (p.concentration - q.concentration) * jsp.digamma(p.concentration)
    t4 = (q.rate - p.rate) * (p.concentration / p.rate)
    return t1 + t2 + t3 + t4


@register_kl(Beta, Beta)
def _(p, q):
    def lnB(a, b):
        return jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b)
    a1, b1 = p.alpha, p.beta
    a2, b2 = q.alpha, q.beta
    s1 = a1 + b1
    return (
        lnB(a2, b2) - lnB(a1, b1)
        + (a1 - a2) * jsp.digamma(a1)
        + (b1 - b2) * jsp.digamma(b1)
        + (a2 - a1 + b2 - b1) * jsp.digamma(s1)
    )


@register_kl(Dirichlet, Dirichlet)
def _(p, q):
    a, b = p.concentration, q.concentration
    a0 = jnp.sum(a, axis=-1)
    lnB_a = jnp.sum(jsp.gammaln(a), axis=-1) - jsp.gammaln(a0)
    lnB_b = (jnp.sum(jsp.gammaln(b), axis=-1)
             - jsp.gammaln(jnp.sum(b, axis=-1)))
    return (
        lnB_b - lnB_a
        + jnp.sum((a - b) * (jsp.digamma(a)
                             - jsp.digamma(a0[..., None])), axis=-1)
    )


@register_kl(Exponential, Exponential)
def _(p, q):
    ratio = q.rate / p.rate
    return ratio - 1 - jnp.log(ratio)


@register_kl(Laplace, Laplace)
def _(p, q):
    sr = p.scale / q.scale
    ad = jnp.abs(p.loc - q.loc)
    return (-jnp.log(sr) + sr * jnp.exp(-ad / p.scale)
            + ad / q.scale - 1)


@register_kl(Uniform, Uniform)
def _(p, q):
    result = jnp.log((q.high - q.low) / (p.high - p.low))
    return jnp.where((q.low <= p.low) & (p.high <= q.high), result, jnp.inf)


@register_kl(Poisson, Poisson)
def _(p, q):
    return p.rate * (jnp.log(p.rate) - jnp.log(q.rate)) - (p.rate - q.rate)


@register_kl(Geometric, Geometric)
def _(p, q):
    # KL = (1-p)/p * (log(1-p) - log(1-q)) + log p - log q
    return ((1 - p.probs) / p.probs
            * (jnp.log1p(-p.probs) - jnp.log1p(-q.probs))
            + jnp.log(p.probs) - jnp.log(q.probs))


@register_kl(MultivariateNormal, MultivariateNormal)
def _(p, q):
    return _kl_gaussian(p.loc, p.scale_tril, q.loc, q.scale_tril)


@register_entropy(Kumaraswamy)
def _(d):
    a, b = jnp.broadcast_arrays(d.concentration1, d.concentration0)
    Hb = jsp.digamma(b + 1) + _EULER
    return (1 - 1 / b) + (1 - 1 / a) * Hb - jnp.log(a) - jnp.log(b)


@register_entropy(InverseGamma)
def _(d):
    a = d.concentration
    return (a + jnp.log(d.rate) + jsp.gammaln(a)
            - (1 + a) * jsp.digamma(a))


@register_entropy(ContinuousBernoulli)
def _(d):
    lp0 = jnp.log1p(-d.probs)
    lp1 = jnp.log(d.probs)
    return d.mean * (lp0 - lp1) - d._log_norm() - lp0


@register_entropy(LowRankMultivariateNormal)
def _(d):
    # logdet via the matrix determinant lemma: log|WW^T + D| =
    # log|I + W^T D^-1 W| + sum log D
    L = d._capacitance_tril()
    log_det = 2 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
    ) + jnp.sum(jnp.log(d.cov_diag), axis=-1)
    D = d.event_shape[0]
    H = 0.5 * (D * (1.0 + _LOG_2PI) + log_det)
    return jnp.broadcast_to(H, d.batch_shape)


def _mvdigamma(x, p):
    i = jnp.arange(p, dtype=x.dtype if hasattr(x, "dtype") else None)
    return jnp.sum(jsp.digamma(jnp.asarray(x)[..., None] - i / 2), axis=-1)


@register_entropy(Wishart)
def _(d):
    nu = jnp.asarray(d.df)
    p = d.scale_tril.shape[-1]
    half_logdet = jnp.sum(
        jnp.log(jnp.diagonal(d.scale_tril, axis1=-2, axis2=-1)), axis=-1)
    return (
        (p + 1) * (p * math.log(2.0) / 2 + half_logdet)
        + jsp.multigammaln(nu / 2, p)
        - (nu - p - 1) / 2 * _mvdigamma(nu / 2, p)
        + nu * p / 2
    )


@register_kl(Cauchy, Cauchy)
def _(p, q):
    # Chyzak & Nielsen (2019), f-divergences between Cauchy distributions
    t1 = jnp.log((p.scale + q.scale) ** 2 + (p.loc - q.loc) ** 2)
    return t1 - jnp.log(4 * p.scale * q.scale)


@register_kl(Gumbel, Gumbel)
def _(p, q):
    c = p.scale / q.scale
    a = q.loc / q.scale
    b = p.loc / q.scale
    return (
        -jnp.log(c) - a + b
        + c * _EULER
        + jnp.exp(a + jsp.gammaln(1 + c) - b)
        - (1 + _EULER)
    )


@register_kl(HalfNormal, HalfNormal)
def _(p, q):
    # the folded normals share the 2x mass factor, so the KL is the
    # underlying zero-mean normals'
    sp, sq = jnp.broadcast_arrays(p.scale, q.scale)
    return jnp.log(sq / sp) + sp**2 / (2 * sq**2) - 0.5


@register_kl(Pareto, Pareto)
def _(p, q):
    t = q.alpha * jnp.log(p.scale / q.scale) + jnp.log(p.alpha / q.alpha)
    result = t + q.alpha / p.alpha - 1
    return jnp.where(p.scale < q.scale, jnp.inf, result)


@register_kl(Binomial, Binomial)
def _(p, q):
    np_, nq = jnp.asarray(p.total_count), jnp.asarray(q.total_count)
    # torch raises for q.total_count > p.total_count; only decidable for
    # concrete counts — under jit the row emits NaN instead (loud, and
    # the count is nearly always a static int anyway)
    if not (isinstance(np_, jax.core.Tracer) or isinstance(nq, jax.core.Tracer)):
        if bool(jnp.any(np_ < nq)):
            raise NotImplementedError(
                "KL between Binomials where q.total_count > p.total_count "
                "is not implemented"
            )
    pl = jnp.log(p.probs) - jnp.log1p(-p.probs)
    ql = jnp.log(q.probs) - jnp.log1p(-q.probs)
    kl = p.total_count * (
        p.probs * (pl - ql) + jnp.log1p(-p.probs) - jnp.log1p(-q.probs)
    )
    return jnp.where(np_ < nq, jnp.nan, jnp.where(np_ > nq, jnp.inf, kl))


@register_kl(ContinuousBernoulli, ContinuousBernoulli)
def _(p, q):
    return (
        p.mean * (p.logits - q.logits)
        + p._log_norm() + jnp.log1p(-p.probs)
        - q._log_norm() - jnp.log1p(-q.probs)
    )


def _lowrank_loc_tril(d):
    # materialize W W^T + diag(v) (exact; trades the O(D k^2) Woodbury
    # path for the already-registered MVN closed form)
    cov = d.cov_factor @ jnp.swapaxes(d.cov_factor, -1, -2)
    eye = jnp.eye(cov.shape[-1], dtype=cov.dtype)
    cov = cov + eye * d.cov_diag[..., None, :]
    return d.loc, jnp.linalg.cholesky(cov)


def _kl_gaussian(loc_p, Lp, loc_q, Lq):
    D = Lp.shape[-1]
    half_p = jnp.sum(jnp.log(jnp.diagonal(Lp, axis1=-2, axis2=-1)), axis=-1)
    half_q = jnp.sum(jnp.log(jnp.diagonal(Lq, axis1=-2, axis2=-1)), axis=-1)
    M = jax.scipy.linalg.solve_triangular(
        jnp.broadcast_to(Lq, Lp.shape), Lp, lower=True)
    trace = jnp.sum(M * M, axis=(-2, -1))
    diff = loc_p - loc_q
    y = jax.scipy.linalg.solve_triangular(
        jnp.broadcast_to(Lq, diff.shape[:-1] + Lq.shape[-2:]),
        diff[..., None], lower=True)[..., 0]
    maha = jnp.sum(y * y, axis=-1)
    return half_q - half_p + 0.5 * (trace + maha - D)


@register_kl(LowRankMultivariateNormal, LowRankMultivariateNormal)
def _(p, q):
    return _kl_gaussian(*_lowrank_loc_tril(p), *_lowrank_loc_tril(q))


@register_kl(LowRankMultivariateNormal, MultivariateNormal)
def _(p, q):
    return _kl_gaussian(*_lowrank_loc_tril(p), q.loc, q.scale_tril)


@register_kl(MultivariateNormal, LowRankMultivariateNormal)
def _(p, q):
    return _kl_gaussian(p.loc, p.scale_tril, *_lowrank_loc_tril(q))


@register_kl(NormalizingFlow, NormalizingFlow)
def _(p, q):
    # torch's (TransformedDistribution, TransformedDistribution) contract:
    # identical transforms cancel inside the integral, leaving the base KL.
    # "Identical" = same pytree structure and equal leaves. Under jit the
    # leaves are tracers whose values cannot be compared — there, object
    # identity (the two flows literally sharing the transform's arrays,
    # the partition/combine pattern) decides; distinct tracers raise.
    def leaf_eq(a, b):
        if a is b:
            return True
        if isinstance(a, jax.core.Tracer) or isinstance(b, jax.core.Tracer):
            raise NotImplementedError(
                "flow-flow KL under jit requires the two flows to share "
                "their transform leaves (build both from the same params "
                "pytree); value comparison is not possible while tracing"
            )
        return jnp.shape(a) == jnp.shape(b) and bool(jnp.all(a == b))

    pt = jax.tree_util.tree_flatten(p.transform)
    qt = jax.tree_util.tree_flatten(q.transform)
    if pt[1] != qt[1] or not all(
        leaf_eq(a, b) for a, b in zip(pt[0], qt[0])
    ):
        raise NotImplementedError(
            "KL between flows with differing transforms is not implemented"
        )
    return kl_divergence(p.base, q.base)


# torch-namespace functional surface: the constraints module and the
# constraint -> transform registries (torch.distributions re-exports
# biject_to / transform_to / identity_transform in its __all__).
from . import constraints  # noqa: E402,F401
from .constraints import biject_to, transform_to  # noqa: E402,F401
from .transforms import identity_transform  # noqa: E402,F401

__all__ = __all__ + ["constraints", "biject_to", "transform_to",
                     "identity_transform"]


# ------------------------------------------------ support / variance
# ``d.support`` (a constraint — enables the canonical torch VI pattern
# ``biject_to(d.support)``) and ``d.variance``/``d.stddev``, registry-
# dispatched like entropy above. Support objects mirror torch's exactly
# (GreaterThanEq vs GreaterThan distinctions included).

_SUPPORT_REGISTRY: dict = {}
_VARIANCE_REGISTRY: dict = {}


def register_support(cls):
    def decorator(fn):
        _SUPPORT_REGISTRY[cls] = fn
        return fn
    return decorator


def register_variance(cls):
    def decorator(fn):
        _VARIANCE_REGISTRY[cls] = fn
        return fn
    return decorator


def _registry_prop(registry, what):
    def prop(self):
        for cls in type(self).__mro__:
            fn = registry.get(cls)
            if fn is not None:
                return fn(self)
        raise NotImplementedError(
            f"{what} is not implemented for {type(self).__name__}"
        )
    return property(prop)


Distribution.support = _registry_prop(_SUPPORT_REGISTRY, "support")
Distribution.variance = _registry_prop(_VARIANCE_REGISTRY, "variance")
Distribution.stddev = property(lambda self: jnp.sqrt(self.variance))

from . import constraints as _C  # noqa: E402

for _cls in (Normal, Cauchy, StudentT, Laplace, Gumbel, GeneralizedNormal):
    register_support(_cls)(lambda d: _C.real)
for _cls in (Gamma, Exponential, HalfNormal, HalfCauchy):
    register_support(_cls)(lambda d: _C.greater_than_eq(0.0))
for _cls in (LogNormal, Weibull, FisherSnedecor, InverseGamma):
    register_support(_cls)(lambda d: _C.greater_than(0.0))
for _cls in (Beta, Kumaraswamy, ContinuousBernoulli, RelaxedBernoulli):
    register_support(_cls)(lambda d: _C.unit_interval)
register_support(Uniform)(lambda d: _C.interval(d.low, d.high))
register_support(Pareto)(lambda d: _C.greater_than_eq(d.scale))
for _cls in (Poisson, Geometric, NegativeBinomial):
    register_support(_cls)(lambda d: _C.nonnegative_integer)
register_support(Binomial)(
    lambda d: _C.integer_interval(0, d.total_count))
register_support(Bernoulli)(lambda d: _C.boolean)
register_support(Categorical)(
    lambda d: _C.integer_interval(0, d.logits.shape[-1] - 1))
for _cls in (Dirichlet, LogisticNormal, RelaxedOneHotCategorical):
    register_support(_cls)(lambda d: _C.simplex)
register_support(OneHotCategorical)(lambda d: _C.one_hot)
for _cls in (MultivariateNormal, LowRankMultivariateNormal, NormalizingFlow):
    register_support(_cls)(lambda d: _C.real_vector)
register_support(Wishart)(lambda d: _C.positive_definite)
register_support(LKJCholesky)(lambda d: _C.corr_cholesky)
register_support(Independent)(
    lambda d: _C.independent(d.base.support, d.ndims))


@register_variance(Normal)
def _(d):
    return jnp.broadcast_to(d.scale**2, d.batch_shape)


@register_variance(Uniform)
def _(d):
    return jnp.broadcast_to((d.high - d.low) ** 2 / 12, d.batch_shape)


@register_variance(Laplace)
def _(d):
    return jnp.broadcast_to(2 * d.scale**2, d.batch_shape)


@register_variance(Exponential)
def _(d):
    return 1 / d.rate**2


@register_variance(Gamma)
def _(d):
    return d.concentration / d.rate**2


@register_variance(Beta)
def _(d):
    a, b = d.alpha, d.beta
    return a * b / ((a + b) ** 2 * (a + b + 1))


@register_variance(Poisson)
def _(d):
    return d.rate


@register_variance(Bernoulli)
def _(d):
    p = jnp.broadcast_to(d.probs, d.batch_shape)
    return p * (1 - p)


@register_variance(Binomial)
def _(d):
    return d.total_count * d.probs * (1 - d.probs)


@register_variance(Geometric)
def _(d):
    return (1 - d.probs) / d.probs**2


@register_variance(NegativeBinomial)
def _(d):
    return d.total_count * d.probs / (1 - d.probs) ** 2


@register_variance(StudentT)
def _(d):
    v = jnp.broadcast_to(d.df, d.batch_shape)
    s = jnp.broadcast_to(d.scale, d.batch_shape)
    out = s**2 * v / (v - 2)
    return jnp.where(v > 2, out, jnp.where(v > 1, jnp.inf, jnp.nan))


@register_variance(Gumbel)
def _(d):
    return jnp.broadcast_to(
        (math.pi**2 / 6) * d.scale**2, d.batch_shape)


@register_variance(Weibull)
def _(d):
    lam, k = jnp.broadcast_arrays(d.scale, d.concentration)
    g1 = jnp.exp(jsp.gammaln(1 + 1 / k))
    g2 = jnp.exp(jsp.gammaln(1 + 2 / k))
    return lam**2 * (g2 - g1**2)


@register_variance(LogNormal)
def _(d):
    s2 = jnp.broadcast_to(d.scale**2, d.batch_shape)
    mu = jnp.broadcast_to(d.loc, d.batch_shape)
    return jnp.expm1(s2) * jnp.exp(2 * mu + s2)


@register_variance(Pareto)
def _(d):
    s, a = jnp.broadcast_arrays(d.scale, d.alpha)
    out = s**2 * a / ((a - 1) ** 2 * (a - 2))
    return jnp.where(a > 2, out, jnp.inf)


@register_variance(HalfNormal)
def _(d):
    return d.scale**2 * (1 - 2 / math.pi)


@register_variance(Dirichlet)
def _(d):
    a = d.concentration
    a0 = jnp.sum(a, axis=-1, keepdims=True)
    return a * (a0 - a) / (a0**2 * (a0 + 1))


@register_variance(MultivariateNormal)
def _(d):
    cov_diag = jnp.sum(d.scale_tril**2, axis=-1)
    return jnp.broadcast_to(cov_diag, d.batch_shape + d.event_shape)


@register_variance(Independent)
def _(d):
    return d.base.variance


@register_variance(Multinomial)
def _(d):
    p = d.probs
    return d.total_count * p * (1 - p)


@register_variance(InverseGamma)
def _(d):
    a = d.concentration
    result = d.rate**2 / ((a - 1) ** 2 * (a - 2))
    return jnp.where(a > 2, result, jnp.inf)


def _kumaraswamy_moment(a, b, n):
    # E[X^n] = b * B(1 + n/a, b)
    return b * jnp.exp(
        jsp.gammaln(1 + n / a) + jsp.gammaln(b) - jsp.gammaln(1 + n / a + b)
    )


@register_variance(Kumaraswamy)
def _(d):
    a, b = jnp.broadcast_arrays(d.concentration1, d.concentration0)
    m1 = _kumaraswamy_moment(a, b, 1)
    return _kumaraswamy_moment(a, b, 2) - m1**2


@register_variance(ContinuousBernoulli)
def _(d):
    p = d.probs
    half = d._half
    safe = jnp.where(jnp.abs(p - 0.5) < half, 0.4, p)
    v = safe * (safe - 1) / (1 - 2 * safe) ** 2 + 1 / (
        jnp.log1p(-safe) - jnp.log(safe)
    ) ** 2
    x = (p - 0.5) ** 2
    taylor = 1 / 12 - (1 / 15 - 128 / 945 * x) * x
    return jnp.where(jnp.abs(p - 0.5) < half, taylor, v)


@register_variance(FisherSnedecor)
def _(d):
    d1, d2 = jnp.broadcast_arrays(d.df1, d.df2)
    safe = jnp.where(d2 > 4, d2, jnp.nan)
    return (2 * safe**2 * (d1 + safe - 2)
            / (d1 * (safe - 2) ** 2 * (safe - 4)))


@register_variance(GeneralizedPareto)
def _(d):
    xi = d.concentration
    safe = jnp.where(xi < 0.5, xi, 0.25)
    result = d.scale**2 / ((1 - safe) ** 2 * (1 - 2 * safe))
    return jnp.where(xi < 0.5, result, jnp.nan)


@register_variance(OneHotCategorical)
def _(d):
    p = d.probs
    return p * (1 - p)


@register_variance(Wishart)
def _(d):
    V = d.scale_tril @ jnp.swapaxes(d.scale_tril, -1, -2)
    diag_V = jnp.diagonal(V, axis1=-2, axis2=-1)
    df = jnp.asarray(d.df)[..., None, None]
    return df * (V**2 + diag_V[..., :, None] * diag_V[..., None, :])


@register_variance(LowRankMultivariateNormal)
def _(d):
    v = jnp.sum(d.cov_factor**2, axis=-1) + d.cov_diag
    return jnp.broadcast_to(v, d.batch_shape + d.event_shape)


@register_variance(VonMises)
def _(d):
    # circular variance 1 - I1(k)/I0(k) (torch convention)
    k = jnp.broadcast_to(d.concentration, d.batch_shape)
    return 1 - jsp.i1e(k) / jsp.i0e(k)


@register_variance(MixtureSameFamily)
def _(d):
    # law of total variance over the component axis
    w = jax.nn.softmax(d.mixture_distribution.logits, axis=-1)
    k = len(d.event_shape)
    w = w.reshape(w.shape + (1,) * k)
    axis = -1 - k
    mean_cond_var = jnp.sum(w * d.component_distribution.variance, axis=axis)
    mu = jnp.expand_dims(d.mean, axis)
    var_cond_mean = jnp.sum(
        w * (d.component_distribution.mean - mu) ** 2, axis=axis)
    return mean_cond_var + var_cond_mean


# mean completions (class properties, torch NaN conventions)
StudentT.mean = property(
    lambda d: jnp.where(
        jnp.asarray(d.df) > 1,
        jnp.broadcast_to(d.loc, d.batch_shape), jnp.nan))
Kumaraswamy.mean = property(
    lambda d: _kumaraswamy_moment(
        *jnp.broadcast_arrays(d.concentration1, d.concentration0), 1))
GeneralizedPareto.mean = property(
    lambda d: jnp.where(
        d.concentration < 1,
        d.loc + d.scale / (1 - jnp.where(
            d.concentration < 1, d.concentration, 0.5)),
        jnp.nan))


# ------------------------------------------------ mode / perplexity / enumeration
# The remaining ``torch.distributions.Distribution`` surface (reference
# reach: zuko/distributions.py:23 wildcard): ``d.mode`` (registry-
# dispatched, torch's conventions — including clamps and NaN sentinels),
# ``d.perplexity()`` = exp(entropy), and ``d.enumerate_support(expand=)``
# for the discrete families (+ ``has_enumerate_support`` flags).

_MODE_REGISTRY: dict = {}


def register_mode(cls):
    def decorator(fn):
        _MODE_REGISTRY[cls] = fn
        return fn
    return decorator


Distribution.mode = _registry_prop(_MODE_REGISTRY, "mode")
Distribution.perplexity = lambda self: jnp.exp(self.entropy())
Distribution.has_enumerate_support = False


def _no_enumerate(self, expand: bool = True):
    raise NotImplementedError(
        f"enumerate_support is not implemented for {type(self).__name__}"
    )


Distribution.enumerate_support = _no_enumerate


def _nanlike(x):
    return jnp.full_like(x, jnp.nan)


for _cls in (Cauchy, StudentT, Laplace, Gumbel, VonMises):
    register_mode(_cls)(
        lambda d: jnp.broadcast_to(d.loc, d.batch_shape))
register_mode(GeneralizedNormal)(
    lambda d: jnp.zeros(d.batch_shape))
register_mode(Uniform)(
    lambda d: _nanlike(jnp.broadcast_to(d.low, d.batch_shape)))
for _cls in (Exponential, HalfNormal, HalfCauchy, Geometric):
    register_mode(_cls)(
        lambda d: jnp.zeros(d.batch_shape))
register_mode(Gamma)(
    lambda d: jnp.clip((d.concentration - 1) / d.rate, 0.0, None))
register_mode(LogNormal)(lambda d: jnp.exp(d.loc - d.scale**2))
register_mode(Weibull)(
    lambda d: jnp.where(
        d.concentration > 1,
        d.scale
        * ((d.concentration - 1) / d.concentration) ** (1 / d.concentration),
        jnp.zeros_like(d.scale),
    )
)
register_mode(Pareto)(
    lambda d: jnp.broadcast_to(d.scale, d.batch_shape))
register_mode(Poisson)(lambda d: jnp.floor(d.rate))
register_mode(InverseGamma)(lambda d: d.rate / (d.concentration + 1))


@register_mode(Bernoulli)
def _(d):
    p = d.probs
    return jnp.where(p == 0.5, jnp.nan, (p >= 0.5).astype(p.dtype))


@register_mode(Binomial)
def _(d):
    return jnp.clip(
        jnp.floor((d.total_count + 1) * d.probs), None, d.total_count
    )


@register_mode(NegativeBinomial)
def _(d):
    return jnp.clip(
        jnp.floor((d.total_count - 1) * d.probs / (1 - d.probs)), 0.0, None
    )


@register_mode(Categorical)
def _(d):
    return jnp.argmax(d.logits, axis=-1)


@register_mode(OneHotCategorical)
def _(d):
    idx = jnp.argmax(d.logits_, axis=-1)
    return jax.nn.one_hot(idx, d.logits_.shape[-1], dtype=d.logits_.dtype)


@register_mode(Beta)
def _(d):
    # torch routes Beta.mode through Dirichlet([c1, c0]).mode: clamped
    # (c-1) weights, and an all-concentrations-<1 batch entry collapses
    # to the one-hot argmax (== 1.0 at index 0 for nan rows, torch's
    # observed convention).
    a, b = jnp.broadcast_arrays(d.alpha, d.beta)
    cm1a = jnp.clip(a - 1, 0.0, None)
    cm1b = jnp.clip(b - 1, 0.0, None)
    m = cm1a / (cm1a + cm1b)
    return jnp.where((a < 1) & (b < 1), 1.0, m)


@register_mode(Dirichlet)
def _(d):
    cm1 = jnp.clip(d.concentration - 1, 0.0, None)
    m = cm1 / jnp.sum(cm1, axis=-1, keepdims=True)
    all_lt1 = jnp.all(d.concentration < 1, axis=-1, keepdims=True)
    fallback = jax.nn.one_hot(
        jnp.argmax(m, axis=-1), m.shape[-1], dtype=m.dtype
    )
    return jnp.where(all_lt1, fallback, m)


@register_mode(Kumaraswamy)
def _(d):
    # Analytic mode ((a-1)/(ab-1))^(1/a), NaN outside a>1, b>1. (torch
    # 2.x's log-space expression NaNs for any concentration0 > 1 —
    # log1p(-c0) — so exact-torch pinning is skipped for this family.)
    a, b = jnp.broadcast_arrays(d.concentration1, d.concentration0)
    m = ((a - 1) / (a * b - 1)) ** (1 / a)
    return jnp.where((a > 1) & (b > 1), m, jnp.nan)


@register_mode(FisherSnedecor)
def _(d):
    d1, d2 = jnp.broadcast_arrays(d.df1, d.df2)
    m = (d1 - 2) / d1 * d2 / (d2 + 2)
    return jnp.where(d1 > 2, m, jnp.nan)


@register_mode(MultivariateNormal)
def _(d):
    return jnp.broadcast_to(d.loc, d.batch_shape + d.event_shape)


@register_mode(LowRankMultivariateNormal)
def _(d):
    return jnp.broadcast_to(d.loc, d.batch_shape + d.event_shape)


@register_mode(Wishart)
def _(d):
    p = d.scale_tril.shape[-1]
    cov = d.scale_tril @ jnp.swapaxes(d.scale_tril, -1, -2)
    factor = d.df - p - 1
    factor = jnp.where(factor <= 0, jnp.nan, factor)
    return factor[..., None, None] * cov


@register_mode(Independent)
def _(d):
    return d.base.mode


def _arange_support(n, batch_shape, dtype, expand):
    values = jnp.arange(n, dtype=dtype)
    values = values.reshape((-1,) + (1,) * len(batch_shape))
    if expand:
        values = jnp.broadcast_to(values, (n,) + tuple(batch_shape))
    return values


def _bernoulli_enumerate(self, expand: bool = True):
    return _arange_support(
        2, self.batch_shape, self.probs.dtype, expand)


def _categorical_enumerate(self, expand: bool = True):
    return _arange_support(
        self.num_categories, self.batch_shape, jnp.int32, expand)


def _binomial_enumerate(self, expand: bool = True):
    tc = np.asarray(jax.device_get(self.total_count)).reshape(-1)
    if tc.size > 1 and tc.min() != tc.max():
        # torch's contract: homogeneous counts enumerate, mixed raise
        raise NotImplementedError(
            "Inhomogeneous total count not supported by enumerate_support."
        )
    n = int(tc[0])
    return _arange_support(n + 1, self.batch_shape, self.probs.dtype, expand)


def _onehot_enumerate(self, expand: bool = True):
    n = self.logits_.shape[-1]
    values = jnp.eye(n, dtype=self.logits_.dtype)
    values = values.reshape((n,) + (1,) * len(self.batch_shape) + (n,))
    if expand:
        values = jnp.broadcast_to(
            values, (n,) + tuple(self.batch_shape) + (n,))
    return values


for _cls, _fn in (
    (Bernoulli, _bernoulli_enumerate),
    (Categorical, _categorical_enumerate),
    (Binomial, _binomial_enumerate),
    (OneHotCategorical, _onehot_enumerate),
):
    _cls.enumerate_support = _fn
    _cls.has_enumerate_support = True


# torch ctor compatibility: every torch distribution constructor accepts
# ``validate_args=`` (argument validation cannot raise on traced arrays
# under jit, so it is accepted and ignored — the documented no-op).
from .transforms import _accept_noise_kwargs as _noise  # noqa: E402

for _obj in list(globals().values()):
    if isinstance(_obj, type) and issubclass(_obj, Distribution):
        _noise(_obj, ("validate_args",))
del _obj
