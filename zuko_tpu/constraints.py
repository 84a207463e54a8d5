r"""Constraint objects and the ``biject_to`` / ``transform_to`` registries
(torch-namespace parity: ``torch.distributions.constraints`` and
``torch.distributions.transform_to``/``biject_to``, which the reference
exposes through its wildcard re-export, zuko/distributions.py:23).

Constraints here are lightweight value-domain descriptors: each supports
``check(x) -> bool array`` and equality, and the two registries map them to
:mod:`zuko_tpu.transforms` bijections. ``biject_to(c)`` returns a true
bijection onto the constrained set (used e.g. to parameterize variational
families over positive scales or the simplex); ``transform_to(c)`` may
return a cheaper non-injective surjection (torch semantics — e.g.
``SoftmaxTransform`` for the simplex instead of stick-breaking).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "Constraint",
    "biject_to",
    "transform_to",
    "boolean",
    "real",
    "real_vector",
    "positive",
    "nonnegative",
    "unit_interval",
    "simplex",
    "interval",
    "half_open_interval",
    "greater_than",
    "greater_than_eq",
    "less_than",
    "lower_cholesky",
    "corr_cholesky",
    "positive_definite",
    "independent",
    "is_dependent",
    "dependent",
]


class Constraint:
    r"""Base constraint: a value-domain descriptor with an ``event_dim``
    (number of rightmost dims that make one constrained value) and a
    ``check``."""

    event_dim: int = 0
    is_discrete: bool = False

    def check(self, x) -> jnp.ndarray:
        raise NotImplementedError

    def __repr__(self) -> str:
        return type(self).__name__

    def __eq__(self, other) -> bool:
        return type(self) is type(other)

    def __hash__(self) -> int:
        return hash(type(self))


class _Dependent(Constraint):
    def check(self, x):
        raise ValueError("cannot determine validity of a dependent constraint")


dependent = _Dependent()


def is_dependent(c) -> bool:
    return isinstance(c, _Dependent)


class _Boolean(Constraint):
    is_discrete = True

    def check(self, x):
        return (x == 0) | (x == 1)


class _Real(Constraint):
    def check(self, x):
        return x == x  # not NaN


class _Positive(Constraint):
    def check(self, x):
        return x > 0


class _Nonnegative(Constraint):
    def check(self, x):
        return x >= 0


class _GreaterThan(Constraint):
    def __init__(self, lower_bound):
        self.lower_bound = lower_bound

    def check(self, x):
        return x > self.lower_bound

    def __repr__(self):
        return f"GreaterThan(lower_bound={self.lower_bound})"

    def __eq__(self, other):
        return (type(self) is type(other)
                and bool(jnp.all(jnp.asarray(self.lower_bound)
                                 == jnp.asarray(other.lower_bound))))

    def __hash__(self):
        return hash((type(self), str(self.lower_bound)))


class _GreaterThanEq(_GreaterThan):
    def check(self, x):
        return x >= self.lower_bound


class _LessThan(Constraint):
    def __init__(self, upper_bound):
        self.upper_bound = upper_bound

    def check(self, x):
        return x < self.upper_bound

    def __eq__(self, other):
        return (type(self) is type(other)
                and bool(jnp.all(jnp.asarray(self.upper_bound)
                                 == jnp.asarray(other.upper_bound))))

    def __hash__(self):
        return hash((type(self), str(self.upper_bound)))


class _Interval(Constraint):
    def __init__(self, lower_bound, upper_bound):
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound

    def check(self, x):
        return (x >= self.lower_bound) & (x <= self.upper_bound)

    def __repr__(self):
        return (f"Interval(lower_bound={self.lower_bound}, "
                f"upper_bound={self.upper_bound})")

    def __eq__(self, other):
        return (type(self) is type(other)
                and bool(jnp.all(jnp.asarray(self.lower_bound)
                                 == jnp.asarray(other.lower_bound)))
                and bool(jnp.all(jnp.asarray(self.upper_bound)
                                 == jnp.asarray(other.upper_bound))))

    def __hash__(self):
        return hash((type(self), str(self.lower_bound),
                     str(self.upper_bound)))


class _HalfOpenInterval(_Interval):
    def check(self, x):
        return (x >= self.lower_bound) & (x < self.upper_bound)


class _Simplex(Constraint):
    event_dim = 1

    def check(self, x):
        return jnp.all(x >= 0, axis=-1) & (
            jnp.abs(jnp.sum(x, axis=-1) - 1) < 1e-6
        )


class _RealVector(Constraint):
    event_dim = 1

    def check(self, x):
        return jnp.all(x == x, axis=-1)


class _LowerCholesky(Constraint):
    event_dim = 2

    def check(self, x):
        tril = jnp.all(
            jnp.abs(jnp.triu(x, 1)) < 1e-6, axis=(-2, -1)
        )
        return tril & jnp.all(
            jnp.diagonal(x, axis1=-2, axis2=-1) > 0, axis=-1
        )


class _CorrCholesky(_LowerCholesky):
    def check(self, x):
        unit = jnp.all(
            jnp.abs(jnp.sum(x * x, axis=-1) - 1) < 1e-5, axis=-1
        )
        return super().check(x) & unit


class _PositiveDefinite(Constraint):
    event_dim = 2

    def check(self, x):
        return jnp.all(jnp.linalg.eigvalsh(x) > 0, axis=-1)


class _Independent(Constraint):
    r"""Reinterpret ``ndims`` rightmost dims of ``base`` as event dims."""

    def __init__(self, base: Constraint, ndims: int):
        self.base = base
        self.ndims = int(ndims)

    @property
    def event_dim(self) -> int:
        return self.base.event_dim + self.ndims

    def check(self, x):
        ok = self.base.check(x)
        for _ in range(self.ndims):
            ok = jnp.all(ok, axis=-1)
        return ok

    def __eq__(self, other):
        return (type(self) is type(other) and self.base == other.base
                and self.ndims == other.ndims)

    def __hash__(self):
        return hash((type(self), self.base, self.ndims))


boolean = _Boolean()
real = _Real()
real_vector = _RealVector()
positive = _Positive()
nonnegative = _Nonnegative()
unit_interval = _Interval(0.0, 1.0)
simplex = _Simplex()
lower_cholesky = _LowerCholesky()
corr_cholesky = _CorrCholesky()
positive_definite = _PositiveDefinite()
greater_than = _GreaterThan
greater_than_eq = _GreaterThanEq
less_than = _LessThan
interval = _Interval
half_open_interval = _HalfOpenInterval
independent = _Independent


class _TransformRegistry:
    r"""torch-style constraint -> transform registry (callable object with
    a ``register`` decorator). Lookup is by constraint TYPE; factory
    entries receive the constraint instance."""

    def __init__(self, name):
        self._name = name
        self._registry = {}

    def register(self, constraint, factory=None):
        if factory is None:
            return lambda f: self.register(constraint, f)
        key = constraint if isinstance(constraint, type) else type(constraint)
        self._registry[key] = factory
        return factory

    def __call__(self, constraint):
        factory = self._registry.get(type(constraint))
        if factory is None:
            raise NotImplementedError(
                f"no transform registered in {self._name} for {constraint}"
            )
        return factory(constraint)


biject_to = _TransformRegistry("biject_to")
transform_to = _TransformRegistry("transform_to")


def _register_defaults():
    from . import transforms as T

    identity = T.IdentityTransform()

    for reg in (biject_to, transform_to):
        reg.register(_Real, lambda c: identity)
        reg.register(_RealVector, lambda c: identity)
        reg.register(_Positive, lambda c: T.ExpTransform())
        reg.register(_Nonnegative, lambda c: T.ExpTransform())
        reg.register(_GreaterThan, lambda c: T.ComposedTransform(
            T.ExpTransform(), T.AffineTransform(c.lower_bound, 1.0)))
        reg.register(_GreaterThanEq, lambda c: T.ComposedTransform(
            T.ExpTransform(), T.AffineTransform(c.lower_bound, 1.0)))
        reg.register(_LessThan, lambda c: T.ComposedTransform(
            T.ExpTransform(), T.AffineTransform(c.upper_bound, -1.0)))
        reg.register(_Interval, lambda c: T.ComposedTransform(
            T.SigmoidTransform(),
            T.AffineTransform(c.lower_bound,
                              c.upper_bound - c.lower_bound)))
        reg.register(_HalfOpenInterval, lambda c: T.ComposedTransform(
            T.SigmoidTransform(),
            T.AffineTransform(c.lower_bound,
                              c.upper_bound - c.lower_bound)))
        reg.register(_CorrCholesky, lambda c: T.CorrCholeskyTransform())
        reg.register(_Independent, lambda c: T.IndependentTransform(
            reg(c.base), c.ndims))

    # torch semantics: biject_to(simplex) is the stick-breaking bijection,
    # transform_to(simplex) the cheaper softmax surjection; the cholesky
    # factories are surjective parameterizations (transform_to only).
    biject_to.register(_Simplex, lambda c: T.StickBreakingTransform())
    transform_to.register(_Simplex, lambda c: T.SoftmaxTransform())
    transform_to.register(_LowerCholesky, lambda c: T.LowerCholeskyTransform())
    transform_to.register(_PositiveDefinite,
                          lambda c: T.PositiveDefiniteTransform())
    biject_to.register(_LowerCholesky, lambda c: T.LowerCholeskyTransform())


_register_defaults()


class _IntegerGreaterThan(Constraint):
    is_discrete = True

    def __init__(self, lower_bound):
        self.lower_bound = lower_bound

    def check(self, x):
        return (x >= self.lower_bound) & (x == jnp.floor(x))

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.lower_bound == other.lower_bound)

    def __hash__(self):
        return hash((type(self), self.lower_bound))


class _IntegerInterval(Constraint):
    is_discrete = True

    def __init__(self, lower_bound, upper_bound):
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound

    def check(self, x):
        return ((x >= self.lower_bound) & (x <= self.upper_bound)
                & (x == jnp.floor(x)))

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.lower_bound == other.lower_bound
                and bool(jnp.all(jnp.asarray(self.upper_bound)
                                 == jnp.asarray(other.upper_bound))))

    def __hash__(self):
        return hash((type(self), self.lower_bound, str(self.upper_bound)))


class _OneHot(Constraint):
    is_discrete = True
    event_dim = 1

    def check(self, x):
        return jnp.all((x == 0) | (x == 1), axis=-1) & (
            jnp.sum(x, axis=-1) == 1
        )


integer_interval = _IntegerInterval
nonnegative_integer = _IntegerGreaterThan(0)
positive_integer = _IntegerGreaterThan(1)
one_hot = _OneHot()

__all__ += ["integer_interval", "nonnegative_integer", "positive_integer",
            "one_hot"]
