r"""Lazy distributions and transformations — the conditional DSL.

Capability parity with the reference's ``zuko/lazy.py`` (335 LoC). The key
architectural idea preserved from the reference (zuko/lazy.py:29-49): a flow is
a parameter-holding module whose ``__call__(c)`` *builds and returns* a fresh
:class:`~zuko_tpu.distributions.Distribution` bound to the context ``c``. In
JAX, "building" under ``jit`` is free — it happens at trace time — so the lazy
layer costs nothing at runtime.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from typing import Callable, Sequence, Union

from .core import Module
from .distributions import Distribution, NormalizingFlow
from .transforms import ComposedTransform, Transform

__all__ = [
    "Flow",
    "LazyComposedTransform",
    "LazyDistribution",
    "LazyInverse",
    "LazyTransform",
    "Unconditional",
    "UnconditionalDistribution",
    "UnconditionalTransform",
]


def _accepts_key(fn) -> bool:
    import inspect

    try:
        return "key" in inspect.signature(fn).parameters
    except (TypeError, ValueError):  # pragma: no cover
        return False


class LazyDistribution(Module):
    r"""Abstract module whose forward pass returns a distribution
    (reference: zuko/lazy.py:29-49).

    An optional PRNG ``key`` is threaded down to stochastic builders — e.g.
    the Hutchinson trace estimator of :class:`zuko_tpu.flows.FFJTransform`
    (reference exposes it as a first-class option,
    zuko/transforms.py:1154,1171-1179): ``flow(c, key=k).log_prob(x)``.
    """

    def __call__(self, c: jax.Array = None, key: jax.Array = None) -> Distribution:
        if key is not None and _accepts_key(self.forward):
            return self.forward(c, key=key)
        return self.forward(c)

    def forward(self, c: jax.Array = None) -> Distribution:
        raise NotImplementedError


class LazyTransform(Module):
    r"""Abstract module whose forward pass returns a transformation
    (reference: zuko/lazy.py:52-78). An optional PRNG ``key`` is forwarded to
    builders whose ``forward`` accepts one (see :class:`LazyDistribution`)."""

    def __call__(self, c: jax.Array = None, key: jax.Array = None) -> Transform:
        if key is not None and _accepts_key(self.forward):
            return self.forward(c, key=key)
        return self.forward(c)

    def forward(self, c: jax.Array = None) -> Transform:
        raise NotImplementedError

    @property
    def inv(self) -> "LazyTransform":
        return LazyInverse(self)


class LazyInverse(LazyTransform):
    r"""Lazy inverse: ``forward(c) = base(c).inv``
    (reference: zuko/lazy.py:81-98). Used to flip a flow for reverse-KL
    sampling efficiency — see ``Flow(flow.transform.inv, flow.base)``."""

    def __init__(self, transform: LazyTransform):
        self.transform = transform

    def forward(self, c: jax.Array = None, key: jax.Array = None) -> Transform:
        return self.transform(c, key=key).inv

    @property
    def inv(self) -> LazyTransform:
        return self.transform


class LazyComposedTransform(LazyTransform):
    r"""Sequence of lazy transformations composed at call time
    (reference: zuko/lazy.py:101-128). A PRNG ``key``, if given, is split and
    forwarded to every stage that accepts one."""

    def __init__(self, *transforms: LazyTransform):
        self.transforms = list(transforms)

    def forward(self, c: jax.Array = None, key: jax.Array = None) -> Transform:
        if key is None:
            return ComposedTransform(*(t(c) for t in self.transforms))
        keys = jax.random.split(key, len(self.transforms))
        return ComposedTransform(
            *(t(c, key=k) for t, k in zip(self.transforms, keys))
        )


class Flow(LazyDistribution):
    r"""Lazy normalizing flow: ``forward(c)`` returns
    ``NormalizingFlow(transform(c), base(c).expand(c.shape[:-1]))`` — the
    context batch shape propagates via ``expand``
    (reference: zuko/lazy.py:131-172).

    Arguments:
        transform: a lazy transformation or sequence thereof.
        base: a lazy distribution.
    """

    def __init__(
        self,
        transform: Union[LazyTransform, Sequence[LazyTransform]],
        base: LazyDistribution,
    ):
        if isinstance(transform, (list, tuple)):
            transform = LazyComposedTransform(*transform)
        self.transform = transform
        self.base = base

    def forward(self, c: jax.Array = None, key: jax.Array = None) -> NormalizingFlow:
        transform = self.transform(c, key=key)
        if c is None:
            base = self.base(c)
        else:
            base = self.base(c).expand(c.shape[:-1])

        # Fused fast path: on TPU (or when forced), flows whose structure the
        # whole-flow Pallas kernels can represent return a distribution that
        # routes log_prob/sample through them — same results, kernel speed
        # (the reference's fused protocol is likewise the default API,
        # zuko/transforms.py:46-56). Everything else silently keeps XLA.
        from .ops.dispatch import fused_dispatch_enabled, maybe_fused_flow

        if fused_dispatch_enabled():
            fused = maybe_fused_flow(self, transform, base, c)
            if fused is not None:
                return fused
        flow = NormalizingFlow(transform, base)
        if c is not None:
            # conditional big-batch guard: the chunk machinery can rebuild
            # the transform per (x, c) row-chunk (distributions.py
            # _rebuilt_chunked) — a context captured inside the built
            # transform cannot be chunked from outside
            flow._rebuild = (self, jnp.asarray(c), key)
        return flow


def Unconditional(f: Callable, *args, **kwargs):
    r"""Deprecated predecessor of :class:`UnconditionalDistribution` /
    :class:`UnconditionalTransform` (reference: zuko/lazy.py:175-239, which
    warns identically). Dispatches on the return type of ``f``."""
    import warnings

    warnings.warn(
        "'Unconditional' is deprecated; use 'UnconditionalDistribution' or"
        " 'UnconditionalTransform' instead.",
        DeprecationWarning,
        stacklevel=2,
    )

    probe = f(*args, **{k: v for k, v in kwargs.items() if k != "buffer"})
    if isinstance(probe, Distribution):
        return UnconditionalDistribution(f, *args, **kwargs)
    return UnconditionalTransform(f, *args, **kwargs)


class UnconditionalDistribution(LazyDistribution):
    r"""Unconditional lazy distribution from a constructor; array arguments are
    registered as parameters or buffers (reference: zuko/lazy.py:242-287).

    Example:
        >>> from zuko_tpu.distributions import DiagNormal
        >>> base = UnconditionalDistribution(
        ...     DiagNormal, jnp.zeros(3), jnp.ones(3), buffer=True)
        >>> base().event_shape
        (3,)
    """

    def __init__(self, f: Callable, *args, buffer: bool = False, **kwargs):
        self.f = f
        if buffer:
            self.register_buffer("args", list(args))
            self.register_buffer("kwargs", dict(kwargs))
        else:
            self.args = list(args)
            self.kwargs = dict(kwargs)

    def forward(self, c: jax.Array = None) -> Distribution:
        return self.f(*self.args, **self.kwargs)


class UnconditionalTransform(LazyTransform):
    r"""Unconditional lazy transformation from a constructor
    (reference: zuko/lazy.py:290-335).

    Example:
        >>> from zuko_tpu.transforms import SoftclipTransform
        >>> t = UnconditionalTransform(SoftclipTransform, bound=11.0)
        >>> float(t()(jnp.asarray(100.0)))  # doctest: +ELLIPSIS
        9.9...
    """

    def __init__(self, f: Callable, *args, buffer: bool = False, **kwargs):
        self.f = f
        if buffer:
            self.register_buffer("args", list(args))
            self.register_buffer("kwargs", dict(kwargs))
        else:
            self.args = list(args)
            self.kwargs = dict(kwargs)

    def forward(self, c: jax.Array = None) -> Transform:
        return self.f(*self.args, **self.kwargs)
