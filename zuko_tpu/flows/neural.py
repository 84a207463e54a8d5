r"""Neural flows (NAF / UNAF).

Capability parity with the reference's ``zuko/flows/neural.py``: monotonic
(MNN) and unconstrained-monotonic (UMNN) networks used as the univariate
transformations of masked autoregressive layers, with ``SoftclipTransform``
interleaved to keep features in the invertibility domain.

TPU note: the reference routes gradients through the bisection inverse by
passing an explicit ``phi`` tuple (zuko/flows/neural.py:62-71); here the
monotone network and its signal are *attributes* of the transform pytree, so
the implicit-function-theorem custom_vjp sees them automatically.
"""

from __future__ import annotations

__all__ = ["MNN", "NAF", "UMNN", "UNAF"]

import jax
import jax.numpy as jnp
import numpy as np

from .autoregressive import MaskedAutoregressiveTransform
from ..core import Module
from ..distributions import DiagNormal
from ..lazy import Flow, UnconditionalDistribution, UnconditionalTransform
from ..nn import MLP, MonotonicMLP
from ..transforms import (
    AdditiveTransform,
    ComposedTransform,
    MonotonicTransform,
    SoftclipTransform,
    UnconstrainedMonotonicTransform,
)
from ..utils import broadcast


class _MonotonicNetTransform(MonotonicTransform):
    """Monotone transformation computed by a stacked MonotonicMLP modulated by
    a per-feature signal (reference: zuko/flows/neural.py:55-60)."""

    def __init__(self, network, signal, bound: float = 10.0, eps: float = 1e-6):
        super().__init__(None, bound=bound, eps=eps)
        self.network = network
        self.signal = signal

    def f(self, x):
        u = jnp.concatenate(
            broadcast(x[..., None], self.signal, ignore=1), axis=-1
        )
        return self.network(u)[..., 0]


class MNN(Module):
    r"""Monotonic neural network: internal positive weights shared across
    features/context, modulated by a signal vector
    (reference: zuko/flows/neural.py:32-71).

    Calling an instance with a signal returns a
    :class:`~zuko_tpu.transforms.MonotonicTransform`.
    """

    def __init__(self, signal: int = 16, stack: int = None, key=None, **kwargs):
        self.network = MonotonicMLP(1 + signal, 1, stack=stack, key=key, **kwargs)

    def __call__(self, signal):
        return _MonotonicNetTransform(self.network, signal)


class _UMNNTransform(UnconstrainedMonotonicTransform):
    """UMNN integrand transform: g is the exponential of a softclipped MLP
    output, in [1e-3, 1e3] (reference: zuko/flows/neural.py:100-104)."""

    def __init__(self, integrand, signal, n: int = 32, **kwargs):
        super().__init__(None, n=n, **kwargs)
        self.integrand = integrand
        self.signal = signal

    def g(self, x):
        u = jnp.concatenate(
            broadcast(x[..., None], self.signal, ignore=1), axis=-1
        )
        dx = self.integrand(u)[..., 0]
        return jnp.exp(dx / (1 + jnp.abs(dx / 7)))


class UMNN(Module):
    r"""Unconstrained monotonic neural network
    (reference: zuko/flows/neural.py:74-118).

    Calling an instance with ``(signal, constant)`` returns
    ``UnconstrainedMonotonicTransform ∘ AdditiveTransform(constant)``.
    """

    def __init__(self, signal: int = 16, stack: int = None, key=None, **kwargs):
        kwargs.setdefault("activation", jax.nn.elu)
        self.integrand = MLP(1 + signal, 1, stack=stack, key=key, **kwargs)

    def __call__(self, signal, constant):
        return ComposedTransform(
            _UMNNTransform(self.integrand, signal),
            AdditiveTransform(constant),
        )


def _interleaved_flow(
    features, context, transforms, randperm, univariate_factory, shapes,
    key, **kwargs,
):
    key = jax.random.PRNGKey(0) if key is None else key
    keys = jax.random.split(key, 2 * transforms)
    rng = np.random.RandomState(int(jax.random.randint(key, (), 0, 2**31 - 1)))

    orders = [np.arange(features), np.arange(features)[::-1]]

    layers = [
        MaskedAutoregressiveTransform(
            features=features,
            context=context,
            order=rng.permutation(features) if randperm else orders[i % 2],
            univariate=univariate_factory(keys[transforms + i]),
            shapes=shapes,
            key=keys[i],
            **kwargs,
        )
        for i in range(transforms)
    ]

    # SoftclipTransform(bound=11) between AR layers keeps features inside the
    # invertibility domain (reference: zuko/flows/neural.py:172-173)
    for i in reversed(range(1, len(layers))):
        layers.insert(i, UnconditionalTransform(SoftclipTransform, bound=11.0))

    base = UnconditionalDistribution(
        DiagNormal,
        jnp.zeros(features),
        jnp.ones(features),
        buffer=True,
    )

    return layers, base


class NAF(Flow):
    r"""Neural autoregressive flow (Huang et al., 2018)
    (reference: zuko/flows/neural.py:121-182).

    Warning:
        Invertibility is only guaranteed within :math:`[-10, 10]`; standardize
        features before training.

    Example:
        >>> flow = NAF(3, transforms=2, signal=8, key=jax.random.PRNGKey(0))
        >>> x = jnp.asarray([[0.1, -0.5, 0.3]])
        >>> flow(None).log_prob(x).shape
        (1,)
    
    References:
        | Neural Autoregressive Flows (Huang et al., 2018)
        | https://arxiv.org/abs/1804.00779
    """

    def __init__(
        self,
        features: int,
        context: int = 0,
        transforms: int = 3,
        randperm: bool = False,
        signal: int = 16,
        network: dict = None,
        key: jax.Array = None,
        **kwargs,
    ):
        network = {} if network is None else dict(network)
        layers, base = _interleaved_flow(
            features, context, transforms, randperm,
            lambda k: MNN(signal=signal, stack=features, key=k, **network),
            [(signal,)],
            key,
            **kwargs,
        )
        super().__init__(layers, base)


class UNAF(Flow):
    r"""Unconstrained neural autoregressive flow (Wehenkel et al., 2019)
    (reference: zuko/flows/neural.py:185-246).

    Example:
        >>> flow = UNAF(3, transforms=2, signal=8, key=jax.random.PRNGKey(0))
        >>> x = jnp.asarray([[0.1, -0.5, 0.3]])
        >>> flow(None).log_prob(x).shape
        (1,)
    
    References:
        | Unconstrained Monotonic Neural Networks (Wehenkel et al., 2019)
        | https://arxiv.org/abs/1908.05164
    """

    def __init__(
        self,
        features: int,
        context: int = 0,
        transforms: int = 3,
        randperm: bool = False,
        signal: int = 16,
        network: dict = None,
        key: jax.Array = None,
        **kwargs,
    ):
        network = {} if network is None else dict(network)
        layers, base = _interleaved_flow(
            features, context, transforms, randperm,
            lambda k: UMNN(signal=signal, stack=features, key=k, **network),
            [(signal,), ()],
            key,
            **kwargs,
        )
        super().__init__(layers, base)
