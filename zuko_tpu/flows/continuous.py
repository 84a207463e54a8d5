r"""Continuous flows (CNF / FFJORD).

Capability parity with the reference's ``zuko/flows/continuous.py``: an ODE
network with sinusoidal time embedding, wrapped in a
:class:`~zuko_tpu.transforms.FreeFormJacobianTransform`.
"""

from __future__ import annotations

__all__ = ["CNF", "FFJTransform"]

import jax
import jax.numpy as jnp

from math import pi

from ..distributions import DiagNormal
from ..lazy import Flow, LazyTransform, UnconditionalDistribution
from ..nn import MLP
from ..transforms import FreeFormJacobianTransform
from ..utils import broadcast


def _ffj_dynamics(t, x, phi):
    """Pure dynamics function: time embedding + ODE net. All traced inputs
    (network, frequencies, context) arrive through ``phi`` so that gradients
    route through the odeint custom_vjp."""
    ode, freqs, c = phi["ode"], phi["freqs"], phi["c"]
    te = freqs * t[..., None]
    te = jnp.concatenate([jnp.cos(te), jnp.sin(te)], axis=-1)
    if c is None:
        u = jnp.concatenate(broadcast(te, x, ignore=1), axis=-1)
    else:
        u = jnp.concatenate(broadcast(te, x, c, ignore=1), axis=-1)
    return ode(u)


class FFJTransform(LazyTransform):
    r"""Lazy free-form Jacobian transformation: the ODE net is
    ``MLP(features + context + 2 freqs, features)`` with ELU activations and
    sinusoidal time embedding ``cos/sin(k π t)``
    (reference: zuko/flows/continuous.py:23-113).

    Example:
        >>> t = FFJTransform(3, 4, key=jax.random.PRNGKey(0))
        >>> x = jnp.asarray([0.6, -0.3, 1.1])
        >>> c = jnp.ones(4)
        >>> y = t(c)(x)
        >>> bool(jnp.allclose(t(c).inv(y), x, atol=1e-4))
        True
    
    References:
        | FFJORD: Free-form Continuous Dynamics for Scalable Reversible Generative Models (Grathwohl et al., 2018)
        | https://arxiv.org/abs/1810.01367
    """

    def __init__(
        self,
        features: int,
        context: int = 0,
        freqs: int = 3,
        atol: float = 1e-6,
        rtol: float = 1e-5,
        exact: bool = True,
        max_steps: int = 256,
        key: jax.Array = None,
        **kwargs,
    ):
        key = jax.random.PRNGKey(0) if key is None else key
        kwargs.setdefault("activation", jax.nn.elu)

        self.ode = MLP(features + context + 2 * freqs, features, key=key, **kwargs)
        self.register_buffer("freqs", jnp.arange(1, freqs + 1) * pi)
        self.atol = float(atol)
        self.rtol = float(rtol)
        self.exact = bool(exact)
        self.max_steps = int(max_steps)

    def forward(self, c: jax.Array = None, key: jax.Array = None):
        r"""Build the transform. With ``exact=False``, ``key`` seeds the
        Hutchinson trace estimator; thread it from the top via
        ``flow(c, key=key)`` (reference: zuko/transforms.py:1171-1172)."""
        if not self.exact and key is None:
            raise ValueError(
                "FFJTransform(exact=False) needs a PRNG key for the"
                " Hutchinson trace: call the flow as flow(c, key=key)."
            )
        return FreeFormJacobianTransform(
            f=_ffj_dynamics,
            t0=0.0,
            t1=1.0,
            phi={"ode": self.ode, "freqs": self.freqs, "c": c},
            atol=self.atol,
            rtol=self.rtol,
            exact=self.exact,
            key=key,
            max_steps=self.max_steps,
        )


class CNF(Flow):
    r"""Continuous normalizing flow (Chen et al., 2018; Grathwohl et al.,
    2018): a single :class:`FFJTransform` over a diagonal normal base
    (reference: zuko/flows/continuous.py:116-152).

    Example:
        >>> flow = CNF(2, key=jax.random.PRNGKey(0))
        >>> x = jnp.asarray([[0.1, -0.2]])
        >>> flow(None).log_prob(x).shape
        (1,)
    
    References:
        | Neural Ordinary Differential Equations (Chen et al., 2018)
        | https://arxiv.org/abs/1806.07366
    """

    def __init__(self, features: int, context: int = 0, key: jax.Array = None, **kwargs):
        transform = FFJTransform(features=features, context=context, key=key, **kwargs)

        base = UnconditionalDistribution(
            DiagNormal,
            jnp.zeros(features),
            jnp.ones(features),
            buffer=True,
        )

        super().__init__(transform, base)
