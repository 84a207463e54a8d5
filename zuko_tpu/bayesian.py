r"""Bayesian models.

Capability parity with the reference's ``zuko/bayesian.py`` (272 LoC):
mean-field Gaussian variational posterior over a glob-filtered subset of a
model's parameters.

The reference's module surgery (``stateless._reparametrize_module``,
zuko/bayesian.py:141-239) becomes functional parameter substitution — the
natural JAX form: ``reparameterize(key)`` returns a *new* base module whose
selected leaves are reparameterized draws computed from the posterior's
``means``/``logvars``, so gradients flow to the posterior and determinism
within one "context" is simply determinism of a fixed key.
"""

from __future__ import annotations

__all__ = ["BayesianModel"]

import math
import re

import jax
import jax.numpy as jnp

from typing import Sequence

from .core import (
    Module,
    map_modules,
    named_parameters,
    update_parameters,
)
from .nn import Linear, MaskedLinear

Array = jax.Array


def _compile(prefix: str) -> re.Pattern:
    # glob-like prefix patterns (reference: zuko/bayesian.py:24-37)
    assert re.fullmatch(r"[\w\.\*]*", prefix) is not None, f"Invalid prefix {prefix}."
    pattern = (
        prefix.replace(".", r"\.").replace("**", r"[\w\.]+").replace("*", r"\w+")
        + r".*"
    )
    return re.compile(pattern)


def _match(pattern: re.Pattern, string: str) -> bool:
    return re.fullmatch(pattern, string) is not None


def _softclip(x, bound: float):
    # reference: zuko/bayesian.py:44-45
    return x * jax.lax.rsqrt(1 + (x / bound) ** 2)


def _name_key(name: str) -> int:
    """Stable integer for PRNG folding, derived from the parameter name."""
    h = 0
    for ch in name:
        h = (h * 131 + ord(ch)) % (2**31 - 1)
    return h


class _LocalReparamLinear(Module):
    """Linear layer under the local reparameterization trick (Kingma et al.,
    2015): samples activation noise with moments
    ``y_mean = x @ W_mean, y_var = x^2 @ W_var`` instead of weight noise.
    Noise is deterministic per (layer, output shape) within one context —
    the reference's randn cache semantics (zuko/bayesian.py:170-239)."""

    def __init__(self, w_mean, w_var, b_mean, b_var, mask, key):
        self.w_mean = w_mean
        self.w_var = w_var
        self.b_mean = b_mean
        self.b_var = b_var
        self.mask = mask
        self.key = key

    def __call__(self, x):
        w_mean, w_var = self.w_mean, self.w_var
        if self.mask is not None:
            w_mean = self.mask * w_mean
            w_var = self.mask * w_var

        y_mean = jnp.einsum("...ij,...j->...i", w_mean, x)
        if self.b_mean is not None:
            y_mean = y_mean + self.b_mean
        y_var = jnp.einsum("...ij,...j->...i", w_var, x**2)
        if self.b_var is not None:
            y_var = y_var + self.b_var

        shape_key = _name_key(str(tuple(y_mean.shape)))
        eta = jax.random.normal(
            jax.random.fold_in(self.key, shape_key), y_mean.shape, y_mean.dtype
        )
        return y_mean + jnp.sqrt(y_var) * eta


class BayesianModel(Module):
    r"""Bayesian wrapper: mean-field Gaussian posterior over a filtered subset
    of ``base``'s parameters (reference: zuko/bayesian.py:48-272).

    Arguments:
        base: the base module.
        init_logvar: initial posterior log-variance mean.
        include_params: parameter-name prefixes to include (``*`` matches one
            dotted segment, ``**`` matches several).
        exclude_params: prefixes to exclude.
        key: PRNG key for log-variance initialization.

    Example:
        >>> from zuko_tpu.nn import MLP
        >>> net = MLP(3, 2, key=jax.random.PRNGKey(0))
        >>> model = BayesianModel(net, key=jax.random.PRNGKey(1))
        >>> sampled = model.reparameterize(jax.random.PRNGKey(2))
        >>> sampled(jnp.ones(3)).shape
        (2,)
        >>> float(model.kl_divergence()) > 0
        True
    """

    def __init__(
        self,
        base: Module,
        init_logvar: float = -9.0,
        include_params: Sequence[str] = ("",),
        exclude_params: Sequence[str] = (),
        key: Array = None,
    ):
        key = jax.random.PRNGKey(0) if key is None else key
        self.base = base

        include = [_compile(p) for p in include_params]
        exclude = [_compile(p) for p in exclude_params]

        means, logvars = {}, {}
        for name, param in named_parameters(base):
            if not any(_match(p, name) for p in include):
                continue
            if any(_match(p, name) for p in exclude):
                continue
            means[name] = jnp.asarray(param)
            logvars[name] = init_logvar + 1e-3 * jax.random.normal(
                jax.random.fold_in(key, _name_key(name)),
                jnp.shape(param),
                jnp.asarray(param).dtype,
            )

        self.means = means
        self.logvars = logvars

    def __call__(self, *args, **kwargs):
        raise RuntimeError(
            "BayesianModel should not be called directly. Use 'sample_model'"
            " or 'reparameterize' instead."
        )

    def sample_params(self, key: Array) -> dict:
        r"""Reparameterized posterior draws with log-variance softclipped to
        :math:`\pm 18` (reference: zuko/bayesian.py:107-120)."""
        params = {}
        for name in self.means:
            mean = self.means[name]
            std = jnp.exp(_softclip(self.logvars[name], 18.0) / 2)
            eps = jax.random.normal(
                jax.random.fold_in(key, _name_key(name)), mean.shape, mean.dtype
            )
            params[name] = mean + std * eps
        return params

    def reparameterize(self, key: Array, local_trick: bool = False) -> Module:
        r"""Returns the base module with selected parameters replaced by
        posterior draws. Gradients flow to ``means``/``logvars``
        (reference: zuko/bayesian.py:141-168)."""
        if local_trick:
            return self._reparameterize_local(key)
        params = self.sample_params(key)
        return update_parameters(self.base, params)

    def sample_model(self, key: Array) -> Module:
        r"""A standalone sampled model — gradients do NOT flow to the
        posterior (reference: zuko/bayesian.py:122-139)."""
        params = jax.tree_util.tree_map(
            jax.lax.stop_gradient, self.sample_params(key)
        )
        return update_parameters(self.base, params)

    def _reparameterize_local(self, key: Array) -> Module:
        means, logvars = self.means, self.logvars
        swapped = set()

        def swap(name, module):
            if not isinstance(module, (Linear, MaskedLinear)):
                return module
            wname = f"{name}.weight"
            if wname not in means:
                return module
            bname = f"{name}.bias"
            w_mean = means[wname]
            w_var = jnp.exp(_softclip(logvars[wname], 18.0))
            if bname in means:
                b_mean = means[bname]
                b_var = jnp.exp(_softclip(logvars[bname], 18.0))
            else:
                b_mean = module.bias
                b_var = None
            mask = module.mask if isinstance(module, MaskedLinear) else None
            swapped.add(name)
            return _LocalReparamLinear(
                w_mean, w_var, b_mean, b_var, mask,
                jax.random.fold_in(key, _name_key(name)),
            )

        model = map_modules(self.base, swap)
        # parameters outside the swapped linear layers still get global reparam
        remaining = {
            n: p
            for n, p in self.sample_params(key).items()
            if not any(n in (s + ".weight", s + ".bias") for s in swapped)
        }
        return update_parameters(model, remaining)

    def kl_divergence(self, prior_var: float = 1.0):
        r"""Closed-form Gaussian KL between posterior and prior, summed over
        the filtered parameters (reference: zuko/bayesian.py:241-260)."""
        kl = 0.0
        for name in self.means:
            mean = self.means[name]
            log_var = _softclip(self.logvars[name], 18.0)
            var = jnp.exp(log_var)
            kl = kl + 0.5 * jnp.sum(
                var / prior_var
                + mean**2 / prior_var
                + math.log(prior_var)
                - log_var
                - 1.0
            )
        return kl




