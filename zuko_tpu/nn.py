r"""Neural networks, layers and modules.

Capability parity with the reference's ``zuko/nn.py`` (392 LoC):

* :class:`Linear` supports ``stack`` — a stack of independent linear operators
  in one weight tensor, applied as a single batched einsum (reference:
  zuko/nn.py:51-119; used by NAF/UNAF to give each feature its own net).
* :class:`MaskedMLP` builds a MADE-style network from an arbitrary adjacency
  matrix with the reference's exact host-side mask construction: row dedup,
  precedence matrix, reachable-row tiling, optional masked residual blocks, and
  the null-Jacobian error (reference: zuko/nn.py:221-318). Masks are
  precomputed with NumPy and stored as buffers; the hot loop is masked matmuls.
* :class:`MonotonicMLP` = :class:`MonotonicLinear` (+|W|) with
  :class:`TwoWayELU` activations — all-positive Jacobian (reference:
  zuko/nn.py:321-392).

All constructors take an explicit PRNG ``key``; weights initialize to
:math:`U(\pm 1/\sqrt{\text{fan-in}})` like the reference (zuko/nn.py:89-95).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from typing import Callable, Optional, Sequence

from .core import Module

__all__ = [
    "Activation",
    "LayerNorm",
    "Linear",
    "MLP",
    "MaskedLinear",
    "MaskedMLP",
    "MonotonicLinear",
    "MonotonicMLP",
    "Residual",
    "TwoWayELU",
]


def _default_key(key):
    return jax.random.PRNGKey(0) if key is None else key


class Activation(Module):
    """Wraps an elementwise activation callable as a module."""

    def __init__(self, fn: Callable):
        self.fn = fn

    def __call__(self, x):
        return self.fn(x)


class TwoWayELU(Module):
    r"""Splits channels in two and applies :math:`\text{ELU}(x)` /
    :math:`-\text{ELU}(-x)` — keeps :class:`MonotonicMLP` expressive
    (reference: zuko/nn.py:335-353, which subclasses ``torch.nn.ELU`` —
    so ``alpha`` follows ELU semantics, :math:`\alpha(e^x - 1)`).
    ``inplace`` is meaningless under JAX and ignored."""

    def __init__(self, alpha: float = 1.0, inplace: bool = False):
        self.alpha = float(alpha)

    def __call__(self, x):
        x0, x1 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate(
            [jax.nn.elu(x0, self.alpha), -jax.nn.elu(-x1, self.alpha)],
            axis=-1,
        )


class LayerNorm(Module):
    r"""Standardizes features along a dimension (no affine, unbiased variance —
    reference: zuko/nn.py:25-48)."""

    def __init__(self, dim: int = -1, eps: float = 1e-5):
        self.dim = dim
        self.eps = float(eps)

    def __call__(self, x):
        mean = jnp.mean(x, axis=self.dim, keepdims=True)
        var = jnp.var(x, axis=self.dim, keepdims=True, ddof=1)
        return (x - mean) / jnp.sqrt(var + self.eps)


class Linear(Module):
    r"""Linear layer :math:`y = x W^T + b`, optionally a ``stack`` of
    independent operators (reference: zuko/nn.py:51-119).

    Example:
        >>> layer = Linear(3, 5, key=jax.random.PRNGKey(0))
        >>> layer(jnp.ones(3)).shape
        (5,)
        >>> stacked = Linear(3, 5, stack=7, key=jax.random.PRNGKey(0))
        >>> stacked(jnp.ones((7, 3))).shape
        (7, 5)
    """

    def __init__(
        self,
        in_features: int,
        out_features: int,
        bias: bool = True,
        stack: Optional[int] = None,
        key: jax.Array = None,
        dtype=jnp.float32,
    ):
        key = _default_key(key)
        shape = () if stack is None else (stack,)
        bound = 1 / math.sqrt(in_features)
        k1, k2 = jax.random.split(key)
        self.weight = jax.random.uniform(
            k1, shape + (out_features, in_features), dtype, -bound, bound
        )
        if bias:
            self.bias = jax.random.uniform(
                k2, shape + (out_features,), dtype, -bound, bound
            )
        else:
            self.bias = None
        self.in_features = int(in_features)
        self.out_features = int(out_features)

    def _matrix(self):
        return self.weight

    def __call__(self, x):
        W = self._matrix()
        y = jnp.einsum("...ij,...j->...i", W, x)
        if self.bias is not None:
            y = y + self.bias
        return y


class MonotonicLinear(Linear):
    r""":math:`y = x |W|^T + b` (reference: zuko/nn.py:321-332)."""

    def _matrix(self):
        return jnp.abs(self.weight)


class MaskedLinear(Linear):
    r"""Masked linear layer :math:`y = x (W \odot A)^T + b`
    (reference: zuko/nn.py:202-218). The adjacency is a frozen buffer."""

    def __init__(self, adjacency, key: jax.Array = None, dtype=jnp.float32):
        adjacency = np.asarray(adjacency, bool)
        out_features, in_features = adjacency.shape
        super().__init__(in_features, out_features, key=key, dtype=dtype)
        self.register_buffer("mask", jnp.asarray(adjacency, dtype))

    def _matrix(self):
        return self.mask * self.weight

    def __call__(self, x):
        from .ops.masked_linear import masked_linear

        return masked_linear(x, self.weight, self.mask, self.bias)


class _Sequential(Module):
    """Minimal sequential container over a list of callable modules."""

    def __init__(self, *layers):
        self.layers = list(layers)

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class Residual(_Sequential):
    r"""Residual block :math:`y = x + f(x)` (reference: zuko/nn.py:195-199)."""

    def __call__(self, x):
        return x + super().__call__(x)


class MLP(_Sequential):
    r"""Multi-layer perceptron (reference: zuko/nn.py:122-192).

    Arguments:
        in_features: input feature count.
        out_features: output feature count.
        hidden_features: hidden widths; default ``(64, 64)``.
        activation: activation callable (e.g. ``jax.nn.relu``); default ReLU.
        normalize: whether to LayerNorm between layers.
        key: PRNG key for initialization.

    Example:
        >>> net = MLP(64, 1, (32, 16), activation=jax.nn.elu, key=jax.random.PRNGKey(0))
        >>> net(jnp.ones(64)).shape
        (1,)
    """

    def __init__(
        self,
        in_features: int,
        out_features: int,
        hidden_features: Sequence[int] = (64, 64),
        activation: Callable = None,
        normalize: bool = False,
        key: jax.Array = None,
        **kwargs,
    ):
        key = _default_key(key)
        if activation is None:
            activation = jax.nn.relu

        widths = [in_features, *hidden_features, out_features]
        n = len(widths) - 1
        keys = jax.random.split(key, n)

        layers = []
        for i, (before, after) in enumerate(zip(widths[:-1], widths[1:])):
            layers.append(
                self._make_linear(before, after, key=keys[i], **kwargs)
            )
            if i < n - 1:
                layers.append(self._make_activation(activation))
                if normalize:
                    layers.append(LayerNorm())

        super().__init__(*layers)
        self.in_features = int(in_features)
        self.out_features = int(out_features)

    @staticmethod
    def _make_linear(before, after, **kwargs):
        return Linear(before, after, **kwargs)

    @staticmethod
    def _make_activation(activation):
        return Activation(activation)


class MonotonicMLP(MLP):
    r"""MLP with positive-Jacobian layers: :class:`MonotonicLinear` +
    :class:`TwoWayELU` (reference: zuko/nn.py:356-392 — the NAF ingredient).

    Example:
        >>> net = MonotonicMLP(3, 4, (16, 32), key=jax.random.PRNGKey(0))
        >>> J = jax.jacfwd(net)(jnp.zeros(3))
        >>> bool((J > 0).all())
        True
    """

    def __init__(self, *args, **kwargs):
        kwargs["activation"] = None
        kwargs["normalize"] = False
        super().__init__(*args, **kwargs)

    @staticmethod
    def _make_linear(before, after, **kwargs):
        return MonotonicLinear(before, after, **kwargs)

    @staticmethod
    def _make_activation(activation):
        return TwoWayELU()


def masked_mlp_masks(
    adjacency: np.ndarray,
    hidden_features: Sequence[int] = (64, 64),
    residual: bool = False,
):
    r"""Host-side construction of MADE masks from an adjacency matrix.

    Follows the reference algorithm exactly (zuko/nn.py:271-313): merge output
    rows with identical dependencies, build the precedence matrix
    :math:`P_{ij} = [A A^T]_{ij} = \sum_k A_{jk}`, tile hidden units over
    reachable rows, and restore duplicated outputs at the last layer. Returns a
    list of per-layer masks; for ``residual=True``, entries may be
    ``("residual", mask)`` markers.

    Raises:
        ValueError: if the adjacency leads to a null Jacobian.
    """
    adjacency = np.asarray(adjacency, bool)
    out_features, in_features = adjacency.shape

    adjacency, inverse = np.unique(adjacency, axis=0, return_inverse=True)
    inverse = inverse.reshape(-1)

    # P_ij = 1 iff row i's dependencies include row j's dependencies
    precedence = (
        adjacency.astype(np.int64) @ adjacency.astype(np.int64).T
        == adjacency.sum(axis=-1)
    )

    masks = []
    indices = None

    for i, features in enumerate((*hidden_features, out_features)):
        if i > 0:
            mask = precedence[:, indices]
        else:
            mask = adjacency

        if (~mask).all():
            raise ValueError("The adjacency matrix leads to a null Jacobian.")

        if i < len(hidden_features):
            reachable = np.nonzero(mask.sum(axis=-1))[0]
            indices = reachable[np.arange(features) % len(reachable)]
            mask = mask[indices]
        else:
            mask = mask[inverse]

        masks.append(("linear", mask))

        if residual and i < len(hidden_features):
            if 0 < i and mask.shape[0] == mask.shape[1]:
                masks.pop()
            res_mask = precedence[indices, :][:, indices]
            masks.append(("residual", res_mask))

    return masks


class MaskedMLP(_Sequential):
    r"""MADE-style masked MLP: the Jacobian entry :math:`\partial y_i /
    \partial x_j` is null wherever :math:`A_{ij} = 0`
    (reference: zuko/nn.py:221-318).

    Example:
        >>> adjacency = np.tril(np.ones((3, 3)), -1).astype(bool)
        >>> adjacency[0, 0] = True  # ensure non-null Jacobian
        >>> net = MaskedMLP(adjacency, (16, 32), key=jax.random.PRNGKey(0))
        >>> J = jax.jacfwd(net)(jnp.zeros(3))
        >>> bool(jnp.allclose(J[~adjacency], 0.0))
        True
    """

    def __init__(
        self,
        adjacency,
        hidden_features: Sequence[int] = (64, 64),
        activation: Callable = None,
        residual: bool = False,
        key: jax.Array = None,
    ):
        key = _default_key(key)
        if activation is None:
            activation = jax.nn.relu

        specs = masked_mlp_masks(adjacency, hidden_features, residual)
        keys = jax.random.split(key, 2 * len(specs))

        layers = []
        for i, (kind, mask) in enumerate(specs):
            last = i == len(specs) - 1
            if kind == "linear":
                layers.append(MaskedLinear(mask, key=keys[2 * i]))
                if not last and not residual:
                    layers.append(Activation(activation))
            else:  # residual block
                layers.append(
                    Residual(
                        MaskedLinear(mask, key=keys[2 * i]),
                        Activation(activation),
                        MaskedLinear(mask, key=keys[2 * i + 1]),
                    )
                )

        super().__init__(*layers)
        adjacency = np.asarray(adjacency, bool)
        self.out_features = int(adjacency.shape[0])
        self.in_features = int(adjacency.shape[1])
