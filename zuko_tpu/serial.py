r"""Checkpointing: save/restore of module trees.

The reference's contract is whole-module ``torch.save`` / ``torch.load`` with
identical behavior after round-trip (reference: tests/test_flows.py:77-91,
zuko/lazy.py:263-270 parameter/buffer distinction). Two levels are provided:

* :func:`save` / :func:`load` — whole-module pickle (arrays included), the
  direct analog of ``torch.save(flow, path)``.
* :func:`save_params` / :func:`load_params` — arrays-only ``.npz`` checkpoint
  keyed by dotted parameter names, restored into an existing module skeleton
  (safer across code versions; the natural pytree form).
"""

from __future__ import annotations

try:
    import cloudpickle as pickle  # handles jitted callables and partials
except ImportError:  # pragma: no cover
    import pickle

import jax
import jax.numpy as jnp
import numpy as np

from typing import Any

from .core import named_parameters, update_parameters

__all__ = ["save", "load", "save_params", "load_params"]


def save(path, module: Any) -> None:
    """Pickle a whole module tree (parameters, buffers and static config)."""
    with open(path, "wb") as f:
        pickle.dump(jax.device_get(module), f)


def load(path) -> Any:
    """Load a module tree saved with :func:`save`."""
    with open(path, "rb") as f:
        return pickle.load(f)


def save_params(path, module: Any) -> None:
    """Save all array leaves (parameters AND buffers) to ``.npz`` keyed by
    dotted path names."""
    arrays = {
        name: np.asarray(leaf)
        for name, leaf in named_parameters(module, buffers=True)
        if leaf is not None
    }
    np.savez(path, **arrays)


def load_params(module: Any, path) -> Any:
    """Restore arrays saved with :func:`save_params` into ``module``,
    returning a new module. Raises ``KeyError`` on missing entries."""
    data = np.load(path)
    updates = {}
    for name, leaf in named_parameters(module, buffers=True):
        if leaf is None:
            continue
        if name not in data:
            raise KeyError(f"checkpoint is missing parameter '{name}'")
        updates[name] = jnp.asarray(data[name], jnp.asarray(leaf).dtype)
    return update_parameters(module, updates)
