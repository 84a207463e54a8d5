r"""Pytree module system.

A :class:`Module` is a pytree-registered container: attributes holding JAX/NumPy
arrays (or other modules, or containers thereof) are *dynamic* children that flow
through :func:`jax.jit` / :func:`jax.grad`, while everything else (ints, floats,
strings, callables, shapes) is *static* auxiliary data that keys the compilation
cache.

This is the TPU-native answer to the reference's ``torch.nn.Module`` semantics
(reference: zuko/lazy.py:29-49, zuko/utils.py:26-115): parameters live in a
pytree, "building a distribution" is pure tracing, and the parameter-vs-buffer
distinction (reference: zuko/lazy.py:263-270, zuko/nn.py:215) is expressed with
:meth:`Module.register_buffer` plus the :func:`partition` / :func:`combine`
filtered-transform helpers (so optimizers only touch trainable leaves).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from typing import Any, Callable, Dict, Tuple

__all__ = [
    "Module",
    "partition",
    "combine",
    "tree_replace",
]


# Types that are always static configuration. Everything NOT recognized as
# static is a dynamic pytree leaf — this direction is load-bearing: JAX
# transformations rebuild pytrees with arbitrary sentinel leaf objects
# (e.g. custom_vjp's bwd-structure check), and flatten/unflatten must
# round-trip for those too.
_STATIC_TYPES = (
    str, bytes, type(None), bool, int, float, complex,
    np.dtype, type(Ellipsis), range, slice,
)


def _is_static(v: Any) -> bool:
    """Whether a value belongs to the static (aux) part of the pytree."""
    if isinstance(v, (jax.Array, np.ndarray, Module, jax.core.Tracer)):
        return False
    if isinstance(v, _STATIC_TYPES) or isinstance(v, type):
        return True
    if isinstance(v, (list, tuple)):
        return all(_is_static(u) for u in v)
    if isinstance(v, dict):
        return all(_is_static(u) for u in v.values())
    if isinstance(v, (set, frozenset)):
        return all(_is_static(u) for u in v)
    if isinstance(v, functools.partial):
        # A partial is only static when everything it closes over is: a
        # partial over a traced array (e.g. AutoregressiveTransform.meta
        # built by a conditional flow, transforms.py) must ride the DYNAMIC
        # side, or the tracer would hide in the pytree's static aux and leak
        # the first time the built transform crosses a jit boundary. As a
        # dynamic leaf it round-trips through flatten/unflatten, and a jit
        # boundary rejects it loudly (leaves must be arrays) instead of
        # silently capturing a stale tracer.
        return (
            _is_static(v.func)
            and all(_is_static(a) for a in v.args)
            and all(_is_static(a) for a in v.keywords.values())
        )
    if callable(v):  # plain functions / constructors
        return True
    return False


def _is_dynamic(v: Any) -> bool:
    return not _is_static(v)


def _freeze(v: Any) -> Any:
    """Recursively convert a static value to a hashable form.

    ``functools.partial`` is decomposed by VALUE (func, args, kwargs):
    partial defines no ``__eq__``, so leaving it as-is would make two
    structurally identical modules flatten to UNEQUAL treedefs — every jit
    whose arguments contain a rebuilt module (the serving/load_params
    pattern) would silently retrace per call."""
    if isinstance(v, (list, tuple)):
        return (list, tuple)[isinstance(v, tuple)], tuple(_freeze(u) for u in v)
    if isinstance(v, dict):
        return (dict, tuple((k, _freeze(v[k])) for k in sorted(v, key=repr)))
    if isinstance(v, set):
        return (set, frozenset(_freeze(u) for u in v))
    if isinstance(v, functools.partial):
        return (
            functools.partial,
            _freeze(v.func),
            tuple(_freeze(u) for u in v.args),
            tuple(sorted(((k, _freeze(u)) for k, u in v.keywords.items()),
                         key=repr)),
        )
    return v


class _Static:
    """Hashable wrapper for static aux data; preserves the original object."""

    __slots__ = ("value",)

    def __init__(self, value: Any):
        self.value = value

    def __eq__(self, other: Any) -> bool:
        return type(other) is _Static and _freeze(self.value) == _freeze(other.value)

    def __hash__(self) -> int:
        try:
            return hash(_freeze(self.value))
        except TypeError:  # unhashable static (rare); collide, rely on __eq__
            return 0

    def __repr__(self) -> str:
        return f"_Static({self.value!r})"


def _flatten_module(obj: "Module"):
    names = sorted(obj.__dict__)
    dynamic, dnames, static, snames = [], [], [], []
    for k in names:
        v = obj.__dict__[k]
        if _is_dynamic(v):
            dynamic.append(v)
            dnames.append(k)
        else:
            static.append(_Static(v))
            snames.append(k)
    return dynamic, (tuple(dnames), tuple(snames), tuple(static))


def _flatten_module_with_keys(obj: "Module"):
    dynamic, aux = _flatten_module(obj)
    keyed = [(jax.tree_util.GetAttrKey(k), v) for k, v in zip(aux[0], dynamic)]
    return keyed, aux


def _unflatten_module(cls, aux, dynamic):
    dnames, snames, static = aux
    obj = object.__new__(cls)
    d = obj.__dict__
    for k, v in zip(dnames, dynamic):
        d[k] = v
    for k, s in zip(snames, static):
        d[k] = s.value
    return obj


class Module:
    """Base class: every subclass is automatically a pytree.

    Attributes containing arrays / modules are pytree children; the rest is
    static configuration. Use :meth:`register_buffer` to mark an attribute's
    arrays as non-trainable (frozen under :func:`partition`).
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_with_keys(
            cls,
            _flatten_module_with_keys,
            lambda aux, dyn, cls=cls: _unflatten_module(cls, aux, dyn),
            flatten_func=_flatten_module,
        )

    def register_buffer(self, name: str, value: Any) -> None:
        """Set ``self.<name> = value`` and mark it frozen (non-trainable)."""
        object.__setattr__(self, name, value)
        bn = self.__dict__.get("_buffer_names", frozenset())
        self.__dict__["_buffer_names"] = frozenset(bn) | {name}

    @property
    def buffer_names(self) -> frozenset:
        return self.__dict__.get("_buffer_names", frozenset())

    def tree_replace(self, **updates: Any) -> "Module":
        """Functionally replace attributes, returning a new module."""
        obj = object.__new__(type(self))
        obj.__dict__.update(self.__dict__)
        obj.__dict__.update(updates)
        return obj

    def __repr__(self) -> str:
        return tree_repr(self)


def tree_replace(module: Module, **updates: Any) -> Module:
    return module.tree_replace(**updates)


def _skeleton(x: Module) -> Module:
    obj = object.__new__(type(x))
    return obj


def _split(x: Any, frozen: bool) -> Tuple[Any, Any]:
    if isinstance(x, Module):
        p, b = _skeleton(x), _skeleton(x)
        bnames = x.buffer_names
        for k, v in x.__dict__.items():
            pv, bv = _split(v, frozen or (k in bnames))
            p.__dict__[k] = pv
            b.__dict__[k] = bv
        return p, b
    if _is_static(x):
        return x, x  # static config appears on both sides
    if isinstance(x, (list, tuple)):
        pairs = [_split(u, frozen) for u in x]
        ctor = type(x)
        return ctor(a for a, _ in pairs), ctor(b for _, b in pairs)
    if isinstance(x, dict):
        pairs = {k: _split(v, frozen) for k, v in x.items()}
        return (
            {k: a for k, (a, _) in pairs.items()},
            {k: b for k, (_, b) in pairs.items()},
        )
    # dynamic leaf (array, tracer, or unknown object)
    return (None, x) if frozen else (x, None)


def partition(tree: Any) -> Tuple[Any, Any]:
    r"""Split a module tree into (trainable, frozen) halves.

    Both halves have the same structure as the input; array leaves appear on
    exactly one side (``None`` on the other). Static config appears on both.

    Example:
        >>> params, static = partition(flow)      # doctest: +SKIP
        >>> flow2 = combine(params, static)       # doctest: +SKIP
    """
    return _split(tree, False)


def combine(a: Any, b: Any) -> Any:
    """Inverse of :func:`partition`: merge two half-trees."""
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, Module):
        obj = object.__new__(type(a))
        for k in a.__dict__:
            obj.__dict__[k] = combine(a.__dict__[k], b.__dict__[k])
        return obj
    if isinstance(a, (list, tuple)):
        return type(a)(combine(u, v) for u, v in zip(a, b))
    if isinstance(a, dict):
        return {k: combine(a[k], b[k]) for k in a}
    return a


def named_parameters(tree: Any, prefix: str = "", buffers: bool = False):
    """Yield ``(dotted_name, array)`` pairs for the dynamic leaves of a module
    tree (the role of ``nn.Module.named_parameters``). Buffers are excluded
    unless ``buffers=True``."""
    if isinstance(tree, Module):
        bnames = tree.buffer_names
        for k in sorted(tree.__dict__):
            if k == "_buffer_names":
                continue
            if (k in bnames) and not buffers:
                continue
            name = f"{prefix}.{k}" if prefix else k
            yield from named_parameters(tree.__dict__[k], name, buffers)
    elif _is_static(tree):
        return
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from named_parameters(v, f"{prefix}.{i}", buffers)
    elif isinstance(tree, dict):
        for k in sorted(tree, key=repr):
            yield from named_parameters(tree[k], f"{prefix}.{k}", buffers)
    else:
        yield prefix, tree


def update_parameters(tree: Any, updates: Dict[str, Any], prefix: str = "") -> Any:
    """Functionally replace named leaves (as produced by
    :func:`named_parameters`) with new values."""
    if not updates:
        return tree
    if isinstance(tree, Module):
        obj = object.__new__(type(tree))
        for k, v in tree.__dict__.items():
            name = f"{prefix}.{k}" if prefix else k
            obj.__dict__[k] = update_parameters(v, updates, name)
        return obj
    if _is_static(tree):
        return tree
    if isinstance(tree, (list, tuple)):
        return type(tree)(
            update_parameters(v, updates, f"{prefix}.{i}")
            for i, v in enumerate(tree)
        )
    if isinstance(tree, dict):
        return {
            k: update_parameters(v, updates, f"{prefix}.{k}")
            for k, v in tree.items()
        }
    return updates.get(prefix, tree)


def named_modules(tree: Any, prefix: str = ""):
    """Yield ``(dotted_name, module)`` pairs for every :class:`Module` in the
    tree (the role of ``nn.Module.named_modules``)."""
    if isinstance(tree, Module):
        yield prefix, tree
        for k in sorted(tree.__dict__):
            if k == "_buffer_names":
                continue
            name = f"{prefix}.{k}" if prefix else k
            yield from named_modules(tree.__dict__[k], name)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from named_modules(v, f"{prefix}.{i}")
    elif isinstance(tree, dict):
        for k in sorted(tree, key=repr):
            yield from named_modules(tree[k], f"{prefix}.{k}")


def map_modules(tree: Any, fn: Callable[[str, "Module"], "Module"], prefix: str = "") -> Any:
    """Functionally rebuild the tree, replacing each module ``m`` at path ``p``
    with ``fn(p, m)`` (applied bottom-up to children first)."""
    if isinstance(tree, Module):
        obj = object.__new__(type(tree))
        for k, v in tree.__dict__.items():
            name = f"{prefix}.{k}" if prefix else k
            obj.__dict__[k] = map_modules(v, fn, name)
        return fn(prefix, obj)
    if isinstance(tree, (list, tuple)) and not _is_static(tree):
        return type(tree)(
            map_modules(v, fn, f"{prefix}.{i}") for i, v in enumerate(tree)
        )
    if isinstance(tree, dict) and not _is_static(tree):
        return {k: map_modules(v, fn, f"{prefix}.{k}") for k, v in tree.items()}
    return tree


def tree_repr(x: Any, depth: int = 0) -> str:
    """Compact, informative repr of a module tree (reference parity:
    zuko keeps a strong __repr__ contract, e.g. zuko/lazy.py:116-117)."""
    pad = "  " * depth
    if isinstance(x, Module):
        lines = [type(x).__name__ + "("]
        for k in sorted(x.__dict__):
            if k == "_buffer_names":
                continue
            v = x.__dict__[k]
            lines.append(f"{pad}  {k}={tree_repr(v, depth + 1).lstrip()},")
        lines.append(pad + ")")
        if len(lines) == 2:
            return type(x).__name__ + "()"
        return "\n".join(lines)
    if isinstance(x, (jax.Array, np.ndarray)):
        return f"{pad}Array(shape={tuple(x.shape)}, dtype={x.dtype})"
    if isinstance(x, (list, tuple)):
        o, c = ("[", "]") if isinstance(x, list) else ("(", ")")
        if not x:
            return pad + o + c
        inner = ",\n".join(pad + "  " + tree_repr(v, depth + 1).lstrip() for v in x)
        return f"{pad}{o}\n{inner}\n{pad}{c}"
    return pad + repr(x)
