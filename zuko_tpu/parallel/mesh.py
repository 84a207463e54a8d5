r"""Device mesh construction and sharding rules.

Design (TPU-first, per the scaling-book recipe): pick a mesh, annotate
shardings on inputs and parameters, let XLA insert the collectives, profile,
iterate. For tabular flows the feature dimension is small, so the winning
layout is: **replicate parameters, shard the batch/sample axes over ``data``**;
the ``model`` axis is available for stacked per-feature networks (NAF/UNAF
``stack=features``), mixture components, and wide hyper-MLP hidden layers
(tensor parallelism).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from typing import Any, Optional, Sequence

from ..core import named_parameters, update_parameters
from ..nn import Linear, MaskedLinear

__all__ = [
    "distributed_init",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_module",
    "sharded_fused_log_prob",
    "tensor_parallel_spec",
]


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> dict:
    """Initialize the multi-host runtime and return a summary dict.

    Thin, idempotent wrapper over :func:`jax.distributed.initialize` — the
    launch step that must precede :func:`make_mesh` on a pod slice so that
    ``jax.devices()`` spans all hosts and the ``data`` axis rides ICI/DCN.
    On Cloud TPU all arguments are auto-detected from the metadata server;
    on CPU/GPU pass them explicitly (one call per process).

    Returns ``{"process_id", "process_count", "local_devices",
    "global_devices"}``. Calling it again after initialization is a no-op
    (returns the current summary), so library code can call it defensively.
    """
    already = jax._src.distributed.global_state.client is not None
    if not already:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    return {
        "process_id": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def make_mesh(
    model: int = 1,
    data: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``data`` defaults to ``n_devices // model``. On a multi-host pod slice,
    call :func:`jax.distributed.initialize` first; devices then span all
    hosts and the data axis rides ICI/DCN automatically.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with their leading (batch) axis sharded over ``data``."""
    out = [
        jax.device_put(
            a, NamedSharding(mesh, P("data", *([None] * (jnp.ndim(a) - 1))))
        )
        for a in arrays
    ]
    return out[0] if len(out) == 1 else out


def replicate(mesh: Mesh, tree: Any):
    """Fully replicate every array leaf of a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())

    def place(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            return jax.device_put(jnp.asarray(x), sharding)
        return x

    return jax.tree_util.tree_map(place, tree)


def tensor_parallel_spec(module: Any, model: Optional[int] = None) -> dict:
    """Propose PartitionSpecs for a module tree:

    * **stacked** Linear weights (3-D, the NAF/UNAF per-feature nets) shard
      their stack dimension over ``model``;
    * **hyper-MLP hidden layers** shard alternately out/in (Megatron-style
      column/row split, wide-conditioner tensor parallelism): within each
      sequential net, hidden layer 0 column-splits its output rows
      (``P("model", None)``, bias and MADE mask along), hidden layer 1
      row-splits its input columns (``P(None, "model")``, XLA inserts the
      partial-sum reduce at its output), alternating; the final output layer
      stays replicated so downstream transform math sees full parameters.

    Everything else is replicated. Pass ``model`` (the mesh's model-axis
    size) to skip layers whose sharded dimension does not divide evenly.
    Returns ``{dotted_name: PartitionSpec}``."""
    specs = {}
    from ..core import named_modules
    from ..nn import _Sequential

    def divides(dim):
        return model is None or dim % model == 0

    for mname, m in named_modules(module):
        prefix = f"{mname}." if mname else ""
        if isinstance(m, (Linear, MaskedLinear)) and m.weight.ndim == 3:
            # stacked operators: shard the stack dim
            specs[f"{prefix}weight"] = P("model", None, None)
            if m.bias is not None:
                specs[f"{prefix}bias"] = P("model", None)
            continue
        if not isinstance(m, _Sequential):
            continue
        linears = [
            (i, layer)
            for i, layer in enumerate(m.layers)
            if isinstance(layer, (Linear, MaskedLinear))
            and layer.weight.ndim == 2
        ]
        if len(linears) < 2:
            continue
        col = True  # column-split first, then row-split, alternating
        for i, lin in linears[:-1]:  # final layer replicated
            p = f"{prefix}layers.{i}."
            if col and divides(lin.weight.shape[0]):
                specs[p + "weight"] = P("model", None)
                if lin.bias is not None:
                    specs[p + "bias"] = P("model")
                if isinstance(lin, MaskedLinear):
                    specs[p + "mask"] = P("model", None)
            elif not col and divides(lin.weight.shape[1]):
                specs[p + "weight"] = P(None, "model")
                if isinstance(lin, MaskedLinear):
                    specs[p + "mask"] = P(None, "model")
            col = not col
    return specs


# Structure key -> jitted fn. Keyed on (mesh, params treedef, leaf
# shapes/dtypes, has_c): Module statics flatten into content-hashable aux
# data (core._freeze) and jax.sharding.Mesh hashes by content, so a server
# that REBUILDS the flow per request (e.g. after serial.load_params) still
# hits the compiled program — the original id()-keyed memo retraced every
# call in that pattern, the exact 0.03M-rows/s failure the cache exists to
# fix. Flows whose statics contain unhashable objects (e.g. per-instance
# lambdas) fall back to an identity key, which is never better or worse
# than the old behavior.
_SHARDED_FN_CACHE: dict = {}


def _canon_static(v):
    """Canonical hashable form of a module tree's STATIC content.

    ``functools.partial`` compares by identity, so two structurally
    identical flows have unequal pytree treedefs — the reason the key is
    built here instead of from ``tree_structure``: partials are decomposed
    into (func, args, kwargs). Array leaves reduce to (shape, dtype);
    anything residually unhashable bubbles a TypeError to the caller."""
    import functools as _ft

    from ..core import Module

    if isinstance(v, Module):
        return (
            type(v),
            tuple((k, _canon_static(v.__dict__[k])) for k in sorted(v.__dict__)),
        )
    if isinstance(v, _ft.partial):
        return (
            _ft.partial,
            _canon_static(v.func),
            tuple(_canon_static(a) for a in v.args),
            tuple(sorted((k, _canon_static(u)) for k, u in v.keywords.items())),
        )
    if isinstance(v, (jax.Array, np.ndarray)):
        return (tuple(v.shape), str(v.dtype))
    if isinstance(v, (list, tuple)):
        return (type(v), tuple(_canon_static(u) for u in v))
    if isinstance(v, dict):
        return (dict, tuple((k, _canon_static(v[k])) for k in sorted(v, key=repr)))
    if isinstance(v, (set, frozenset)):
        return (set, frozenset(_canon_static(u) for u in v))
    return v


def _structure_cache_key(mesh: Mesh, params, extra):
    """Content-based cache key for the sharded serving programs: the mesh
    (hashes by content), a canonical freeze of the params module tree
    (statics by value, arrays by shape/dtype — see :func:`_canon_static`),
    and ``extra`` (e.g. has_c). Returns None when something in the statics
    is unhashable (e.g. a per-instance lambda)."""
    key = (mesh, _canon_static(params), extra)
    try:
        hash(key)
    except TypeError:
        return None
    return key


def _fused_density_for(flow, c=None):
    """Pick the fused whole-flow density matching ``flow``'s structure —
    the same dispatch order as :func:`zuko_tpu.ops.dispatch.maybe_fused_flow`
    (NSF/NCSF/MAF/SOSPF/BPF, NICE/RealNVP coupling, GF, CNF, NAF/UNAF).
    Returns a ``density(flow, x, c)`` callable; raises FusedStructureError
    when nothing matches."""
    from ..ops.cnf_fused import extract_cnf_params, fused_cnf_log_prob
    from ..ops.gf_fused import extract_gf_params, fused_gf_log_prob
    from ..ops.naf_fused import extract_naf_params, fused_naf_log_prob
    from ..ops.nsf_fused import (
        FusedStructureError,
        extract_coupling_params,
        extract_nsf_params,
        fused_nice_log_prob,
        fused_nsf_log_prob,
    )

    try:
        extract_nsf_params(flow)
    except FusedStructureError:
        pass
    else:
        return lambda f, x, c: fused_nsf_log_prob(f, x, c)
    try:
        extract_coupling_params(flow)
    except FusedStructureError:
        pass
    else:
        return lambda f, x, c: fused_nice_log_prob(f, x, c)
    try:
        extract_gf_params(flow, c)
    except FusedStructureError:
        pass
    else:
        return lambda f, x, c: fused_gf_log_prob(f, x, c)
    try:
        extract_cnf_params(flow, flow.transform(c), c)
    except FusedStructureError:
        pass
    else:
        return lambda f, x, c: fused_cnf_log_prob(f, f.transform(c), x, c)
    extract_naf_params(flow)
    return lambda f, x, c: fused_naf_log_prob(f, x, c)


def _sharded_log_prob_fn(mesh: Mesh, static, has_c: bool, density):
    """Build the jitted shard_map density program. Parameters ride in as
    jit ARGUMENTS, so repeated serving calls with a cached program hit
    the compiled executable instead of retracing a fresh closure every
    call (the original per-call lambda made every invocation pay a full
    trace — the serving example read 0.03M rows/s where the kernel does
    ~9M). ``density`` is the structure-matched fused kernel from
    :func:`_fused_density_for`."""
    from ..core import combine

    if not has_c:
        def fn(params, xs):
            return density(combine(params, static), xs, None)

        return jax.jit(jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=P("data"),
            check_vma=False,
        ))

    def fnc(params, xs, cs):
        return density(combine(params, static), xs, cs)

    return jax.jit(jax.shard_map(
        fnc,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    ))


def sharded_fused_log_prob(mesh: Mesh, flow, x, c=None):
    """Data-parallel fused density for ANY fused-kernel family: the flow's
    structure picks the kernel (exactly like single-chip dispatch,
    :func:`_fused_density_for`) and ``shard_map`` over the ``data`` axis runs
    it independently per chip (a bare ``pallas_call`` under ``jit``
    constrains partitioning; ``shard_map`` makes the per-device shapes
    explicit). Parameters are replicated jit arguments and the compiled
    program is cached per (mesh, structure)."""
    import weakref

    from ..core import partition

    params, static = partition(flow)
    key = _structure_cache_key(mesh, params, c is not None)
    if key is not None:
        fn = _SHARDED_FN_CACHE.get(key)
    else:
        # unhashable statics: identity fallback, weakrefs guard id reuse
        key = (id(mesh), id(flow), c is not None)
        ent = _SHARDED_FN_CACHE.get(key)
        fn = None
        if ent is not None and ent[0]() is mesh and ent[1]() is flow:
            fn = ent[2]
    if fn is None:
        fn = _sharded_log_prob_fn(
            mesh, static, c is not None, _fused_density_for(flow, c)
        )
        if len(_SHARDED_FN_CACHE) >= 64:
            _SHARDED_FN_CACHE.pop(next(iter(_SHARDED_FN_CACHE)))
        _SHARDED_FN_CACHE[key] = (
            fn if isinstance(key[0], Mesh)
            else (weakref.ref(mesh), weakref.ref(flow), fn)
        )
    if c is None:
        return fn(params, x)
    return fn(params, x, c)


def _fused_sampler_fn_for(flow, c, want_log_prob):
    """Pick the fused whole-flow sampler matching ``flow``'s structure:
    NSF/NCSF/MAF sweeps, GF bisection, CNF backward integration, or NAF/UNAF
    monotone-net bisection (log q via the analytic forward ladj at the
    solved point). Raises FusedStructureError when nothing matches.

    The structure probe runs on the CALLER's flow, but the returned
    callable takes the flow (and context) as arguments — so the jitted
    serving program can rebuild it from runtime parameters instead of
    closing over them (closures embed params as MLIR constants AND defeat
    the structure-keyed program cache)."""
    from ..ops.cnf_fused import extract_cnf_params, fused_cnf_sample
    from ..ops.gf_fused import extract_gf_params, fused_gf_sample
    from ..ops.naf_fused import extract_naf_params, fused_naf_sample
    from ..ops.nsf_fused import (
        FusedStructureError,
        extract_nsf_params,
        fused_nsf_sample,
    )

    try:
        extract_nsf_params(flow)
    except FusedStructureError:
        pass
    else:
        return lambda f, k, shape, cc: fused_nsf_sample(
            f, k, shape, c=cc, want_log_prob=want_log_prob
        )
    try:
        extract_gf_params(flow, c)
    except FusedStructureError:
        pass
    else:
        return lambda f, k, shape, cc: fused_gf_sample(
            f, k, shape, c=cc, want_log_prob=want_log_prob
        )
    try:
        extract_cnf_params(flow, flow.transform(c), c)
    except FusedStructureError:
        pass
    else:
        return lambda f, k, shape, cc: fused_cnf_sample(
            f, f.transform(cc), k, shape, c=cc, want_log_prob=want_log_prob
        )
    extract_naf_params(flow)
    return lambda f, k, shape, cc: fused_naf_sample(
        f, k, shape, c=cc, want_log_prob=want_log_prob
    )


def sharded_fused_sample(mesh: Mesh, flow, key, sample_shape, c=None,
                         want_log_prob: bool = False):
    """Sample-parallel fused sampling: each device draws and inverts its
    own shard of the sample axis (no cross-device communication — sampling is
    embarrassingly parallel over draws). The fused sampler is picked by the
    flow's structure (NSF/NCSF/MAF, GF, CNF, NAF/UNAF — see
    :func:`_fused_sampler_fn_for`). Per-device keys are derived with
    :func:`jax.random.fold_in` on the device's ``data``-axis index, so the
    global draw set is deterministic for a given ``key`` and mesh shape.
    With ``want_log_prob`` also returns the per-sample ``log q(x)`` (the
    reverse-KL quantity, reference: zuko/distributions.py:129-138).

    With a BATCHED context ``c (B, ctx)`` the CONTEXT batch shards over
    ``data`` instead: each device draws the full ``sample_shape`` for its
    own context rows (every fused family streams per-row parameters since
    round 5), and the result has the single-device fused semantics
    ``sample_shape + (B,) + event``."""
    import weakref

    from ..core import combine, partition

    d = mesh.shape["data"]
    ctx_sharded = c is not None and jnp.ndim(c) > 1
    if ctx_sharded:
        # batched context: shard the CONTEXT batch over `data` — each
        # device draws the full sample_shape for its own context rows
        # (every fused family streams per-row parameters since round 5)
        if jnp.ndim(c) != 2:
            raise NotImplementedError(
                "sharded_fused_sample supports a single context batch dim "
                f"(B, ctx); got shape {jnp.shape(c)} — flatten the leading "
                "batch dims first"
            )
        B = c.shape[0]
        assert B % d == 0, (
            f"context batch {B} must divide the data axis {d}"
        )
        local = tuple(sample_shape)
    else:
        n = int(np.prod(sample_shape)) if sample_shape else 1
        assert n % d == 0, f"sample count {n} must divide the data axis {d}"
        local = (n // d,)

    # Params ride as jit ARGUMENTS and the compiled program is cached on
    # structure, exactly like the serving density path: the original
    # per-call closure both RETRACED every invocation (a fresh jitted
    # wrapper per call) and embedded the parameters as MLIR constants.
    params, static = partition(flow)
    extra = ("sample", want_log_prob, local, c is not None, ctx_sharded)
    key_s = _structure_cache_key(mesh, params, extra)
    if key_s is not None:
        fn = _SHARDED_FN_CACHE.get(key_s)
    else:
        key_s = (id(mesh), id(flow), extra)
        ent = _SHARDED_FN_CACHE.get(key_s)
        fn = None
        if ent is not None and ent[0]() is mesh and ent[1]() is flow:
            fn = ent[2]
    if fn is None:
        sampler = _fused_sampler_fn_for(flow, c, want_log_prob)
        if ctx_sharded:
            # outputs carry sample dims first, then the (sharded) context
            # rows: x is sample_shape + (B/d, F), log q sample_shape + (B/d,)
            nsd = len(local)
            x_spec = P(*([None] * nsd), "data")
            l_spec = P(*([None] * nsd), "data")
            out_specs = (x_spec, l_spec) if want_log_prob else x_spec
            in_specs = (P(), P(), P("data"))

            def draw(params, key, cc):
                idx = jax.lax.axis_index("data")
                f = combine(params, static)
                # each device derives its own key so the GLOBAL draw set is
                # deterministic for a given key and mesh shape (matching
                # the sample-sharded variant's convention); draws therefore
                # differ from the single-device sampler's for the same key
                return sampler(f, jax.random.fold_in(key, idx), local, cc)
        else:
            out_specs = (P("data"), P("data")) if want_log_prob else P("data")
            in_specs = (P(), P()) + ((P(),) if c is not None else ())

            def draw(params, key, *cargs):
                idx = jax.lax.axis_index("data")
                f = combine(params, static)
                cc = cargs[0] if cargs else None
                return sampler(f, jax.random.fold_in(key, idx), local, cc)

        # jit the wrapper: an eagerly-called shard_map executes the body op
        # by op across the mesh (measured ~100x the jitted wall time)
        fn = jax.jit(jax.shard_map(
            draw, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ))
        if len(_SHARDED_FN_CACHE) >= 64:
            _SHARDED_FN_CACHE.pop(next(iter(_SHARDED_FN_CACHE)))
        _SHARDED_FN_CACHE[key_s] = (
            fn if isinstance(key_s[0], Mesh)
            else (weakref.ref(mesh), weakref.ref(flow), fn)
        )
    out = fn(params, key) if c is None else fn(params, key, c)
    if ctx_sharded:  # already sample_shape + (B,) + event
        return out
    shape = tuple(sample_shape)
    if want_log_prob:
        x, lp = out
        return x.reshape(shape + x.shape[-1:]), lp.reshape(shape)
    return out.reshape(shape + out.shape[-1:])


def shard_module(mesh: Mesh, module: Any, specs: Optional[dict] = None):
    """Place a module's arrays on the mesh: leaves named in ``specs`` get the
    given PartitionSpec, everything else is replicated."""
    specs = {} if specs is None else specs
    updates = {}
    for name, leaf in named_parameters(module, buffers=True):
        if leaf is None or not isinstance(leaf, (jax.Array, np.ndarray)):
            continue
        spec = specs.get(name, P())
        updates[name] = jax.device_put(
            jnp.asarray(leaf), NamedSharding(mesh, spec)
        )
    return update_parameters(module, updates)
