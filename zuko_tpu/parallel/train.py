r"""Training harness: MLE and reverse-KL variational inference.

The reference keeps training in tutorial notebooks
(docs/tutorials/forward_kl.ipynb cell 9, reverse_kl.ipynb cell 9); here it is
a library component. Each step is one jitted XLA program: with batch inputs
sharded over the mesh's ``data`` axis and parameters replicated, XLA inserts
the psum over grads at the ``mean`` reduction — the collective rides ICI.
"""

from __future__ import annotations

import time

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

try:
    import optax
except ImportError:  # pragma: no cover
    optax = None

from ..core import combine, partition

__all__ = ["TrainState", "make_mle_step", "make_reverse_kl_step", "train_mle"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def _default_optimizer(lr):
    assert optax is not None, "optax is required for the training harness"
    return optax.adam(lr)


def make_mle_step(
    static: Any,
    optimizer=None,
    lr: float = 1e-3,
    conditional: bool = True,
):
    r"""Build ``init_fn, step_fn`` for forward-KL maximum likelihood:
    ``loss = -mean log p(x | c)`` (reference training loop:
    docs/tutorials/forward_kl.ipynb cell 9).

    ``static`` is the frozen half from :func:`zuko_tpu.partition`; the step is
    jitted and **donates the incoming state** (do not reuse it after the
    call). Shard ``x``/``c`` over the mesh's ``data`` axis for data
    parallelism.
    """
    optimizer = optimizer or _default_optimizer(lr)

    def init_fn(params) -> TrainState:
        return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    def loss_fn(params, x, c):
        flow = combine(params, static)
        return -jnp.mean(flow(c).log_prob(x))

    @partial(jax.jit, donate_argnums=0)
    def step_fn(state: TrainState, x, c=None):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x, c)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return init_fn, step_fn


def make_reverse_kl_step(
    static: Any,
    log_energy: Callable,
    n_samples: int = 256,
    optimizer=None,
    lr: float = 1e-3,
    mesh=None,
):
    r"""Build ``init_fn, step_fn`` for reverse-KL variational inference:
    ``loss = E_q[log q(x)] - E_q[log energy(x)]`` using the fused
    ``rsample_and_log_prob`` (reference: zuko/distributions.py:129-138 and
    docs/tutorials/reverse_kl.ipynb cell 9). The step is jitted and **donates
    the incoming state**.

    With ``mesh``, the **sample axis shards over the mesh's ``data`` axis**:
    each device derives its own key with ``fold_in`` on its axis index and
    draws ``n_samples // data`` samples locally (sampling is embarrassingly
    parallel), the loss mean is a ``pmean`` over the axis, and the psum over
    parameter gradients appears at the ``shard_map`` transpose — the same
    collective placement as data-parallel MLE. The global draw set is
    deterministic for a given key and mesh shape.
    """
    optimizer = optimizer or _default_optimizer(lr)

    def init_fn(params) -> TrainState:
        return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    if mesh is None:
        def loss_fn(params, key):
            flow = combine(params, static)
            x, log_q = flow(None).rsample_and_log_prob(key, (n_samples,))
            return jnp.mean(log_q) - jnp.mean(log_energy(x))
    else:
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.shape["data"]
        assert n_samples % n_dev == 0, (
            f"n_samples {n_samples} must divide the data axis ({n_dev})"
        )
        local_n = n_samples // n_dev

        def _local_loss(params, key):
            idx = jax.lax.axis_index("data")
            flow = combine(params, static)
            x, log_q = flow(None).rsample_and_log_prob(
                jax.random.fold_in(key, idx), (local_n,)
            )
            local = jnp.mean(log_q) - jnp.mean(log_energy(x))
            return jax.lax.pmean(local, "data")

        loss_fn = jax.shard_map(
            _local_loss,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=P(),
            check_vma=False,
        )

    @partial(jax.jit, donate_argnums=0)
    def step_fn(state: TrainState, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return init_fn, step_fn


def train_mle(
    flow,
    data,
    context=None,
    epochs: int = 8,
    batch_size: int = 64,
    lr: float = 1e-3,
    key: jax.Array = None,
    mesh=None,
    verbose: bool = False,
    callback: Optional[Callable[[dict], None]] = None,
):
    r"""Reference-parity MLE loop (Adam, shuffled minibatches — the tutorial
    recipe, docs/tutorials/forward_kl.ipynb cell 9).

    TPU-first structure: the dataset lives on device and a whole epoch is ONE
    jitted ``lax.scan`` over shuffled minibatches — no per-step host↔device
    round-trips (which dominate wall-clock through a tunneled chip). With
    ``mesh``, dataset rows are sharded over the ``data`` axis and every
    minibatch's batch dimension carries a sharding constraint, so the
    per-example log_prob work splits across chips and XLA inserts the grad
    psum at the ``mean`` — real data parallelism, parameters replicated.

    ``callback``, if given, is invoked once per optimizer step (host-side,
    after each epoch's scan completes) with a metrics dict:
    ``{step, epoch, loss, grad_norm, examples_per_s}``.

    Returns ``(trained_flow, per-epoch mean losses)``.
    """
    import numpy as np

    key = jax.random.PRNGKey(0) if key is None else key
    params, static = partition(flow)
    # The scanned epoch donates its state; copy the params so the donation
    # consumes fresh buffers and the caller's ``flow`` stays alive.
    params = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)
    optimizer = _default_optimizer(lr)
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    data = jnp.asarray(np.asarray(data))
    ctx = None if context is None else jnp.asarray(np.asarray(context))
    batch_spec = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .mesh import replicate, shard_batch

        n_data = mesh.shape["data"]
        assert batch_size % n_data == 0, (
            f"batch_size {batch_size} must divide over the data axis ({n_data})"
        )
        data = shard_batch(mesh, data)
        state = replicate(mesh, state)
        if ctx is not None:
            ctx = shard_batch(mesh, ctx)
        # (n_batches, batch_size, ...) minibatch stacks: shard the batch dim.
        batch_spec = lambda a: NamedSharding(  # noqa: E731
            mesh, P(None, "data", *([None] * (a.ndim - 2)))
        )

    n = data.shape[0]
    n_batches = n // batch_size

    def loss_fn(params, x, c):
        model = combine(params, static)
        return -jnp.mean(model(c).log_prob(x))

    @partial(jax.jit, donate_argnums=0)
    def epoch_fn(state: TrainState, perm):
        xs = data[perm[: n_batches * batch_size]].reshape(
            (n_batches, batch_size) + data.shape[1:]
        )
        if batch_spec is not None:
            xs = jax.lax.with_sharding_constraint(xs, batch_spec(xs))
        if ctx is not None:
            cs = ctx[perm[: n_batches * batch_size]].reshape(
                (n_batches, batch_size) + ctx.shape[1:]
            )
            if batch_spec is not None:
                cs = jax.lax.with_sharding_constraint(cs, batch_spec(cs))
        else:
            cs = None

        def body(state, batch):
            x = batch if cs is None else batch[0]
            c = None if cs is None else batch[1]
            loss, grads = jax.value_and_grad(loss_fn)(state.params, x, c)
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            new = TrainState(
                optax.apply_updates(state.params, updates),
                opt_state,
                state.step + 1,
            )
            return new, (loss, gnorm)

        batches = xs if cs is None else (xs, cs)
        state, (losses, gnorms) = jax.lax.scan(body, state, batches)
        return state, losses, gnorms

    losses = []
    step = 0
    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, n)
        t0 = time.perf_counter()
        state, epoch_losses, epoch_gnorms = epoch_fn(state, perm)
        epoch_losses = np.asarray(epoch_losses)
        dt = time.perf_counter() - t0
        losses.append(float(epoch_losses.mean()))
        if callback is not None:
            epoch_gnorms = np.asarray(epoch_gnorms)
            eps = n_batches * batch_size / max(dt, 1e-9)
            for i in range(n_batches):
                step += 1
                callback({
                    "step": step,
                    "epoch": epoch,
                    "loss": float(epoch_losses[i]),
                    "grad_norm": float(epoch_gnorms[i]),
                    "examples_per_s": eps,
                })
        if verbose:
            print(
                f"epoch {epoch}: loss {losses[-1]:.4f} ± {epoch_losses.std():.3f}"
            )

    return combine(state.params, static), losses
