r"""Training harness: MLE and reverse-KL variational inference.

The reference keeps training in tutorial notebooks
(docs/tutorials/forward_kl.ipynb cell 9, reverse_kl.ipynb cell 9); here it is
a library component. Each step is one jitted XLA program: with batch inputs
sharded over the mesh's ``data`` axis and parameters replicated, XLA inserts
the psum over grads at the ``mean`` reduction — the collective rides ICI.
"""

from __future__ import annotations

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
    jitted and donates params/opt_state. Shard ``x``/``c`` over the mesh's
    ``data`` axis for data parallelism.
    """
    optimizer = optimizer or _default_optimizer(lr)

    def init_fn(params) -> TrainState:
        return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    def loss_fn(params, x, c):
        flow = combine(params, static)
        return -jnp.mean(flow(c).log_prob(x))

    @jax.jit
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
):
    r"""Build ``init_fn, step_fn`` for reverse-KL variational inference:
    ``loss = E_q[log q(x)] - E_q[log energy(x)]`` using the fused
    ``rsample_and_log_prob`` (reference: zuko/distributions.py:129-138 and
    docs/tutorials/reverse_kl.ipynb cell 9). The sample axis is the sharded
    axis; feed per-device key batches for pod-scale sampling.
    """
    optimizer = optimizer or _default_optimizer(lr)

    def init_fn(params) -> TrainState:
        return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    def loss_fn(params, key):
        flow = combine(params, static)
        x, log_q = flow(None).rsample_and_log_prob(key, (n_samples,))
        return jnp.mean(log_q) - jnp.mean(log_energy(x))

    @jax.jit
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
):
    r"""Reference-parity MLE loop (Adam, shuffled minibatches — the tutorial
    recipe). Returns ``(trained_flow, per-epoch mean losses)``."""
    import numpy as np

    key = jax.random.PRNGKey(0) if key is None else key
    params, static = partition(flow)
    init_fn, step_fn = make_mle_step(static, lr=lr)
    state = init_fn(params)

    data = np.asarray(data)
    n = data.shape[0]
    losses = []

    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        perm = np.asarray(jax.random.permutation(sub, n))
        epoch_losses = []
        for i in range(0, n - batch_size + 1, batch_size):
            idx = perm[i : i + batch_size]
            x = jnp.asarray(data[idx])
            c = None if context is None else jnp.asarray(np.asarray(context)[idx])
            if mesh is not None:
                from .mesh import shard_batch

                x = shard_batch(mesh, x)
                if c is not None:
                    c = shard_batch(mesh, c)
            state, loss = step_fn(state, x, c)
            epoch_losses.append(float(loss))
        losses.append(float(np.mean(epoch_losses)))
        if verbose:
            print(f"epoch {epoch}: loss {losses[-1]:.4f} ± {np.std(epoch_losses):.3f}")

    return combine(state.params, static), losses
