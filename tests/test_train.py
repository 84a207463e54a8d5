r"""Training harness tests: MLE convergence on two-moons and reverse-KL VI on
the ring energy (the reference tutorial tasks, as library code)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zuko_tpu.core import combine, partition
from zuko_tpu.data import ring_energy, two_moons
from zuko_tpu.flows import Flow, MAF
from zuko_tpu.parallel import make_reverse_kl_step, train_mle


def test_mle_two_moons(key):
    x, y = two_moons(512, seed=0)
    flow = MAF(2, transforms=3, key=key)

    trained, losses = train_mle(flow, x, epochs=3, batch_size=64, lr=1e-2, key=key)
    assert losses[-1] < losses[0] - 0.3, losses
    assert np.isfinite(losses).all()

    lp = trained(None).log_prob(jnp.asarray(x))
    assert jnp.all(jnp.isfinite(lp))


def test_mle_conditional(key):
    x, y = two_moons(512, seed=0)
    flow = MAF(2, context=1, transforms=3, key=key)

    trained, losses = train_mle(
        flow, x, context=y[:, None], epochs=3, batch_size=64, lr=1e-2, key=key
    )
    assert losses[-1] < losses[0] - 0.3, losses


def test_reverse_kl_ring(key):
    flow = MAF(2, transforms=3, key=key)
    # invert for cheap sampling (reference: reverse_kl.ipynb cell 7)
    inv = Flow(flow.transform.inv, flow.base)
    params, static = partition(inv)

    init_fn, step_fn = make_reverse_kl_step(
        static, ring_energy, n_samples=128, lr=1e-2
    )
    state = init_fn(params)

    first = None
    for i in range(30):
        key, sub = jax.random.split(key)
        state, loss = step_fn(state, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < first, (first, float(loss))
