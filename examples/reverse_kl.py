r"""Reverse-KL variational inference on a ring energy (reference tutorial:
docs/tutorials/reverse_kl.ipynb; final-epoch loss anchor ~= -1.59).

The flow is pre-inverted (``Flow(flow.transform.inv, flow.base)``) so the
sampling direction is the cheap forward pass — the reference's trick
(zuko/lazy.py:81-98).

Run: python examples/reverse_kl.py
"""

import sys

sys.path.insert(0, ".")

import jax

# honor an explicit JAX_PLATFORMS request: this environment pre-imports
# jax from sitecustomize, which freezes platform selection before the env
# var can act — re-assert it so `JAX_PLATFORMS=cpu python examples/...`
# (the documented invocation) actually runs on CPU
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from zuko_tpu.core import combine, partition
from zuko_tpu.data import ring_energy
from zuko_tpu.flows import NSF, Flow
from zuko_tpu.parallel import make_reverse_kl_step


def main():
    key = jax.random.PRNGKey(0)
    flow = NSF(2, 0, transforms=3, key=key)
    inv = Flow(flow.transform.inv, flow.base)

    params, static = partition(inv)
    init_fn, step_fn = make_reverse_kl_step(
        static, ring_energy, n_samples=256, lr=1e-3
    )
    state = init_fn(params)

    steps_per_epoch, epochs = 256, 8

    @jax.jit
    def epoch_fn(state, key):
        keys = jax.random.split(key, steps_per_epoch)
        return jax.lax.scan(step_fn, state, keys)

    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        state, losses = epoch_fn(state, sub)
        losses = np.asarray(losses)
        print(f"epoch {epoch}: loss {losses.mean():.4f} ± {losses.std():.3f}")

    print("reference anchor: -1.5888 ± 0.018")


if __name__ == "__main__":
    main()
