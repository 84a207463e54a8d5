r"""Neural circular spline flow on toroidal data (reference capability:
zuko/flows/spline.py:75-117 — NCSF with a BoxUniform base on [-pi, pi]).

Trains NCSF on a bimodal von-Mises-like angular distribution and checks that
samples stay inside the circular domain.

Run: python examples/ncsf_circular.py
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

from zuko_tpu.flows import NCSF
from zuko_tpu.parallel import train_mle


def angular_data(n, seed=0):
    rng = np.random.RandomState(seed)
    which = rng.rand(n, 2) < 0.5
    centers = np.where(which, -np.pi / 2, np.pi / 2)
    x = centers + 0.5 * rng.randn(n, 2)
    # wrap into [-pi, pi)
    return ((x + np.pi) % (2 * np.pi) - np.pi).astype(np.float32)


def main():
    x = angular_data(16384)
    flow = NCSF(2, transforms=3, key=jax.random.PRNGKey(0))

    trained, losses = train_mle(
        flow, x, epochs=5, batch_size=256, lr=1e-3, verbose=True
    )

    s = trained(None).sample(jax.random.PRNGKey(1), (4096,))
    inside = float(jnp.mean((jnp.abs(s) <= np.pi + 1e-4).all(axis=-1)))
    print(f"samples inside [-pi, pi]^2: {100 * inside:.1f}%")
    lp = trained(None).log_prob(jnp.asarray(x[:1024]))
    print(f"mean log-likelihood: {float(lp.mean()):.3f}")


if __name__ == "__main__":
    main()
