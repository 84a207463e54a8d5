r"""Forward-KL maximum likelihood on two-moons (reference tutorial:
docs/tutorials/forward_kl.ipynb; its saved outputs anchor the parity check:
final-epoch NLL ~= 1.10 unconditional, ~= 0.37 conditional on the moon label).

Run: python examples/forward_kl.py [--conditional]
"""

import argparse
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

from zuko_tpu.data import two_moons
from zuko_tpu.flows import NSF
from zuko_tpu.parallel import train_mle


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conditional", action="store_true")
    parser.add_argument("--epochs", type=int, default=8)
    parser.add_argument("--samples", type=int, default=16384)
    args = parser.parse_args()

    x, y = two_moons(args.samples, seed=0)

    key = jax.random.PRNGKey(0)
    context = 1 if args.conditional else 0
    flow = NSF(2, context, transforms=3, key=key)

    trained, losses = train_mle(
        flow,
        x,
        context=y[:, None] if args.conditional else None,
        epochs=args.epochs,
        batch_size=64,
        lr=1e-3,
        key=key,
        verbose=True,
    )

    print(f"final epoch NLL: {losses[-1]:.4f}")
    print("reference anchor: 1.0958 (unconditional) / 0.3749 (conditional)")


if __name__ == "__main__":
    main()
