r"""NSF density estimation on REAL data: the UCI handwritten-digits set
(shipped inside scikit-learn — the one real density benchmark available
offline). 1797 scanned 8x8 images, integer pixel counts, given the
standard MAF-style tabular treatment (dequantize, 80/10/10 split,
z-score) by ``zuko_tpu.data.digits_dataset``.

Reference protocol head-to-head (``tools/real_data_parity.py``): the same
config trained with probabilists/zuko on torch CPU reaches test NLL
45.76; this reaches 45.81 — agreement to 0.05 nats through entirely
different code paths, with ~50x faster training (scanned-epoch jit loop).

Run: python examples/uci_digits.py [--epochs 30]
"""

import argparse
import sys
import time

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

from zuko_tpu.data import digits_dataset
from zuko_tpu.flows import NSF
from zuko_tpu.parallel import train_mle


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--transforms", type=int, default=3)
    args = parser.parse_args()

    train, val, test = digits_dataset()
    D = train.shape[1]
    print(f"digits: train {train.shape} val {val.shape} test {test.shape}")

    flow = NSF(D, transforms=args.transforms, hidden_features=(64, 64),
               key=jax.random.PRNGKey(0))

    t0 = time.perf_counter()
    flow, losses = train_mle(
        flow, train, epochs=args.epochs, batch_size=args.batch, lr=1e-3,
        key=jax.random.PRNGKey(1),
    )
    dt = time.perf_counter() - t0

    nll = jax.jit(lambda v: -flow(None).log_prob(v).mean())
    print(f"val NLL  {float(nll(jnp.asarray(val))):.3f}")
    print(f"test NLL {float(nll(jnp.asarray(test))):.3f}  "
          f"(reference-protocol torch-CPU anchor: 45.757; {dt:.0f}s train)")


if __name__ == "__main__":
    main()
