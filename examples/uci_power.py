r"""NSF density estimation on UCI POWER (the north-star benchmark config:
D=6, rational-quadratic splines — NSF paper table 1 reports ~ -0.66 nats
test log-likelihood, i.e. NLL ~ -0.66 for POWER).

The real UCI data is not shipped in either repo (zero-egress environment);
without ``--data-path`` this runs on a synthetic surrogate of matched
dimensionality so the full pipeline is exercised and timed. Drop preprocessed
``power_{train,val,test}.npy`` files into a directory and pass it to measure
the real number.

Run: python examples/uci_power.py [--epochs 10] [--data-path DIR]
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
import numpy as np

from zuko_tpu.flows import NSF
from zuko_tpu.parallel import train_mle


def main():
    import os

    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="power",
                        choices=["power", "gas", "hepmass", "miniboone"])
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--transforms", type=int, default=5)
    parser.add_argument("--hidden", type=int, default=256)
    parser.add_argument("--data-path", type=str, default=None)
    args = parser.parse_args()

    from zuko_tpu.data import uci_dataset

    train, val, test = uci_dataset(args.dataset, args.data_path)
    real = args.data_path is not None or os.environ.get("ZUKO_TPU_DATA_DIR")
    if not real:
        print("*** SYNTHETIC SURROGATE — NLLs below are NOT comparable to"
              " published UCI numbers; see zuko_tpu.data._UCI_URL ***")
    print(f"data: {'UCI ' + args.dataset.upper() if real else 'surrogate'} "
          f"train={train.shape} test={test.shape}")

    key = jax.random.PRNGKey(0)
    flow = NSF(
        train.shape[1], 0,
        transforms=args.transforms,
        hidden_features=(args.hidden, args.hidden),
        key=key,
    )

    t0 = time.perf_counter()
    trained, losses = train_mle(
        flow, train,
        epochs=args.epochs, batch_size=args.batch, lr=5e-4, key=key,
        verbose=True,
    )
    wall = time.perf_counter() - t0

    test_nll = -float(jnp.mean(trained(None).log_prob(jnp.asarray(test))))
    val_nll = -float(jnp.mean(trained(None).log_prob(jnp.asarray(val))))
    n_steps = args.epochs * (train.shape[0] // args.batch)
    print(f"val NLL: {val_nll:.4f}  test NLL: {test_nll:.4f}")
    print(f"wall: {wall:.1f}s ({n_steps * args.batch / wall:,.0f} examples/s)")
    if real:
        anchors = {"power": -0.66, "gas": -13.09, "hepmass": 14.01,
                   "miniboone": 9.22}
        print(f"NSF paper reference NLL for {args.dataset.upper()}:"
              f" ~ {anchors[args.dataset]} nats")


if __name__ == "__main__":
    main()
