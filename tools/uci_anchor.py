r"""One-command UCI test-NLL re-measure — the north-star parity anchor.

The moment real UCI data exists (zero egress blocks the download here), this
re-measures the NSF test NLL against the published numbers (the NSF paper,
linked at /root/reference/README.md:88 — test log-likelihoods in nats:
POWER 0.66, GAS 13.09, HEPMASS -14.01, MINIBOONE -9.22; NLL = -LL):

    ZUKO_TPU_DATA_DIR=/path/to/maf_data python tools/uci_anchor.py power

Accepts either the MAF archive layout (``{dir}/{name}/data.npy``,
``gas/ethylene_CO.pickle``, ``hepmass/1000_{train,test}.csv`` — the
``data.tar.gz`` from https://zenodo.org/record/1161203, optionally still
under its ``data/`` root) or pre-split ``{name}_{train,val,test}.npy``
files; preprocessing is the standard MAF recipe (zuko_tpu/data.py).

Without real data it REFUSES to print an anchor number (surrogate NLLs are
not comparable) unless --allow-surrogate is passed for a pipeline dry run.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# published NSF-paper test log-likelihoods (nats); NLL anchor = -LL
PAPER_LL = {"power": 0.66, "gas": 13.09, "hepmass": -14.01, "miniboone": -9.22}

p = argparse.ArgumentParser()
p.add_argument("dataset", choices=sorted(PAPER_LL))
p.add_argument("--data-dir", default=None,
               help="defaults to $ZUKO_TPU_DATA_DIR")
p.add_argument("--epochs", type=int, default=50)
p.add_argument("--batch", type=int, default=512)
p.add_argument("--lr", type=float, default=5e-4)
p.add_argument("--transforms", type=int, default=10)
p.add_argument("--hidden", type=int, nargs="*", default=[256, 256])
p.add_argument("--bins", type=int, default=8)
p.add_argument("--allow-surrogate", action="store_true",
               help="run the pipeline on the synthetic surrogate (NLL NOT "
                    "comparable to published numbers)")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from zuko_tpu.data import uci_dataset
from zuko_tpu.flows import NSF
from zuko_tpu.parallel import train_mle

data_dir = args.data_dir or os.environ.get("ZUKO_TPU_DATA_DIR")
if data_dir is None and not args.allow_surrogate:
    print(
        "No real data: set ZUKO_TPU_DATA_DIR (or --data-dir) to the MAF "
        "archive (data.tar.gz from https://zenodo.org/record/1161203). "
        "Pass --allow-surrogate for a pipeline dry run whose NLL is NOT "
        "comparable to published numbers.", file=sys.stderr,
    )
    raise SystemExit(2)

train, val, test = uci_dataset(args.dataset, data_dir)
real = data_dir is not None
D = train.shape[1]
print(f"{args.dataset}: train {train.shape} val {val.shape} test "
      f"{test.shape} ({'REAL' if real else 'SURROGATE'})", flush=True)
print("backend:", jax.default_backend(), flush=True)

flow = NSF(
    D, 0, transforms=args.transforms, hidden_features=tuple(args.hidden),
    bins=args.bins, key=jax.random.PRNGKey(0),
)

t0 = time.perf_counter()
flow, losses = train_mle(
    flow, train, epochs=args.epochs, batch_size=args.batch, lr=args.lr,
    key=jax.random.PRNGKey(1), verbose=True,
)
dt = time.perf_counter() - t0


def nll(x, chunk=65536):
    tot, n = 0.0, 0
    for i in range(0, x.shape[0], chunk):
        lp = flow(None).log_prob(jnp.asarray(x[i : i + chunk]))
        tot += float(jnp.sum(lp))
        n += x.shape[0] - i if i + chunk > x.shape[0] else chunk
    return -tot / n


val_nll, test_nll = nll(val), nll(test)
print(f"train {dt:.0f}s   val NLL {val_nll:.3f}   test NLL {test_nll:.3f}",
      flush=True)
if real:
    anchor = -PAPER_LL[args.dataset]
    print(f"published NSF anchor (NLL): {anchor:.2f}   "
          f"delta: {test_nll - anchor:+.3f} nats", flush=True)
else:
    print("SURROGATE RUN — NLL not comparable to published numbers",
          flush=True)
