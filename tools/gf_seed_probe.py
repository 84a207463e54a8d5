r"""GF init-fragility probe: do all 6 init seeds now train on digits?

Round-3 status (PARITY.md): 1/6 seeds diverged to inf by step 3-5 on BOTH
the torch reference and zuko_tpu — the erf-mixture saturation mechanism.
Round 4 replaced the underflowing ladj (``log(sum_i s_i exp(-z_i^2/2))``
flushes to ``log 0 = -inf`` in f32 when every component saturates) with the
log-sum-exp analytic form on both the XLA path
(``GaussianizationTransform.call_and_ladj``) and the fused kernel
(``gf_fused._gauss_mean_F``). This probe re-runs the 6-seed sweep under the
round-3 protocol (digits, T=3, batch 256, Adam 1e-3) and reports
divergence + final val/test NLL per seed.

    python tools/gf_seed_probe.py --cpu --epochs 30     # CPU f32
    python tools/gf_seed_probe.py --epochs 30           # tunneled TPU
"""
import argparse
import os
import sys
import time

sys.path.insert(0, ".")

p = argparse.ArgumentParser()
p.add_argument("--epochs", type=int, default=30)
p.add_argument("--seeds", type=int, default=6)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("ZUKO_TPU_FUSED_DISPATCH", "auto")

import jax
import jax.numpy as jnp
import numpy as np

from zuko_tpu import flows
from zuko_tpu.data import digits_dataset
from zuko_tpu.parallel.train import train_mle

print("backend:", jax.default_backend(), flush=True)
train, val, test = digits_dataset()
D = train.shape[1]
BATCH, LR, T = 256, 1e-3, 3
print(f"digits: train {train.shape}  epochs {args.epochs}", flush=True)

ok = 0
for seed in range(args.seeds):
    flow = flows.GF(D, transforms=T, key=jax.random.PRNGKey(seed))
    t0 = time.perf_counter()
    trained, losses = train_mle(
        flow, train, epochs=args.epochs, batch_size=BATCH, lr=LR,
        key=jax.random.PRNGKey(1),
    )
    dt = time.perf_counter() - t0
    losses = np.asarray(losses)
    finite = bool(np.isfinite(losses).all())
    if finite:
        v = float(-jax.jit(lambda u: trained(None).log_prob(u).mean())(val))
        t = float(-jax.jit(lambda u: trained(None).log_prob(u).mean())(test))
        ok += 1
        print(f"seed {seed}: TRAINED  val NLL {v:.3f}  test NLL {t:.3f}  "
              f"final epoch loss {losses[-1]:.3f}  ({dt:.0f}s)", flush=True)
    else:
        bad = int(np.argmax(~np.isfinite(losses)))
        print(f"seed {seed}: DIVERGED at epoch {bad} "
              f"(losses {losses[max(0,bad-2):bad+1]})  ({dt:.0f}s)", flush=True)

print(f"{ok}/{args.seeds} seeds trained", flush=True)
