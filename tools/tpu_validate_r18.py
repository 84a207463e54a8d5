r"""On-hardware validation batch 18: the unaligned-F miscompile and the
feature-padding fix. r16 saw D=43 (transforms=3, h=64x2, batch 16384)
fused density off by ~50 absolute; r17 saw D=43 fine at transforms=2,
h=32x2, batch 2048 (both pre-padding code). Here: (a) reproduce r16's
exact config with _FEATURE_PAD off, twice (flake check) + config bisect,
(b) same configs with the padding fix on, vs CPU-fallback f64-free truth
(XLA-on-TPU only for scale), (c) padded sampling + log q at D=43."""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

ks = jax.random.PRNGKey(7)

CONFIGS = [
    ("r16-repro  D=43 t=3 h=64 b=16384", 43, 3, (64, 64), 16384),
    ("repro-2    D=43 t=3 h=64 b=16384", 43, 3, (64, 64), 16384),
    ("t=2        D=43 t=2 h=64 b=16384", 43, 2, (64, 64), 16384),
    ("h=32       D=43 t=3 h=32 b=16384", 43, 3, (32, 32), 16384),
    ("b=2048     D=43 t=3 h=64 b=2048 ", 43, 3, (64, 64), 2048),
]


def check(label, D, T, hidden, batch):
    flow = NSF(D, transforms=T, hidden_features=hidden,
               key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, D))
    lp_f = np.asarray(
        jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(x), np.float64)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    lp_x = np.asarray(
        jax.jit(lambda v: flow(None).log_prob(v))(x), np.float64)
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
    d = np.abs(lp_f - lp_x)
    frac = float((d > 1.0).mean())
    print(f"{label}: max {d.max():.3e} median {np.median(d):.3e} "
          f"frac>1: {frac:.3f}", flush=True)


print("--- padding OFF (reproduce) ---", flush=True)
nf._FEATURE_PAD = False
for cfg in CONFIGS:
    check(*cfg)

print("--- padding ON (fix) ---", flush=True)
nf._FEATURE_PAD = True
for cfg in CONFIGS[:1] + CONFIGS[2:]:
    check(*cfg)

# padded sampling + reverse-KL self-consistency at D=43
flow = NSF(43, transforms=3, hidden_features=(64, 64),
           key=jax.random.PRNGKey(0))
x, lq = jax.jit(
    lambda k: nf.fused_nsf_sample(flow, k, (4096,), want_log_prob=True)
)(ks)
lp = jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(x)
e = np.abs(np.asarray(lq, np.float64) - np.asarray(lp, np.float64))
print(f"D=43 padded logq vs density: max {e.max():.3e} "
      f"median {np.median(e):.3e}", flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
s_ref = jax.jit(lambda k: flow(None).sample(k, (512,)))(ks)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
s = jax.jit(lambda k: nf.fused_nsf_sample(flow, k, (512,)))(ks)
print(f"D=43 padded sample vs XLA: max {float(jnp.abs(s - s_ref).max()):.3e}",
      flush=True)

print("DONE", flush=True)
