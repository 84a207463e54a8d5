r"""On-hardware validation batch 19: arbitrate the D=43/b=16384
discrepancy (r18: fused-vs-XLA median error 21, identical with feature
padding on/off — suggesting the error is NOT in the fused kernel).
Compute CPU f64 ground truth through the fallback math, then compare
BOTH TPU paths against it at the failing batch size."""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

D, T, HID, B = 43, 3, (64, 64), 16384
flow = NSF(D, transforms=T, hidden_features=HID, key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(3), (B, D))
SUB = 4096

# ---- CPU f64 truth through the fallback math ------------------------
cpu = jax.devices("cpu")[0]
fp, layout, cfg = nf._flatten_flow(flow)
fp64 = [jax.device_put(np.asarray(p, np.float64), cpu) for p in fp]
x64 = jax.device_put(np.asarray(x[:SUB], np.float64), cpu)
with jax.default_device(cpu):
    lp64 = np.asarray(
        nf._full_math_T(
            x64.T, fp64, layout, D, cfg["bins"], cfg["bound"], cfg["slope"],
            None, univ=cfg["univ"], base=cfg["base"],
        )[0, :],
        np.float64,
    )
print("truth computed:", lp64[:3], flush=True)

# ---- TPU paths at the failing batch ---------------------------------
lp_fused = np.asarray(
    jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(x), np.float64)[:SUB]
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
lp_xla = np.asarray(
    jax.jit(lambda v: flow(None).log_prob(v))(x), np.float64)[:SUB]
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

for name, lp in [("fused(pad)", lp_fused), ("xla", lp_xla)]:
    d = np.abs(lp - lp64)
    print(f"{name} vs f64 truth: max {d.max():.3e} median"
          f" {np.median(d):.3e} frac>1 {float((d > 1).mean()):.3f}",
          flush=True)

# XLA path at the SMALL batch for the same points (grid-size control)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
lp_xla_small = np.asarray(
    jax.jit(lambda v: flow(None).log_prob(v))(x[:SUB]), np.float64)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
d = np.abs(lp_xla_small - lp64)
print(f"xla (batch {SUB}) vs truth: max {d.max():.3e} median"
      f" {np.median(d):.3e}", flush=True)
d = np.abs(lp_xla_small - lp_xla)
print(f"xla big-batch vs small-batch same points: max {d.max():.3e}",
      flush=True)

print("DONE", flush=True)
