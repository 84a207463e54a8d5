r"""On-hardware validation batch 44: NCSF (circular splines, BoxUniform
base) at the CURRENT defaults — the presplit-cat/split3 density path and
premask sampling changed since NCSF's last hardware validation (r4-era).
Density + sampling + log q vs the CPU reference."""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NCSF

cpu = jax.devices("cpu")[0]
ks = jax.random.PRNGKey(7)
flow = NCSF(5, transforms=3, key=jax.random.PRNGKey(0))
x = jax.random.uniform(
    jax.random.PRNGKey(1), (4096, 5), minval=-3.0, maxval=3.0)

lp_t = np.asarray(jax.jit(lambda v: flow(None).log_prob(v))(x))
with jax.default_device(cpu):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    lp_c = np.asarray(flow(None).log_prob(jax.device_put(x, cpu)))
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
d = np.abs(lp_t - lp_c)
print(f"NCSF density vs CPU: max {d.max():.3e} median {np.median(d):.3e}",
      flush=True)

s = jax.jit(lambda k: flow(None).sample(k, (4096,)))(ks)
with jax.default_device(cpu):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    s_c = np.asarray(flow(None).sample(ks, (4096,)))
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
ds = np.abs(np.asarray(s) - s_c)
print(f"NCSF sample vs CPU: max {ds.max():.3e} p99"
      f" {np.quantile(ds, 0.99):.3e}", flush=True)

xs, lq = jax.jit(
    lambda k: flow(None).sample_and_log_prob(k, (4096,)))(ks)
lp = jax.jit(lambda v: flow(None).log_prob(v))(xs)
e = np.abs(np.asarray(lq, np.float64) - np.asarray(lp, np.float64))
print(f"NCSF logq self-consistency: max {e.max():.3e} median"
      f" {np.median(e):.3e}", flush=True)

print("DONE", flush=True)


# seam check: deviant samples should differ by exactly 2*pi (same point
# on the circle, opposite wrap branch)
import math
big = ds > 1.0
if big.any():
    dev = ds[big]
    off = np.abs(dev - 2 * math.pi)
    print(f"seam check: {int(big.sum())} wrapped points, "
          f"|dev - 2pi| max {off.max():.3e}", flush=True)
