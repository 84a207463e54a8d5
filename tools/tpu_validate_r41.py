r"""On-hardware validation batch 41: is the NICE/RealNVP fused-dispatch
density (jnp `_coupling_math_T`, NOT a Pallas kernel, NOT row-chunked)
exposed to the big-batch XLA miscompile class? D=43 coupling flow at
b in {2048, 65536} vs CPU."""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NICE

cpu = jax.devices("cpu")[0]
flow = NICE(43, transforms=3, hidden_features=(64, 64),
            key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 43))
with jax.default_device(cpu):
    lp_c = np.asarray(flow(None).log_prob(jax.device_put(x[:2048], cpu)))

for b in [2048, 65536]:
    lp_t = np.asarray(
        jax.jit(lambda v: flow(None).log_prob(v))(x[:b]))[:2048]
    d = np.abs(lp_t - lp_c)
    print(f"NICE D=43 b={b}: max {d.max():.3e} median {np.median(d):.3e}"
          f" frac>1 {float((d > 1).mean()):.3f}", flush=True)

# and the regular (dispatch-off) NICE path, which IS chunked
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
lp_t = np.asarray(jax.jit(lambda v: flow(None).log_prob(v))(x))[:2048]
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
d = np.abs(lp_t - lp_c)
print(f"NICE regular path b=65536: max {d.max():.3e} median"
      f" {np.median(d):.3e}", flush=True)

print("DONE", flush=True)
