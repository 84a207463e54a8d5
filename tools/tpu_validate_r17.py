r"""On-hardware validation batch 17: map the Mosaic miscompile boundary
found in r16 (D=43 fused density wrong by ~50 absolute on hardware while
interpret mode matches the fallback to 3e-5 — kernel logic is right, the
lowering is not). Probe feature counts around sublane (8) alignment:
D in {6, 7, 9, 12, 16, 21, 24, 43, 48} vs the XLA path."""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

for D in [6, 7, 9, 12, 16, 21, 24, 43, 48]:
    flow = NSF(D, transforms=2, hidden_features=(32, 32),
               key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2048, D))
    try:
        lp_f = np.asarray(
            jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(x), np.float64)
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
        lp_x = np.asarray(
            jax.jit(lambda v: flow(None).log_prob(v))(x), np.float64)
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
        d = np.abs(lp_f - lp_x)
        print(f"D={D:2d}: max {d.max():.3e} median {np.median(d):.3e}",
              flush=True)
    except Exception as e:
        print(f"D={D:2d}: FAILED {e}", flush=True)

print("DONE", flush=True)
