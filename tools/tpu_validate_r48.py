r"""On-hardware validation batch 48: the excess-precision elision fix.
With params as runtime jit ARGUMENTS, XLA (--xla_allow_excess_precision
on this stack) elided the f32->bf16->f32 round-trip in the presplit,
zeroing the low part and silently degrading the args-form density to
1-pass accuracy (1.1e-2 max vs CPU where the closure form reads 1.5e-4).
An optimization_barrier on the hi part restores the split. Checks the
three forms against CPU + the serving path end-to-end."""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF
from zuko_tpu.ops.nsf_fused import fused_nsf_log_prob
from zuko_tpu.parallel import make_mesh, sharded_fused_log_prob

cpu = jax.devices("cpu")[0]
flow = NSF(64, transforms=3, hidden_features=(64, 64),
           key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (1024, 64))

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
with jax.default_device(cpu):
    lp_c = np.asarray(flow(None).log_prob(jax.device_put(x, cpu)))
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

# closure form
lp_cl = np.asarray(jax.jit(lambda v: fused_nsf_log_prob(flow, v))(x))
# args form
params, static = partition(flow)
lp_ar = np.asarray(jax.jit(
    lambda p, v: fused_nsf_log_prob(combine(p, static), v))(params, x))
# sharded (args under shard_map)
mesh = make_mesh(model=1)
lp_sh = np.asarray(sharded_fused_log_prob(mesh, flow, x))

for name, lp in [("closure", lp_cl), ("args   ", lp_ar),
                 ("sharded", lp_sh)]:
    d = np.abs(lp - lp_c)
    print(f"{name} vs CPU: max {d.max():.3e} median {np.median(d):.3e}",
          flush=True)

print("DONE", flush=True)
