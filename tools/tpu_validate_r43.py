r"""On-hardware validation batch 43: GF chunked custom-VJP backward —
gradient parity at b=65536 vs CPU (mirrors r42 for the NSF family)."""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, named_parameters, partition
from zuko_tpu.flows import GF

cpu = jax.devices("cpu")[0]
gf = GF(6, transforms=3, key=jax.random.PRNGKey(0))
pg, sg = partition(gf)
pg = jtu.tree_map(lambda a: a * 0.3, pg)
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))


def loss(p, xv):
    return -jnp.mean(combine(p, sg)(None).log_prob(xv))


g_tpu = jax.jit(jax.grad(loss))(pg, x)
pg_cpu = jtu.tree_map(lambda a: jax.device_put(a, cpu), pg)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
with jax.default_device(cpu):
    g_cpu = jax.grad(loss)(pg_cpu, jax.device_put(x, cpu))
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
worst = 0.0
for (n, a), (_, b) in zip(named_parameters(g_tpu), named_parameters(g_cpu)):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    worst = max(worst, float(np.abs(a - b).max() / (np.abs(b).max() + 1e-6)))
print(f"GF chunked-bwd grad vs CPU: worst rel {worst:.3e}", flush=True)
print("DONE", flush=True)
