r"""On-hardware validation batch 32: training gradients at production
batch sizes. The fused custom-VJP backward differentiates `_full_math_T`
via XLA in ONE program at the full training batch — verified correct at
b=16384 (r20/r21); the headline train step runs b=65536, and the XLA
miscompile story demands direct verification there, for the flagship
D=6 and the adversarial D=43."""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, named_parameters, partition
from zuko_tpu.flows import NSF

cpu = jax.devices("cpu")[0]
import os

for D, B in [(6, 65536), (43, 65536)]:
    flow = NSF(D, transforms=3, hidden_features=(64, 64),
               key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(3), (B, D))
    params, static = partition(flow)

    def loss(p, xv):
        return -jnp.mean(combine(p, static)(None).log_prob(xv))

    g_tpu = jax.jit(jax.grad(loss))(params, x)

    params_cpu = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, cpu), params)
    x_cpu = jax.device_put(x, cpu)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    with jax.default_device(cpu):
        g_cpu = jax.grad(loss)(params_cpu, x_cpu)
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

    worst = 0.0
    for (n, a), (_, b) in zip(
        named_parameters(g_tpu), named_parameters(g_cpu)
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        worst = max(
            worst, float(np.abs(a - b).max() / (np.abs(b).max() + 1e-6))
        )
    print(f"D={D} b={B}: fused grad vs CPU worst rel {worst:.3e}",
          flush=True)

print("DONE", flush=True)
