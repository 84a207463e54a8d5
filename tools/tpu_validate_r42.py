r"""On-hardware validation batch 42: row-chunked custom-VJP backward
(r27's forward observation applied to training: smaller XLA programs
pipeline better). Gradient parity at b=65536 vs CPU + train-step
throughput vs the 13.6M examples/s monolithic-backward baseline."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import lax

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, named_parameters, partition
from zuko_tpu.flows import NSF

cpu = jax.devices("cpu")[0]
B = 65536
flow = NSF(6, 0, transforms=3, hidden_features=(64, 64),
           key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (B, 6))
params, static = partition(flow)


def loss(p, xv):
    return -jnp.mean(combine(p, static)(None).log_prob(xv))


g_tpu = jax.jit(jax.grad(loss))(params, x)
params_cpu = jax.tree_util.tree_map(lambda a: jax.device_put(a, cpu), params)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
with jax.default_device(cpu):
    g_cpu = jax.grad(loss)(params_cpu, jax.device_put(x, cpu))
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
worst = 0.0
for (n, a), (_, b) in zip(named_parameters(g_tpu), named_parameters(g_cpu)):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    worst = max(worst, float(np.abs(a - b).max() / (np.abs(b).max() + 1e-6)))
print(f"chunked-bwd grad vs CPU: worst rel {worst:.3e}", flush=True)

opt = optax.adam(1e-3)
opt_state = opt.init(params)


@jax.jit
def steps(params, opt_state, x):
    def body(carry, _):
        p, s = carry
        l, g = jax.value_and_grad(loss)(p, x)
        up, s = opt.update(g, s, p)
        return (optax.apply_updates(p, up), s), l

    (params, opt_state), losses = lax.scan(
        body, (params, opt_state), None, length=8)
    return params, opt_state, losses


p2, s2, ls = steps(params, opt_state, x)
jax.block_until_ready(ls)
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(3):
        p2, s2, ls = steps(p2, s2, x)
    jax.block_until_ready(ls)
    best = max(best, 3 * 8 * B / (time.perf_counter() - t0))
print(f"train step (chunked bwd): {best:,.0f} examples/s (was 13.6M)",
      flush=True)

print("DONE", flush=True)
