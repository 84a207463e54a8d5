r"""On-hardware validation batch 46: fused NAF/UNAF DENSITY (forward
monotone-net kernel with analytic ladjs — closes the last family's
density gap). Accuracy vs CPU; throughput vs the XLA jvp path; training
gradient spot check."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, named_parameters, partition
from zuko_tpu.flows import NAF, UNAF

cpu = jax.devices("cpu")[0]

for cls, B in [(NAF, 16384), (UNAF, 4096)]:
    flow = cls(6, transforms=3, signal=16, key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 6))
    lp_t = np.asarray(jax.jit(lambda v: flow(None).log_prob(v))(x))[:2048]
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    with jax.default_device(cpu):
        lp_c = np.asarray(flow(None).log_prob(jax.device_put(x[:2048], cpu)))
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
    d = np.abs(lp_t - lp_c)
    print(f"{cls.__name__} fused density vs CPU: max {d.max():.3e} median"
          f" {np.median(d):.3e}", flush=True)

    def loop(v, flow=flow):
        def body(c, _):
            return c + jnp.sum(flow(None).log_prob(v + 1e-9 * c)), None
        return lax.scan(body, 0.0, None, length=8)[0]

    j = jax.jit(loop)
    j(x).block_until_ready()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            out = j(x)
        out.block_until_ready()
        best = max(best, 3 * 8 * B / (time.perf_counter() - t0))
    print(f"{cls.__name__} fused density: {best:,.0f} evals/s", flush=True)

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    j2 = jax.jit(loop)
    j2(x).block_until_ready()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            out = j2(x)
        out.block_until_ready()
        best = max(best, 3 * 8 * B / (time.perf_counter() - t0))
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
    print(f"{cls.__name__} XLA density: {best:,.0f} evals/s", flush=True)

# gradient spot check (NAF, b=16384)
flow = NAF(6, transforms=3, signal=16, key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (16384, 6))
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
print(f"NAF fused-density grad vs CPU: worst rel {worst:.3e}", flush=True)

print("DONE", flush=True)
