import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax import lax
from zuko_tpu.core import combine, partition
from zuko_tpu.flows import GF

BATCH, REPEATS = 1048576, 12
flow = GF(6, 0, transforms=3, key=jax.random.PRNGKey(0))
params, static = partition(flow)

@jax.jit
def loop(params, x):
    def body(carry, _):
        model = combine(params, static)
        return carry + jnp.sum(model(None).log_prob(x + 1e-9 * carry)), None
    out, _ = lax.scan(body, 0.0, None, length=REPEATS)
    return out

x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 6))
t0 = time.perf_counter(); loop(params, x).block_until_ready()
print(f"# compile {time.perf_counter()-t0:.1f}s", flush=True)
for r in range(4):
    t0 = time.perf_counter(); loop(params, x).block_until_ready()
    dt = time.perf_counter() - t0
    print(f"# GF density run {r}: {1e3*dt:.1f} ms -> {BATCH*REPEATS/dt/1e6:.1f}M evals/s", flush=True)
