import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
from zuko_tpu import flows
from zuko_tpu.core import combine, partition
flow = flows.GF(6, 0, transforms=3, key=jax.random.PRNGKey(0))
params, static = partition(flow)
for B in (262144, 1048576):
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 6))
    def loop(p, v):
        def body(carry, _):
            d = combine(p, static)(None)
            return carry + jnp.sum(d.log_prob(v + 1e-9 * carry)), None
        out, _ = jax.lax.scan(body, 0.0, None, length=10)
        return out
    fn = jax.jit(loop)
    fn(params, x).block_until_ready()
    for r in range(3):
        t0 = time.perf_counter()
        fn(params, x).block_until_ready()
        dt = time.perf_counter() - t0
        print(f"GF density b={B} run {r}: {B*10/dt/1e6:.1f}M evals/s", flush=True)
print("done", flush=True)
