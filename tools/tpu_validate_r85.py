r"""r85: quiet D=64/5x256x2 density pins at growing batch (split3 default).
Companion fast-mode run reconciles the old 13.5M@262K row (fast) vs the
split3 8.9M/10.3M readings — the wide-D accuracy tradeoff is shape-dependent."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax import lax
from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF

flow = NSF(64, 0, transforms=5, hidden_features=(256, 256),
           key=jax.random.PRNGKey(0))
params, static = partition(flow)

for BATCH, REPEATS in ((262144, 5), (524288, 5), (1048576, 3)):
    @jax.jit
    def loop(params, x, REPEATS=REPEATS):
        def body(carry, _):
            model = combine(params, static)
            return carry + jnp.sum(model(None).log_prob(x + 1e-9 * carry)), None
        out, _ = lax.scan(body, 0.0, None, length=REPEATS)
        return out
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 64))
    t0 = time.perf_counter(); loop(params, x).block_until_ready()
    print(f"# b={BATCH} compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = 0.0
    for r in range(3):
        t0 = time.perf_counter(); loop(params, x).block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, BATCH*REPEATS/dt/1e6)
        print(f"# b={BATCH} run {r}: {1e3*dt:.0f} ms -> {BATCH*REPEATS/dt/1e6:.2f}M evals/s", flush=True)
    print(f"D=64 density b={BATCH} BEST {best:.2f}M evals/s", flush=True)
