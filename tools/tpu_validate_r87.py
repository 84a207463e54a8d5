r"""r87: CONDITIONAL production-batch rows — per-row context (B, ctx) through
the fused tier at b=1M (the serving workload). Requires the batched-context
sampling prep fix (sample_shape + c-batch + event draw semantics)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax import lax
from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF, MAF

BATCH, REPEATS = 1048576, 10

def pin(name, flow, ctx):
    params, static = partition(flow)
    c = jax.random.normal(jax.random.PRNGKey(9), (BATCH, ctx))
    @jax.jit
    def lp_loop(params, x, c):
        def body(carry, _):
            model = combine(params, static)
            return carry + jnp.sum(model(c).log_prob(x + 1e-9 * carry)), None
        out, _ = lax.scan(body, 0.0, None, length=REPEATS)
        return out
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 6))
    t0 = time.perf_counter(); lp_loop(params, x, c).block_until_ready()
    print(f"# {name} density compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = 0.0
    for r in range(3):
        t0 = time.perf_counter(); lp_loop(params, x, c).block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, BATCH*REPEATS/dt/1e6)
        print(f"# {name} density run {r}: {1e3*dt:.1f} ms -> {BATCH*REPEATS/dt/1e6:.1f}M evals/s", flush=True)
    print(f"{name} conditional density BEST {best:.1f}M", flush=True)

    @jax.jit
    def s_loop(params, key, c):
        def body(carry, i):
            model = combine(params, static)
            k = jax.random.fold_in(key, i)
            xs, lq = model(c).sample_and_log_prob(k, ())
            return carry + jnp.sum(lq) + jnp.sum(xs), None
        out, _ = lax.scan(body, 0.0, jnp.arange(REPEATS))
        return out
    s_loop(params, jax.random.PRNGKey(2), c).block_until_ready()
    best = 0.0
    for r in range(3):
        t0 = time.perf_counter(); s_loop(params, jax.random.PRNGKey(2), c).block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, BATCH*REPEATS/dt/1e6)
        # per-run prints (CLAUDE.md timing discipline)
        print(f"# {name} sample+logq run {r}: {1e3*dt:.1f} ms -> "
              f"{BATCH*REPEATS/dt/1e6:.1f}M/s", flush=True)
    print(f"{name} conditional sample+logq BEST {best:.1f}M", flush=True)

k = jax.random.PRNGKey(0)
pin("NSF(c=8)", NSF(6, 8, transforms=3, key=k), 8)
pin("MAF(c=8)", MAF(6, 8, transforms=3, key=k), 8)
