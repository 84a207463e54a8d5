r"""r84: quiet-session sampling-tier re-pins (companion to r82; the r74
sampling rows were congestion-limited too)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax import lax
from zuko_tpu.core import combine, partition
from zuko_tpu import flows as F

BATCH, REPEATS = 1048576, 10

def pin(name, flow):
    params, static = partition(flow)
    for mode in ("sample", "slp"):
        @jax.jit
        def loop(params, key):
            def body(carry, i):
                model = combine(params, static)
                k = jax.random.fold_in(key, i)
                if mode == "slp":
                    xs, lp = model(None).sample_and_log_prob(k, (BATCH,))
                    return carry + jnp.sum(lp) + jnp.sum(xs), None
                xs = model(None).sample(k, (BATCH,))
                return carry + jnp.sum(xs), None
            out, _ = lax.scan(body, 0.0, jnp.arange(REPEATS))
            return out
        loop(params, jax.random.PRNGKey(2)).block_until_ready()
        best = 0.0
        for r in range(3):
            t0 = time.perf_counter()
            loop(params, jax.random.PRNGKey(2)).block_until_ready()
            dt = time.perf_counter() - t0
            best = max(best, BATCH*REPEATS/dt/1e6)
        print(f"{name} {mode} BEST {best:.1f}M/s", flush=True)

k = jax.random.PRNGKey(0)
pin("MAF", F.MAF(6, 0, transforms=3, key=k))
pin("NSF", F.NSF(6, 0, transforms=3, key=k))
pin("NICE", F.NICE(6, 0, transforms=3, key=k))
pin("NCSF", F.NCSF(6, 0, transforms=3, key=k))
pin("GF", F.GF(6, 0, transforms=3, key=k))
