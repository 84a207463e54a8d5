r"""r82: quiet-session density re-pins across the zoo (the r74 session was
congestion-limited — every family reads 1.2-1.7x higher on a quiet host).
Blocked per-run timings, fresh compiles, b=1M, 12 in-scan repeats."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax import lax
from zuko_tpu.core import combine, partition
from zuko_tpu import flows as F

BATCH, REPEATS = 1048576, 12

def pin(name, flow):
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
    print(f"# {name}: compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = 0.0
    for r in range(3):
        t0 = time.perf_counter(); loop(params, x).block_until_ready()
        dt = time.perf_counter() - t0
        rate = BATCH*REPEATS/dt/1e6
        best = max(best, rate)
        print(f"# {name} run {r}: {1e3*dt:.1f} ms -> {rate:.1f}M evals/s", flush=True)
    print(f"{name} BEST {best:.1f}M", flush=True)

k = jax.random.PRNGKey(0)
pin("MAF", F.MAF(6, 0, transforms=3, key=k))
pin("NCSF", F.NCSF(6, 0, transforms=3, key=k))
pin("NICE", F.NICE(6, 0, transforms=3, key=k))
pin("SOSPF", F.SOSPF(6, 0, transforms=3, key=k))
pin("BPF", F.BPF(6, 0, transforms=3, key=k))
