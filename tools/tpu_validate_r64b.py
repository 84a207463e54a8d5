r"""Batch 64b: full-kernel batch-tile re-sweep under the PACKED constraint
tier (the r2-era '1024 > 2048' verdict predates binsel+packed, which
shrank the spline live set; r64 shows hyper-only gains ~5% at 2048)."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
print("backend:", jax.default_backend(), flush=True)
from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

d = np.load("tools/nsf_truth_f64.npz")
X, LP64 = jnp.asarray(d["x"]), d["lp"]
flow = NSF(6, 0, transforms=3, hidden_features=(64, 64), bins=8,
           key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))
REPS = 10
orig_tb = nf._TB

def measure(label):
    lp = jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(X)
    e = np.abs(np.asarray(lp, np.float64) - LP64)
    def loop(x):
        def body(carry, _):
            return carry + jnp.sum(
                nf.fused_nsf_log_prob(flow, x + 1e-9 * carry)), None
        out, _ = lax.scan(body, 0.0, None, length=REPS)
        return out
    j = jax.jit(loop)
    j(x).block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = j(x)
        out.block_until_ready()
        best = max(best, 65536 * REPS * 5 / (time.perf_counter() - t0))
    print(f"{label}: {best:,.0f} evals/s  err max {e.max():.3e}", flush=True)

for tb in [1024, 2048, 4096, 1024]:  # control / levers / re-control
    nf._TB = tb
    measure(f"full packed tb={tb}")
nf._TB = orig_tb
print("done", flush=True)
