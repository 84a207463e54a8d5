r"""On-hardware validation batch 23: the per-layer optimization-barrier
fix for the XLA whole-graph fusion miscompile (r22: composed jitted
log_prob wrong at (16384, 43), each layer standalone correct, unjitted
correct). Checks the failing configs from r18 against the CPU f32
reference, plus the flagship config's XLA-path throughput (barrier cost)."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF

cpu = jax.devices("cpu")[0]
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"

for label, D, T, HID, B in [
    ("D=43 t=3 h=64 b=16384", 43, 3, (64, 64), 16384),
    ("D=43 t=2 h=64 b=16384", 43, 2, (64, 64), 16384),
    ("D=6  t=3 h=64 b=65536", 6, 3, (64, 64), 65536),
]:
    flow = NSF(D, transforms=T, hidden_features=HID,
               key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(3), (B, D))
    lp_t = np.asarray(jax.jit(lambda v: flow(None).log_prob(v))(x))[:2048]
    with jax.default_device(cpu):
        lp_c = np.asarray(flow(None).log_prob(jax.device_put(x[:2048], cpu)))
    d = np.abs(lp_t - lp_c)
    print(f"{label}: max {d.max():.3e} median {np.median(d):.3e}"
          f" frac>1 {float((d > 1).mean()):.3f}", flush=True)

# flagship XLA-path throughput with the barrier (was ~36M amortized)
flow = NSF(6, transforms=3, hidden_features=(64, 64),
           key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))


def loop(v):
    def body(c, _):
        return c + jnp.sum(flow(None).log_prob(v + 1e-9 * c)), None
    return jax.lax.scan(body, 0.0, None, length=10)[0]


j = jax.jit(loop)
j(x).block_until_ready()
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(3):
        out = j(x)
    out.block_until_ready()
    best = max(best, 3 * 10 * 65536 / (time.perf_counter() - t0))
print(f"flagship XLA path w/ barrier: {best:,.0f} evals/s", flush=True)

del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
print("DONE", flush=True)
