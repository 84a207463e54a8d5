r"""On-hardware validation of the round-2 fused additions: SOSPF/BPF density
kernels (Mosaic lowering + parity vs the XLA path) and an NSF batch-tile
sweep for the flagship log_prob kernel."""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import zuko_tpu.ops.nsf_fused as nf
from zuko_tpu.flows import BPF, NSF, SOSPF
from zuko_tpu.ops.nsf_fused import fused_nsf_log_prob

key = jax.random.PRNGKey(0)
print("backend:", jax.default_backend(), flush=True)


def xla(fn):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        return fn()
    finally:
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]


# ---- polynomial family parity on hardware ----------------------------------
for cls, name in [(SOSPF, "sospf"), (BPF, "bpf")]:
    flow = cls(6, transforms=3, key=key)
    x = jax.random.normal(jax.random.PRNGKey(1), (4096, 6))
    t0 = time.perf_counter()
    lp_k = jax.jit(lambda x, f=flow: fused_nsf_log_prob(f, x))(x)
    lp_k.block_until_ready()
    print(f"{name} kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    lp_x = xla(lambda f=flow: jax.jit(lambda x: f(None).log_prob(x))(x))
    print(f"{name} kernel vs XLA |max|:",
          float(jnp.abs(lp_k - lp_x).max()), flush=True)


# ---- NSF flagship: batch-tile sweep ----------------------------------------
BATCH = 65536
REP = 10
flow = NSF(6, 0, transforms=3, hidden_features=(64, 64), bins=8,
           key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 6))

for tb in (512, 1024, 2048, 4096):
    nf._TB = tb

    @jax.jit
    def loop(x):
        def body(carry, _):
            return carry + jnp.sum(fused_nsf_log_prob(flow, x + 1e-9 * carry)), None
        out, _ = jax.lax.scan(body, 0.0, None, length=REP)
        return out

    t0 = time.perf_counter()
    loop(x).block_until_ready()
    print(f"TB={tb} compile: {time.perf_counter()-t0:.1f}s", flush=True)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(5):
            out = loop(x)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, BATCH * REP * 5 / dt)
    print(f"TB={tb}: {best/1e6:.1f}M evals/s", flush=True)

nf._TB = 1024
print("DONE", flush=True)
