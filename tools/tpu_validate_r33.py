r"""On-hardware validation batch 33: (a) re-sweep the density batch tile
with the presplit-cat defaults (the round-1 sweep predates the hoisted
wide-operand form; the working set changed), bench.py's exact loop;
(b) reverse-KL training-step throughput (the VI loop: rsample grads via
scan-inverse autodiff) — data for the ROADMAP fused-reverse-KL decision."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

d = np.load("tools/nsf_truth_f64.npz")
X, LP64 = jnp.asarray(d["x"]), d["lp"]

flow = NSF(6, 0, transforms=3, hidden_features=(64, 64), bins=8,
           key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))

for tb in [512, 1024, 2048, 4096]:
    nf._TB = tb
    try:
        lp = jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(X)
        e = np.abs(np.asarray(lp, np.float64) - LP64)

        def loop(v):
            def body(c, _):
                return c + jnp.sum(
                    nf.fused_nsf_log_prob(flow, v + 1e-9 * c)), None
            return lax.scan(body, 0.0, None, length=10)[0]

        j = jax.jit(loop)
        j(x).block_until_ready()
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(5):
                out = j(x)
            out.block_until_ready()
            best = max(best, 5 * 10 * 65536 / (time.perf_counter() - t0))
        print(f"(a) TB={tb}: {best:,.0f} evals/s  err max {e.max():.3e}",
              flush=True)
    except Exception as ex:
        print(f"(a) TB={tb} FAILED: {str(ex)[:200]}", flush=True)
    finally:
        nf._TB = 1024

# (b) reverse-KL step throughput
from zuko_tpu.core import partition
from zuko_tpu.data import ring_energy
from zuko_tpu.lazy import Flow
from zuko_tpu.parallel import make_reverse_kl_step

flow2 = NSF(2, 0, transforms=3, hidden_features=(64, 64),
            key=jax.random.PRNGKey(2))
inv = Flow(flow2.transform.inv, flow2.base)
ip, istat = partition(inv)
N = 8192
vinit, vstep = make_reverse_kl_step(istat, ring_energy, n_samples=N,
                                    lr=1e-3)
state = vinit(ip)
ks = jax.random.PRNGKey(3)
state, l0 = vstep(state, ks)
jax.block_until_ready(l0)
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for i in range(8):
        state, l0 = vstep(state, jax.random.fold_in(ks, i))
    jax.block_until_ready(l0)
    best = max(best, 8 * N / (time.perf_counter() - t0))
print(f"(b) reverse-KL step: {best:,.0f} samples/s (loss {float(l0):.3f})",
      flush=True)

print("DONE", flush=True)
