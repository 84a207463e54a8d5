r"""On-hardware validation batch 15: fused NSF density at LARGE feature
counts. The digits run (D=64) trained to nonsense NLL on TPU while CPU
(fallback math) was correct — compare fused kernel vs XLA path vs CPU-f64
truth at D in {6, 16, 32, 64} on random weights, plus the custom-VJP
gradient at D=64."""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, partition, named_parameters
from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

ks = jax.random.PRNGKey(7)

for D in [6, 16, 32, 64]:
    flow = NSF(D, transforms=3, hidden_features=(64, 64),
               key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2048, D))
    lp_fused = np.asarray(
        jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(x), np.float64)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    lp_xla = np.asarray(
        jax.jit(lambda v: flow(None).log_prob(v))(x), np.float64)
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
    d = np.abs(lp_fused - lp_xla)
    print(f"D={D}: fused-vs-XLA max {d.max():.3e} median"
          f" {np.median(d):.3e}  (fused mean {lp_fused.mean():.2f},"
          f" xla mean {lp_xla.mean():.2f})", flush=True)

# gradient check at D=64 through the dispatch custom VJP
D = 64
flow = NSF(D, transforms=3, hidden_features=(64, 64),
           key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (256, D))
params, static = partition(flow)


def loss(p):
    return -jnp.mean(combine(p, static)(None).log_prob(x))


g_fused = jax.jit(jax.grad(loss))(params)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
g_xla = jax.jit(jax.grad(loss))(params)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
worst = 0.0
for (n, a), (_, b) in zip(named_parameters(g_fused), named_parameters(g_xla)):
    worst = max(worst, float(jnp.abs(a - b).max()))
print(f"D=64 grad fused-vs-XLA worst abs: {worst:.3e}", flush=True)

print("DONE", flush=True)
