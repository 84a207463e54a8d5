r"""On-hardware validation batch 28: the chunked-rows mitigation in
NormalizingFlow.log_prob (r27: lax.map chunking is the one fix for the
XLA big-batch miscompile). (a) failing configs now correct through the
public regular path, (b) does the INVERSE direction (sample_and_log_prob)
carry the same hazard at large sample counts?, (c) flagship XLA-path
throughput with chunking (barrier removed)."""

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

# (a) failing configs
for label, D, T, B in [
    ("D=43 t=3 b=16384", 43, 3, 16384),
    ("D=43 t=2 b=16384", 43, 2, 16384),
    ("D=43 t=3 b=65536", 43, 3, 65536),
]:
    flow = NSF(D, transforms=T, hidden_features=(64, 64),
               key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(3), (B, D))
    lp_t = np.asarray(jax.jit(lambda v: flow(None).log_prob(v))(x))[:2048]
    with jax.default_device(cpu):
        lp_c = np.asarray(flow(None).log_prob(jax.device_put(x[:2048], cpu)))
    d = np.abs(lp_t - lp_c)
    print(f"(a) {label}: max {d.max():.3e} median {np.median(d):.3e}"
          f" frac>1 {float((d > 1).mean()):.3f}", flush=True)

# (b) inverse direction at large sample count
flow = NSF(43, transforms=3, hidden_features=(64, 64),
           key=jax.random.PRNGKey(0))
ks = jax.random.PRNGKey(7)
s_t, lq_t = jax.jit(
    lambda k: flow(None).sample_and_log_prob(k, (16384,)))(ks)
with jax.default_device(cpu):
    s_c, lq_c = flow(None).sample_and_log_prob(ks, (16384,))
ds = np.abs(np.asarray(s_t) - np.asarray(s_c)).max()
dl = np.abs(np.asarray(lq_t) - np.asarray(lq_c))
print(f"(b) sample_and_log_prob b=16384: x max {ds:.3e}  logq max"
      f" {dl.max():.3e} median {np.median(dl):.3e}"
      f" frac>1 {float((dl > 1).mean()):.3f}", flush=True)

# (c) flagship XLA-path throughput with chunking
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
print(f"(c) flagship XLA path w/ chunking: {best:,.0f} evals/s", flush=True)

del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
print("DONE", flush=True)
