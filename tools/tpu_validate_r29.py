r"""On-hardware validation batch 29: chunked sampling direction (r28
found NaN samples / 50%-wrong log q at (16384, 43) through the regular
inverse path; `_chunked_rows` now guards sample / sample_and_log_prob).
Also the fused-dispatch default path at the same scale (should have been
fine all along — confirm) and XLA sampling throughput."""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF

cpu = jax.devices("cpu")[0]
ks = jax.random.PRNGKey(7)
flow = NSF(43, transforms=3, hidden_features=(64, 64),
           key=jax.random.PRNGKey(0))

# (a) regular path, chunked
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
s_t, lq_t = jax.jit(
    lambda k: flow(None).sample_and_log_prob(k, (16384,)))(ks)
with jax.default_device(cpu):
    s_c, lq_c = flow(None).sample_and_log_prob(ks, (16384,))
ds = np.abs(np.asarray(s_t) - np.asarray(s_c)).max()
dl = np.abs(np.asarray(lq_t) - np.asarray(lq_c))
print(f"(a) regular sample_and_log_prob: x max {ds:.3e}  logq max"
      f" {dl.max():.3e} median {np.median(dl):.3e}"
      f" frac>1 {float((dl > 1).mean()):.3f}", flush=True)
s2 = jax.jit(lambda k: flow(None).sample(k, (16384,)))(ks)
print(f"(a) regular sample finite: {bool(jnp.isfinite(s2).all())}",
      flush=True)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

# (b) default dispatch (fused kernel) at the same scale
s_f, lq_f = jax.jit(
    lambda k: flow(None).sample_and_log_prob(k, (16384,)))(ks)
lp_f = jax.jit(lambda v: flow(None).log_prob(v))(s_f)
e = np.abs(np.asarray(lq_f, np.float64) - np.asarray(lp_f, np.float64))
print(f"(b) fused logq-vs-density D=43: max {e.max():.3e} median"
      f" {np.median(e):.3e}  finite {bool(jnp.isfinite(s_f).all())}",
      flush=True)

print("DONE", flush=True)
