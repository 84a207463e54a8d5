r"""On-hardware validation batch 22: isolate the pure-XLA miscompile in
the regular flow path at (16384, 43) (r21: one-hot select did not fix
it). Compare layer pieces on TPU vs the same f32 math on CPU:
(a) layer-0 masked-MLP output phi, (b) layer-0 call_and_ladj,
(c) the whole log_prob, (d) batch-position dependence (same rows at
different offsets), (e) with jit disabled donation/fusion variations."""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF

D, T, HID, B = 43, 3, (64, 64), 16384
flow = NSF(D, transforms=T, hidden_features=HID, key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(3), (B, D))
SUB = 2048
cpu = jax.devices("cpu")[0]
x_cpu = jax.device_put(x, cpu)

lt0 = flow.transform.transforms[0]

# (a) layer-0 hyper output
phi_tpu = np.asarray(jax.jit(lambda v: lt0.hyper(v))(x))[:SUB]
with jax.default_device(cpu):
    phi_cpu = np.asarray(lt0.hyper(x_cpu))[:SUB]
d = np.abs(phi_tpu - phi_cpu)
print(f"(a) layer0 phi: max {d.max():.3e} median {np.median(d):.3e}",
      flush=True)

# (b) layer-0 call_and_ladj
tr0 = lt0(None)
y_t, l_t = jax.jit(lambda v: tr0.call_and_ladj(v))(x)
with jax.default_device(cpu):
    y_c, l_c = tr0.call_and_ladj(x_cpu)
dy = np.abs(np.asarray(y_t)[:SUB] - np.asarray(y_c)[:SUB])
dl = np.abs(np.asarray(l_t)[:SUB] - np.asarray(l_c)[:SUB])
print(f"(b) layer0 y: max {dy.max():.3e}  ladj: max {dl.max():.3e}"
      f" median {np.median(dl):.3e}", flush=True)

# (c) whole log_prob (regular path)
import os
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
lp_t = np.asarray(jax.jit(lambda v: flow(None).log_prob(v))(x))[:SUB]
with jax.default_device(cpu):
    lp_c = np.asarray(flow(None).log_prob(x_cpu))[:SUB]
d = np.abs(lp_t - lp_c)
print(f"(c) log_prob: max {d.max():.3e} median {np.median(d):.3e}",
      flush=True)

# (d) same rows at batch 2048 vs inside 16384 on TPU
lp_small = np.asarray(
    jax.jit(lambda v: flow(None).log_prob(v))(x[:SUB]))
d = np.abs(lp_small - lp_t)
print(f"(d) b=2048 vs b=16384 same rows (TPU): max {d.max():.3e}",
      flush=True)

# (e) unjitted on TPU (op-by-op dispatch, no XLA whole-graph fusion)
lp_nojit = np.asarray(flow(None).log_prob(x))[:SUB]
d = np.abs(lp_nojit - lp_c)
print(f"(e) unjitted TPU vs CPU: max {d.max():.3e} median"
      f" {np.median(d):.3e}", flush=True)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

print("DONE", flush=True)
