r"""On-hardware validation batch 49: the IFT differentiable sampling tier.

1. f32 reverse-KL gradients through the dispatched rsample_and_log_prob
   (fused Pallas solve forward, IFT custom-VJP backward) vs CPU f64 ground
   truth through the XLA scan inverse — the r2 VERDICT acceptance check.
2. VI train-step throughput (sample + energy + grad + Adam), flagship
   config — round-2 baseline: 1.29M samples/s through the XLA backward;
   target >= 5M.
3. The conditional big-batch chunk REBUILD truth check at (16384, 43)
   through the public API (the round-2 residual exposure).
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF

cpu = jax.devices("cpu")[0]

# ---------------------------------------------------------------- 1. grads
flow = NSF(6, 0, transforms=3, key=jax.random.PRNGKey(0))
params, static = partition(flow)
k = jax.random.PRNGKey(7)
N = 4096


def make_loss():
    def loss(p):
        d = combine(p, static)(None)
        x, lq = d.rsample_and_log_prob(k, (N,))
        r = jnp.linalg.norm(x, axis=-1)
        return jnp.mean(lq) + jnp.mean((r - 2.0) ** 2 / 0.5)

    return loss


os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
g_tpu = jax.jit(jax.grad(make_loss()))(params)
g_tpu = jax.tree_util.tree_map(np.asarray, g_tpu)

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
with jax.default_device(cpu):
    p64 = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, cpu).astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params,
    )
    # f64 CPU ground truth via the XLA scan-inverse path
    with jax.enable_x64(True):
        g_cpu = jax.grad(make_loss())(p64)
g_cpu = jax.tree_util.tree_map(np.asarray, g_cpu)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

worst = 0.0
for a, b in zip(jax.tree_util.tree_leaves(g_tpu),
                jax.tree_util.tree_leaves(g_cpu)):
    scale = np.abs(b).max() + 1e-12
    rel = np.abs(a - b).max() / scale
    worst = max(worst, float(rel))
print(f"IFT f32 grads vs CPU f64 truth: worst rel {worst:.3e}", flush=True)

# ------------------------------------------------------- 2. VI step speed
import optax

from zuko_tpu.parallel.train import make_reverse_kl_step

BATCH = 65536


def ring(x):
    r = jnp.linalg.norm(x, axis=-1)
    return -((r - 2.0) ** 2) / 0.5


init_fn, step_fn = make_reverse_kl_step(
    static, ring, n_samples=BATCH, optimizer=optax.adam(1e-3)
)
state = init_fn(jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True),
                                       params))
state, _ = step_fn(state, k)  # compile
jax.block_until_ready(state.params)
n_it = 10
t0 = time.perf_counter()
for i in range(n_it):
    state, loss = step_fn(state, jax.random.fold_in(k, i))
jax.block_until_ready(state.params)
dt = time.perf_counter() - t0
print(f"VI train step (IFT): {BATCH * n_it / dt / 1e6:.2f}M samples/s "
      f"(loss {float(loss):.3f})", flush=True)

# baseline comparison: the XLA scan-inverse backward (round-2 path)
os.environ["ZUKO_TPU_IFT"] = "0"
init2, step2 = make_reverse_kl_step(
    static, ring, n_samples=BATCH, optimizer=optax.adam(1e-3)
)
state2 = init2(jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True),
                                      params))
state2, _ = step2(state2, k)
jax.block_until_ready(state2.params)
t0 = time.perf_counter()
for i in range(n_it):
    state2, loss2 = step2(state2, jax.random.fold_in(k, i))
jax.block_until_ready(state2.params)
dt2 = time.perf_counter() - t0
del os.environ["ZUKO_TPU_IFT"]
print(f"VI train step (XLA bwd): {BATCH * n_it / dt2 / 1e6:.2f}M samples/s "
      f"(loss {float(loss2):.3f})", flush=True)

# --------------------------------------- 3. conditional big-batch rebuild
D, C, B = 43, 7, 16384
cflow = NSF(D, C, transforms=3, hidden_features=(64, 64),
            key=jax.random.PRNGKey(3))
xs = jax.random.normal(jax.random.PRNGKey(4), (B, D))
cs = jax.random.normal(jax.random.PRNGKey(5), (B, C))

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
cparams, cstat = partition(cflow)
with jax.default_device(cpu):
    with jax.enable_x64(True):
        cp64 = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, cpu).astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            cparams,
        )
        lp_truth = np.asarray(combine(cp64, cstat)(
            jax.device_put(cs, cpu).astype(jnp.float64)
        ).log_prob(jax.device_put(xs, cpu).astype(jnp.float64)))

# the guarded public XLA path on TPU (dispatch off -> regular path with the
# conditional chunk rebuild)
lp_tpu = np.asarray(cflow(cs).log_prob(xs))
d = np.abs(lp_tpu - lp_truth)
print(f"conditional (16384, 43) chunked XLA path vs CPU f64: "
      f"max {d.max():.3e} median {np.median(d):.3e}", flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
print("done", flush=True)
