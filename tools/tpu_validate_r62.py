r"""Batch 62: re-A/B ZUKO_TPU_IFT_ITER under the r58 backward. With the
spline-vjp chain gone from the triangular-solve iterations, each
iteration is dominated by the hyper W^T matmuls — exactly what 'fast'
(1-pass bf16 linearization) cheapens. r54 measured only 1.5% when
iterations still carried the spline chain. Per-run timings + f32 grad
accuracy vs CPU for both modes."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
import optax
from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF
from zuko_tpu.ops import ift
from zuko_tpu.parallel.train import TrainState

flow = NSF(6, 0, transforms=3, key=jax.random.PRNGKey(0))
params, static = partition(flow)
BATCH, STEPS = 65536, 10
opt = optax.adam(1e-3)
cpu = jax.devices("cpu")[0]

def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5

def loss_fn(p, key):
    dd = combine(p, static)(None)
    xs, lq = dd.rsample_and_log_prob(key, (BATCH,))
    return jnp.mean(lq) - jnp.mean(ring(xs))

def fresh():
    p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)
    return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

k0 = jax.random.PRNGKey(3)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
with jax.default_device(cpu):
    g_ref = jax.tree_util.tree_map(
        np.asarray,
        jax.grad(loss_fn)(
            jax.tree_util.tree_map(lambda a: jax.device_put(a, cpu), params),
            jax.device_put(k0, cpu)))
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

for mode in ["match", "fast", "match", "fast"]:
    ift._ITER_PREC = mode

    @partial(jax.jit, donate_argnums=0)
    def run(state, key):
        def body(st, i):
            loss, g = jax.value_and_grad(loss_fn)(
                st.params, jax.random.fold_in(key, i))
            u, o = opt.update(g, st.opt_state, st.params)
            return TrainState(optax.apply_updates(st.params, u), o,
                              st.step + 1), loss
        return jax.lax.scan(body, state, jnp.arange(STEPS))

    st, losses = run(fresh(), jax.random.PRNGKey(0))
    jax.block_until_ready((st.params, losses))
    best = 0.0
    for r in range(2):
        st = fresh()
        t0 = time.perf_counter()
        st, losses = run(st, jax.random.PRNGKey(r))
        jax.block_until_ready((st.params, losses))
        best = max(best, BATCH * STEPS / (time.perf_counter() - t0))
    g = jax.tree_util.tree_map(
        np.asarray, jax.jit(jax.grad(loss_fn))(params, k0))
    worst = max(
        float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(g_ref)))
    print(f"ITER={mode}: {best/1e6:.2f}M samples/s  grad worst-leaf rel"
          f" vs CPU {worst:.3e}  loss[-1] {float(losses[-1]):.3f}",
          flush=True)
ift._ITER_PREC = "match"
print("done", flush=True)
