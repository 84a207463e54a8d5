r"""On-hardware batch 54: A/B the IFT iteration-precision knob
(ZUKO_TPU_IFT_ITER): 'match' runs the triangular-solve iterations on the
split3 linearization (6 bf16 passes per J^T application), 'fast' on a
single-bf16-pass linearization (the solve is linear and exact by
nilpotency; the operator perturbation is ~1e-3). Measures the scanned VI
step AND the f32 gradient accuracy vs the CPU XLA path for both settings,
same session."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import optax

from functools import partial

print("backend:", jax.default_backend(), flush=True)

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF
from zuko_tpu.ops import ift
from zuko_tpu.parallel.train import TrainState

flow = NSF(6, 0, transforms=3, key=jax.random.PRNGKey(0))
params, static = partition(flow)
opt = optax.adam(1e-3)
STEPS = 10
BATCH = 65536
cpu = jax.devices("cpu")[0]


def ring(x):
    r = jnp.linalg.norm(x, axis=-1)
    return -((r - 2.0) ** 2) / 0.5


def loss_fn(p, key):
    d = combine(p, static)(None)
    x, lq = d.rsample_and_log_prob(key, (BATCH,))
    return jnp.mean(lq) - jnp.mean(ring(x))


def make_scanned():
    @partial(jax.jit, donate_argnums=0)
    def run(state, key):
        def body(st, i):
            loss, g = jax.value_and_grad(loss_fn)(
                st.params, jax.random.fold_in(key, i)
            )
            u, o = opt.update(g, st.opt_state, st.params)
            return TrainState(
                optax.apply_updates(st.params, u), o, st.step + 1
            ), loss

        return jax.lax.scan(body, state, jnp.arange(STEPS))

    return run


def fresh():
    p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)
    return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))


# CPU reference gradient for the accuracy check (XLA scan-inverse path,
# f32 — the pathwise noise floor; f64 exactness is pinned in the battery)
k0 = jax.random.PRNGKey(3)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
with jax.default_device(cpu):
    g_ref = jax.tree_util.tree_map(
        np.asarray,
        jax.grad(loss_fn)(
            jax.tree_util.tree_map(lambda a: jax.device_put(a, cpu), params),
            jax.device_put(k0, cpu),
        ),
    )
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

for mode in ["match", "fast", "match"]:
    ift._ITER_PREC = mode
    run = make_scanned()
    state, _ = run(fresh(), jax.random.PRNGKey(0))
    jax.block_until_ready(state.params)
    best = 0.0
    for r in range(3):
        st = fresh()
        t0 = time.perf_counter()
        st, losses = run(st, jax.random.PRNGKey(r))
        jax.block_until_ready(st.params)
        best = max(best, BATCH * STEPS / (time.perf_counter() - t0))
    g = jax.tree_util.tree_map(
        np.asarray, jax.jit(jax.grad(loss_fn))(params, k0)
    )
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        worst = max(worst, float(
            np.abs(a - b).max() / (np.abs(b).max() + 1e-12)))
    print(f"ITER={mode}: {best / 1e6:.2f}M samples/s  "
          f"grad worst-leaf rel vs CPU {worst:.3e}", flush=True)

ift._ITER_PREC = "match"
print("done", flush=True)
