r"""Batch 75 (round 4): training-step throughput at PRODUCTION batch.

Companion to r74 (forward surfaces): the flagship reverse-KL VI step
(fused IFT rsample + ring energy + Adam) and the MLE step (fused density
custom-VJP + Adam) re-pinned at growing batch — the round-3 records
(VI 5.73M samples/s, MLE 15.7M examples/s) were measured at b=65536,
which r72/r73 showed is launch-bound. Blocked per-run timings with the
loss trajectory printed (the r59 rule).
"""
import os
import sys
import time
from functools import partial as fpartial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

import optax

from zuko_tpu import flows
from zuko_tpu.core import combine, partition
from zuko_tpu.data import ring_energy
from zuko_tpu.parallel.train import TrainState

D = 6
flow = flows.NSF(D, 0, transforms=3, key=jax.random.PRNGKey(0))
params0, static = partition(flow)
opt = optax.adam(1e-3)
STEPS = 3


def fresh():
    p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params0)
    return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))


for B in (65536, 262144, 1048576):
    # ---- reverse-KL VI step (rsample_and_log_prob through the IFT tier)
    def vi_loss(p, k):
        d = combine(p, static)(None)
        xs, lq = d.rsample_and_log_prob(k, (B,))
        return jnp.mean(lq) - jnp.mean(ring_energy(xs))

    @fpartial(jax.jit, donate_argnums=0)
    def vi_run(state, k):
        def body(st, i):
            loss, g = jax.value_and_grad(vi_loss)(
                st.params, jax.random.fold_in(k, i))
            u, o = opt.update(g, st.opt_state, st.params)
            return TrainState(optax.apply_updates(st.params, u), o,
                              st.step + 1), loss
        return jax.lax.scan(body, state, jnp.arange(STEPS))

    st, losses = vi_run(fresh(), jax.random.PRNGKey(0))
    jax.block_until_ready((st.params, losses))
    for r in range(3):
        st = fresh()
        t0 = time.perf_counter()
        st, losses = vi_run(st, jax.random.PRNGKey(r))
        jax.block_until_ready((st.params, losses))
        dt = time.perf_counter() - t0
        print(f"VI step b={B} run {r}: {1e3*dt:.0f} ms -> "
              f"{B*STEPS/dt/1e6:.2f}M samples/s  "
              f"losses {np.asarray(losses).round(3)}", flush=True)

    # ---- MLE step (density custom-VJP backward)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D)) * 1.3

    @fpartial(jax.jit, donate_argnums=0)
    def mle_run(state, xb):
        def body(st, i):
            loss, g = jax.value_and_grad(
                lambda p: -jnp.mean(
                    combine(p, static)(None).log_prob(xb + 1e-6 * i))
            )(st.params)
            u, o = opt.update(g, st.opt_state, st.params)
            return TrainState(optax.apply_updates(st.params, u), o,
                              st.step + 1), loss
        return jax.lax.scan(body, state, jnp.arange(STEPS))

    st, losses = mle_run(fresh(), x)
    jax.block_until_ready((st.params, losses))
    for r in range(3):
        st = fresh()
        t0 = time.perf_counter()
        st, losses = mle_run(st, x)
        jax.block_until_ready((st.params, losses))
        dt = time.perf_counter() - t0
        print(f"MLE step b={B} run {r}: {1e3*dt:.0f} ms -> "
              f"{B*STEPS/dt/1e6:.2f}M examples/s  "
              f"losses {np.asarray(losses).round(3)}", flush=True)

print("done", flush=True)
