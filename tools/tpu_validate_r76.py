r"""Batch 76 (round 4): CNF VI-step batch scaling through the in-kernel
continuous adjoint (`ZUKO_TPU_CNF_ADJ=kernel`, the TPU default).

r69 pinned 160.6K samples/s at b=4096 — the batch the original XLA-adjoint
comparison used. After r72/r73 (launch-bound below ~100K rows) the CNF VI
step deserves its own scaling curve: dopri45 iterations dominate, but the
per-dispatch overhead at 4096 rows may still be a large fraction.
Blocked per-run timings, losses printed (the r59 rule)."""
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
flow = flows.CNF(D, 0, key=jax.random.PRNGKey(0))
params0, static = partition(flow)
opt = optax.adam(1e-3)
STEPS = 3


def fresh():
    p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params0)
    return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))


for B in (4096, 32768, 131072):
    def loss_fn(p, k):
        d = combine(p, static)(None)
        xs, lq = d.rsample_and_log_prob(k, (B,))
        return jnp.mean(lq) - jnp.mean(ring_energy(xs))

    @fpartial(jax.jit, donate_argnums=0)
    def run(state, k):
        def body(st, i):
            loss, g = jax.value_and_grad(loss_fn)(
                st.params, jax.random.fold_in(k, i))
            u, o = opt.update(g, st.opt_state, st.params)
            return TrainState(optax.apply_updates(st.params, u), o,
                              st.step + 1), loss
        return jax.lax.scan(body, state, jnp.arange(STEPS))

    st, losses = run(fresh(), jax.random.PRNGKey(0))
    jax.block_until_ready((st.params, losses))
    for r in range(3):
        st = fresh()
        t0 = time.perf_counter()
        st, losses = run(st, jax.random.PRNGKey(r))
        jax.block_until_ready((st.params, losses))
        dt = time.perf_counter() - t0
        print(f"CNF VI step b={B} run {r}: {1e3*dt:.0f} ms -> "
              f"{B*STEPS/dt/1e3:.1f}K samples/s  "
              f"losses {np.asarray(losses).round(3)}", flush=True)

print("done", flush=True)
