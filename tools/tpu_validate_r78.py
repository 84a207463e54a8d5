r"""Batch 78 (round 4): production-batch re-pins for the remaining rows —
GMM density (diag + full covariance; round-2 full-cov row was 41M
evals/s at b=65536) and the INVERTED-flow reverse-KL train step (the
reference tutorial recipe `Flow(flow.transform.inv, flow.base)`; r66
pinned 10.9M samples/s at b=65536). Blocked per-run timings."""
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
from zuko_tpu.lazy import Flow
from zuko_tpu.mixtures import GMM
from zuko_tpu.parallel.train import TrainState

D = 6
KEY = jax.random.PRNGKey(0)

# ---------------- GMM density at scale
for cov in ("diagonal", "full"):
    gmm = GMM(43, 0, components=10, covariance_type=cov, key=KEY)
    params, static = partition(gmm)
    for B in (65536, 1048576):
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 43))

        def dens(p, v):
            def body(carry, _):
                d = combine(p, static)(None)
                return carry + jnp.sum(d.log_prob(v + 1e-9 * carry)), None
            o, _ = jax.lax.scan(body, 0.0, None, length=5)
            return o
        fn = jax.jit(dens)
        fn(params, x).block_until_ready()
        for r in range(3):
            t0 = time.perf_counter()
            fn(params, x).block_until_ready()
            dt = time.perf_counter() - t0
            print(f"GMM({cov}) density D=43 K=10 b={B} run {r}: "
                  f"{1e3*dt:.0f} ms -> {B*5/dt/1e6:.1f}M evals/s",
                  flush=True)

# ---------------- inverted-flow reverse-KL step at scale
nsf = flows.NSF(D, 0, transforms=3, key=KEY)
inv = Flow(nsf.transform.inv, nsf.base)
params0, static = partition(inv)
opt = optax.adam(1e-3)
STEPS = 3


def fresh():
    p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params0)
    return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))


for B in (65536, 1048576):
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
        print(f"inverted-flow VI step b={B} run {r}: {1e3*dt:.0f} ms -> "
              f"{B*STEPS/dt/1e6:.2f}M samples/s  "
              f"losses {np.asarray(losses).round(3)}", flush=True)

print("done", flush=True)
