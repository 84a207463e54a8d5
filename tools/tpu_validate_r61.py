r"""Batch 61: profile the CNF VI step (the one family whose rsample keeps
the XLA odeint + discrete adjoint) and its fused non-differentiable
sampler, to size ROADMAP item 4. Per-run timings."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
import optax
from zuko_tpu.core import combine, partition
from zuko_tpu.flows import CNF
from zuko_tpu.parallel.train import TrainState

flow = CNF(6, key=jax.random.PRNGKey(0))
params, static = partition(flow)
BATCH, STEPS = 4096, 3
opt = optax.adam(1e-3)

def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5

# fused non-differentiable sampler rate (the ceiling)
d = combine(params, static)(None)
fwd = jax.jit(lambda k: d.sample_and_log_prob(k, (BATCH,)))
x, lq = fwd(jax.random.PRNGKey(0)); jax.block_until_ready((x, lq))
for i in range(2):
    t0 = time.perf_counter()
    x, lq = fwd(jax.random.PRNGKey(i)); jax.block_until_ready((x, lq))
    print(f"fused sample+logq fwd: {1e3*(time.perf_counter()-t0):.1f} ms -> "
          f"{BATCH/(time.perf_counter()-t0)/1e3:.1f}K samples/s", flush=True)

def loss_fn(p, key):
    dd = combine(p, static)(None)
    xs, lq = dd.rsample_and_log_prob(key, (BATCH,))
    return jnp.mean(lq) - jnp.mean(ring(xs))

def fresh():
    p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)
    return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

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
for r in range(2):
    st = fresh()
    t0 = time.perf_counter()
    st, losses = run(st, jax.random.PRNGKey(r))
    jax.block_until_ready((st.params, losses))
    dt = time.perf_counter() - t0
    print(f"CNF VI (XLA odeint adjoint) run {r}: {1e3*dt:.1f} ms -> "
          f"{BATCH*STEPS/dt/1e3:.1f}K samples/s  "
          f"losses {np.asarray(losses).round(3)}", flush=True)
print("done", flush=True)
