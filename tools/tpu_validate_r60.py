r"""On-hardware batch 60: the GF IFT tier. VI train step through dispatch
(fused bisection forward + diagonal/orthogonal IFT backward) vs the XLA
scan-inverse backward, per-run timings (the r59c artifact lesson)."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
import optax
from zuko_tpu.core import combine, partition
from zuko_tpu.distributions import NormalizingFlow
from zuko_tpu.flows import GF
from zuko_tpu.parallel.train import TrainState

flow = GF(6, 0, transforms=3, key=jax.random.PRNGKey(0))
params, static = partition(flow)
# damp: random-init GF saturates (both sides documented init-fragile)
params = jax.tree_util.tree_map(
    lambda a: a * 0.2 if hasattr(a, "dtype") else a, params)
BATCH, STEPS = 16384, 5
opt = optax.adam(1e-3)

def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5

def loss_fn(p, key, force_xla=False):
    d = combine(p, static)(None)
    if force_xla:
        d = NormalizingFlow(d.transform, d.base)
    xs, lq = d.rsample_and_log_prob(key, (BATCH,))
    return jnp.mean(lq) - jnp.mean(ring(xs))

def fresh():
    p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)
    return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

def bench(force_xla, label):
    @partial(jax.jit, donate_argnums=0)
    def run(state, key):
        def body(st, i):
            loss, g = jax.value_and_grad(loss_fn)(
                st.params, jax.random.fold_in(key, i), force_xla)
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
        print(f"{label} run {r}: {1e3*dt:.1f} ms -> "
              f"{BATCH*STEPS/dt/1e3:.1f}K samples/s  "
              f"losses {np.asarray(losses).round(3)}", flush=True)

bench(False, "GF IFT VI")
bench(True, "GF XLA-backward VI")
print("done", flush=True)
