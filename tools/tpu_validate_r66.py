r"""Batch 66: the inverted-flow dispatch tier on hardware. The reference's
reverse-KL recipe (Flow(transform.inv, base)) previously fell back to the
XLA path; now sample/rsample ride the fused forward-APPLY kernel (new
pallas program) and log_prob rides the fused solve with raw-IFT gradients.
Rates + the tutorial-protocol convergence anchor + f32 grad check."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
import optax
from zuko_tpu.core import combine, partition
from zuko_tpu.data import ring_energy
from zuko_tpu.distributions import NormalizingFlow
from zuko_tpu.flows import NSF, Flow
from zuko_tpu.ops.dispatch import FusedInvertedAutoregressiveFlow
from zuko_tpu.parallel import make_reverse_kl_step
from zuko_tpu.parallel.train import TrainState

flow = NSF(6, 0, transforms=3, key=jax.random.PRNGKey(0))
inv = Flow(flow.transform.inv, flow.base)
params, static = partition(inv)
d = combine(params, static)(None)
print("dispatched:", type(d).__name__, flush=True)
assert isinstance(d, FusedInvertedAutoregressiveFlow)

BATCH = 65536
# A) rates: rsample_and_log_prob (apply) and log_prob (solve)
j = jax.jit(lambda k: d.rsample_and_log_prob(k, (BATCH,)))
x, lq = j(jax.random.PRNGKey(0)); jax.block_until_ready((x, lq))
for i in range(3):
    t0 = time.perf_counter()
    x, lq = j(jax.random.PRNGKey(i)); jax.block_until_ready((x, lq))
    print(f"inv rsample+logq (apply): {BATCH/(time.perf_counter()-t0)/1e6:.2f}M samples/s",
          flush=True)
xq = jax.random.normal(jax.random.PRNGKey(9), (BATCH, 6))
jl = jax.jit(d.log_prob)
lp = jl(xq); lp.block_until_ready()
for i in range(3):
    t0 = time.perf_counter()
    lp = jl(xq + 1e-9 * i); lp.block_until_ready()
    print(f"inv log_prob (solve): {BATCH/(time.perf_counter()-t0)/1e6:.2f}M evals/s",
          flush=True)

# B) VI train step (apply-only forward: should be FAST)
opt = optax.adam(1e-3)
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
@partial(jax.jit, donate_argnums=0)
def run(state, key):
    def body(st, i):
        loss, g = jax.value_and_grad(loss_fn)(
            st.params, jax.random.fold_in(key, i))
        u, o = opt.update(g, st.opt_state, st.params)
        return TrainState(optax.apply_updates(st.params, u), o,
                          st.step + 1), loss
    return jax.lax.scan(body, state, jnp.arange(10))
st, losses = run(fresh(), jax.random.PRNGKey(0))
jax.block_until_ready((st.params, losses))
for r in range(3):
    st = fresh()
    t0 = time.perf_counter()
    st, losses = run(st, jax.random.PRNGKey(r))
    jax.block_until_ready((st.params, losses))
    print(f"inv VI step run {r}: {BATCH*10/(time.perf_counter()-t0)/1e6:.2f}M samples/s"
          f"  loss[-1] {float(losses[-1]):.3f}", flush=True)

# C) tutorial-protocol convergence through the dispatched inverted flow
flow2 = NSF(2, 0, transforms=3, key=jax.random.PRNGKey(0))
inv2 = Flow(flow2.transform.inv, flow2.base)
p2, s2 = partition(inv2)
init_fn, step_fn = make_reverse_kl_step(s2, ring_energy, n_samples=256,
                                        lr=1e-3)
state = init_fn(p2)
@jax.jit
def epoch_fn(state, key):
    keys = jax.random.split(key, 256)
    return jax.lax.scan(lambda st, k: step_fn(st, k), state, keys)
for e in range(8):
    state, losses = epoch_fn(state, jax.random.fold_in(jax.random.PRNGKey(0), e))
losses = np.asarray(losses)
print(f"tutorial anchor: final-epoch loss {losses.mean():.4f} +- {losses.std():.3f}"
      f"  (reference -1.5888 +- 0.018)", flush=True)
print("done", flush=True)
