r"""Batch 70 (round 4): the GF stable-ladj kernel on hardware.

The round-4 GF fix replaced `log(sum_i s_i exp(-z_i^2/2))` with a streaming
logsumexp inside the fused kernel (`gf_fused._gauss_mean_F`). This batch
(a) confirms the new form lowers through Mosaic and keeps density parity
with the XLA path, (b) pins the saturated-params case finite ON THE KERNEL
PATH, and (c) re-measures GF density + VI throughput vs the round-3 table
(density row: PERF.md; VI 2.3M samples/s at b=16384, damped init)."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
import optax
from zuko_tpu import flows
from zuko_tpu.core import combine, named_parameters, partition, update_parameters
from zuko_tpu.parallel.train import TrainState

key = jax.random.PRNGKey(0)
flow = flows.GF(6, 0, transforms=3, key=key)
x = jax.random.normal(jax.random.PRNGKey(1), (16384, 6))

# (a) parity: fused vs XLA on hardware
d = flow(None)
print("dispatch:", type(d).__name__, flush=True)
lp_f = jax.jit(lambda v: flow(None).log_prob(v))(x)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
lp_x = jax.jit(lambda v: flow(None).log_prob(v))(x)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
jax.block_until_ready((lp_f, lp_x))
print(f"GF density fused-vs-XLA: median {float(jnp.median(jnp.abs(lp_f-lp_x))):.2e} "
      f"max {float(jnp.abs(lp_f-lp_x).max()):.2e}", flush=True)

# (b) saturated params stay finite through the KERNEL
updates = {}
for n, a in named_parameters(flow):
    if "transforms.0" in n and n.endswith("phi.0"):
        updates[n] = jnp.full_like(a, 50.0)
sat = update_parameters(flow, updates)
lp_sat = jax.jit(lambda v: sat(None).log_prob(v))(x[:4096])
jax.block_until_ready(lp_sat)
print(f"saturated GF kernel log_prob finite: {bool(jnp.all(jnp.isfinite(lp_sat)))} "
      f"(mean {float(lp_sat.mean()):.1f})", flush=True)
params_s, static_s = partition(sat)
g = jax.jit(jax.grad(lambda p: -jnp.mean(combine(p, static_s)(None).log_prob(x[:4096]))))(params_s)
finite = all(bool(jnp.all(jnp.isfinite(a))) for _, a in named_parameters(g))
print(f"saturated GF kernel grads finite: {finite}", flush=True)

# (c) throughput re-pins
@jax.jit
def dens_loop(v):
    def body(carry, _):
        return carry + jnp.sum(flow(None).log_prob(v + 1e-9 * carry)), None
    out, _ = jax.lax.scan(body, 0.0, None, length=10)
    return out
dens_loop(x).block_until_ready()
for r in range(3):
    t0 = time.perf_counter()
    dens_loop(x).block_until_ready()
    dt = time.perf_counter() - t0
    print(f"GF density run {r}: {16384*10/dt/1e6:.1f}M evals/s", flush=True)

def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5

params, static = partition(flow)
params = jax.tree_util.tree_map(
    lambda a: a * 0.2 if hasattr(a, "dtype") else a, params)
opt = optax.adam(1e-3)
BATCH, STEPS = 16384, 5

def loss_fn(p, k):
    dd = combine(p, static)(None)
    xs, lq = dd.rsample_and_log_prob(k, (BATCH,))
    return jnp.mean(lq) - jnp.mean(ring(xs))

@partial(jax.jit, donate_argnums=0)
def run(state, k):
    def body(st, i):
        loss, g = jax.value_and_grad(loss_fn)(st.params, jax.random.fold_in(k, i))
        u, o = opt.update(g, st.opt_state, st.params)
        return TrainState(optax.apply_updates(st.params, u), o, st.step + 1), loss
    return jax.lax.scan(body, state, jnp.arange(STEPS))

def fresh():
    p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)
    return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

st, losses = run(fresh(), jax.random.PRNGKey(0))
jax.block_until_ready((st.params, losses))
for r in range(3):
    st = fresh()
    t0 = time.perf_counter()
    st, losses = run(st, jax.random.PRNGKey(r))
    jax.block_until_ready((st.params, losses))
    dt = time.perf_counter() - t0
    print(f"GF VI run {r}: {BATCH*STEPS/dt/1e6:.2f}M samples/s  "
          f"losses {np.asarray(losses).round(3)}", flush=True)
print("done", flush=True)
