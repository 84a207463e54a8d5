r"""Batch 67 (round 4): the CNF VI hardware row — the fused continuous
adjoint (fused_cnf_rsample: fused dopri45 forward + one augmented adjoint
integration backward) vs the r61 baseline (45K samples/s through the XLA
odeint + stored-step discrete adjoint at b=4096). Same config as r61
(CNF(6), ring energy, Adam, 3 scanned steps), per-run timings + loss
trajectories printed per the timing discipline. Also pins the fused-vs-XLA
rsample VALUE equality on hardware and the gradient health (finite,
loss decreasing)."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
import optax
from zuko_tpu.core import combine, partition
from zuko_tpu.distributions import NormalizingFlow
from zuko_tpu.flows import CNF
from zuko_tpu.parallel.train import TrainState

flow = CNF(6, key=jax.random.PRNGKey(0))
params, static = partition(flow)
BATCH, STEPS = 4096, 3
opt = optax.adam(1e-3)

def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5

# 0) value parity on hardware: fused rsample draw == XLA draw
d = combine(params, static)(None)
dx = NormalizingFlow(d.transform, d.base)
k0 = jax.random.PRNGKey(3)
xf, lqf = jax.jit(lambda k: d.rsample_and_log_prob(k, (1024,)))(k0)
xr, lqr = jax.jit(lambda k: dx.rsample_and_log_prob(k, (1024,)))(k0)
jax.block_until_ready((xf, xr))
print(f"rsample value parity: max|dx|={float(jnp.abs(xf-xr).max()):.2e} "
      f"max|dlq|={float(jnp.abs(lqf-lqr).max()):.2e}", flush=True)

def make_run(use_fused):
    def loss_fn(p, key):
        dd = combine(p, static)(None)
        if not use_fused:
            dd = NormalizingFlow(dd.transform, dd.base)
        xs, lq = dd.rsample_and_log_prob(key, (BATCH,))
        return jnp.mean(lq) - jnp.mean(ring(xs))

    @partial(jax.jit, donate_argnums=0)
    def run(state, key):
        def body(st, i):
            loss, g = jax.value_and_grad(loss_fn)(
                st.params, jax.random.fold_in(key, i))
            u, o = opt.update(g, st.opt_state, st.params)
            return TrainState(optax.apply_updates(st.params, u), o,
                              st.step + 1), loss
        return jax.lax.scan(body, state, jnp.arange(STEPS))
    return run

def fresh():
    p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)
    return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

for name, use_fused in (("fused continuous adjoint", True),
                        ("XLA discrete adjoint", False)):
    run = make_run(use_fused)
    t0 = time.perf_counter()
    st, losses = run(fresh(), jax.random.PRNGKey(0))
    jax.block_until_ready((st.params, losses))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    for r in range(3):
        st = fresh()
        t0 = time.perf_counter()
        st, losses = run(st, jax.random.PRNGKey(r))
        jax.block_until_ready((st.params, losses))
        dt = time.perf_counter() - t0
        fin = bool(np.isfinite(np.asarray(losses)).all())
        print(f"CNF VI ({name}) run {r}: {1e3*dt:.1f} ms -> "
              f"{BATCH*STEPS/dt/1e3:.1f}K samples/s  finite={fin}  "
              f"losses {np.asarray(losses).round(3)}", flush=True)

# longer fused run: the loss must actually optimize (gate not tripping)
run = make_run(True)
st = fresh()
ls = []
for r in range(10):
    st, losses = run(st, jax.random.PRNGKey(100 + r))
    ls += list(np.asarray(losses))
print(f"fused 30-step trajectory: first3 {np.round(ls[:3],3)} "
      f"last3 {np.round(ls[-3:],3)} all-finite={np.isfinite(ls).all()}",
      flush=True)
print("done", flush=True)
