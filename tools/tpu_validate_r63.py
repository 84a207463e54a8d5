r"""Batch 63: the end-of-round per-family VI table at the FINAL defaults
(binsel+packed, ITER=fast, UNAF hybrid quadrature, pegged-row gate) plus
an MLE train-step re-pin. Per-run timing discipline (print every run)."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
import optax
from zuko_tpu import flows
from zuko_tpu.core import combine, partition
from zuko_tpu.parallel.train import TrainState

def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5

def vi(name, flow, batch, steps=5, damp=None):
    params, static = partition(flow)
    if damp:
        params = jax.tree_util.tree_map(
            lambda a: a * damp if hasattr(a, "dtype") else a, params)
    opt = optax.adam(1e-3)

    def loss_fn(p, key):
        dd = combine(p, static)(None)
        xs, lq = dd.rsample_and_log_prob(key, (batch,))
        return jnp.mean(lq) - jnp.mean(ring(xs))

    def fresh():
        p = jax.tree_util.tree_map(
            lambda a: jnp.array(a, copy=True), params)
        return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

    @partial(jax.jit, donate_argnums=0)
    def run(state, key):
        def body(st, i):
            loss, g = jax.value_and_grad(loss_fn)(
                st.params, jax.random.fold_in(key, i))
            u, o = opt.update(g, st.opt_state, st.params)
            return TrainState(optax.apply_updates(st.params, u), o,
                              st.step + 1), loss
        return jax.lax.scan(body, state, jnp.arange(steps))

    try:
        st, losses = run(fresh(), jax.random.PRNGKey(0))
        jax.block_until_ready((st.params, losses))
        rates = []
        for r in range(3):
            st = fresh()
            t0 = time.perf_counter()
            st, losses = run(st, jax.random.PRNGKey(r))
            jax.block_until_ready((st.params, losses))
            rates.append(batch * steps / (time.perf_counter() - t0))
        print(f"{name} VI (b={batch}): "
              + " / ".join(f"{x/1e3:.1f}K" for x in rates)
              + f" samples/s  loss[-1] {float(losses[-1]):.3f}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

k = jax.random.PRNGKey(0)
vi("NSF",   flows.NSF(6, 0, transforms=3, key=k), 65536, 10)
vi("MAF",   flows.MAF(6, 0, transforms=3, key=k), 65536, 10)
vi("NCSF",  flows.NCSF(6, 0, transforms=3, key=k), 65536, 10)
vi("SOSPF", flows.SOSPF(6, 0, transforms=3, key=k), 16384)
vi("BPF",   flows.BPF(6, 0, transforms=3, key=k), 16384)
vi("NAF",   flows.NAF(6, 0, transforms=3, key=k), 16384)
vi("UNAF",  flows.UNAF(6, 0, transforms=3, signal=8, key=k), 4096)
vi("GF",    flows.GF(6, 0, transforms=3, key=k), 16384, damp=0.2)

# MLE train-step re-pin at the final defaults
from zuko_tpu.parallel.train import make_mle_step
flow = flows.NSF(6, 0, transforms=3, key=k)
params, static = partition(flow)
init_fn, step_fn = make_mle_step(static, lr=1e-3)
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))
state = init_fn(params)
state, loss = step_fn(state, x)
jax.block_until_ready(state.params)
best = 0.0
for r in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
        state, loss = step_fn(state, x + 1e-9 * loss)
    jax.block_until_ready(state.params)
    best = max(best, 65536 * 5 / (time.perf_counter() - t0))
print(f"NSF MLE train step: {best/1e6:.2f}M examples/s", flush=True)
print("done", flush=True)
