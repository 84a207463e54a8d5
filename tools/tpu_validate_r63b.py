r"""Batch 63b: quiet-host re-pin of the rows r63 contaminated (the CPU
test battery ran concurrently): NSF VI, BPF VI (sanity on its
surprisingly high rate), and the NSF MLE train step."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
import optax
from zuko_tpu import flows
from zuko_tpu.core import combine, partition
from zuko_tpu.parallel.train import TrainState, make_mle_step

def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5

def vi(name, flow, batch, steps=5):
    params, static = partition(flow)
    opt = optax.adam(1e-3)
    def loss_fn(p, key):
        dd = combine(p, static)(None)
        xs, lq = dd.rsample_and_log_prob(key, (batch,))
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
        return jax.lax.scan(body, state, jnp.arange(steps))
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
          + " / ".join(f"{x/1e6:.2f}M" for x in rates)
          + f" samples/s  loss[-1] {float(losses[-1]):.3f}", flush=True)

k = jax.random.PRNGKey(0)
vi("NSF", flows.NSF(6, 0, transforms=3, key=k), 65536, 10)
vi("BPF", flows.BPF(6, 0, transforms=3, key=k), 16384)

flow = flows.NSF(6, 0, transforms=3, key=k)
params, static = partition(flow)
init_fn, step_fn = make_mle_step(static, lr=1e-3)
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))
state = init_fn(params)
state, loss = step_fn(state, x)
jax.block_until_ready(state.params)
for r in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
        state, loss = step_fn(state, x + 1e-9 * loss)
    jax.block_until_ready(state.params)
    print(f"NSF MLE train step run {r}: "
          f"{65536*5/(time.perf_counter()-t0)/1e6:.2f}M examples/s",
          flush=True)
print("done", flush=True)
