r"""On-hardware batch 59: the NAF/UNAF IFT tier. VI train step (fused
solve forward + IFT backward through dispatch) rate + f32 grad accuracy
vs the CPU XLA path; same-session XLA-backward baseline at a small batch
for the honest ratio."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
import optax
from zuko_tpu.core import combine, partition
from zuko_tpu.distributions import NormalizingFlow
from zuko_tpu.flows import NAF, UNAF
from zuko_tpu.parallel.train import TrainState

cpu = jax.devices("cpu")[0]

def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5

def run_family(name, flow, batch, steps, xla_batch):
    params, static = partition(flow)
    opt = optax.adam(1e-3)

    def loss_fn(p, key, b, force_xla=False):
        d = combine(p, static)(None)
        if force_xla:
            d = NormalizingFlow(d.transform, d.base)
        xs, lq = d.rsample_and_log_prob(key, (b,))
        return jnp.mean(lq) - jnp.mean(ring(xs))

    def fresh():
        p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)
        return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

    def make(b, force_xla):
        @partial(jax.jit, donate_argnums=0)
        def run(state, key):
            def body(st, i):
                loss, g = jax.value_and_grad(loss_fn)(
                    st.params, jax.random.fold_in(key, i), b, force_xla)
                u, o = opt.update(g, st.opt_state, st.params)
                return TrainState(optax.apply_updates(st.params, u), o,
                                  st.step + 1), loss
            return jax.lax.scan(body, state, jnp.arange(steps))
        return run

    run_ift = make(batch, False)
    st, _ = run_ift(fresh(), jax.random.PRNGKey(0))
    jax.block_until_ready(st.params)
    best = 0.0
    for r in range(3):
        st = fresh()
        t0 = time.perf_counter()
        st, losses = run_ift(st, jax.random.PRNGKey(r))
        jax.block_until_ready(st.params)
        best = max(best, batch * steps / (time.perf_counter() - t0))

    # f32 grad accuracy vs the CPU XLA path
    k0 = jax.random.PRNGKey(3)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    with jax.default_device(cpu):
        g_ref = jax.tree_util.tree_map(
            np.asarray,
            jax.grad(lambda p, k: loss_fn(p, k, batch))(
                jax.tree_util.tree_map(lambda a: jax.device_put(a, cpu),
                                       params),
                jax.device_put(k0, cpu)))
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    g = jax.tree_util.tree_map(
        np.asarray,
        jax.jit(jax.grad(lambda p, k: loss_fn(p, k, batch)))(params, k0))
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        worst = max(worst, float(
            np.abs(a - b).max() / (np.abs(b).max() + 1e-12)))
    print(f"{name} IFT VI step (b={batch}): {best/1e3:.1f}K samples/s  "
          f"grad worst-leaf rel vs CPU {worst:.3e}  "
          f"final loss {float(losses[-1]):.3f}", flush=True)

    # XLA-backward baseline
    run_xla = make(xla_batch, True)
    st, _ = run_xla(fresh(), jax.random.PRNGKey(0))
    jax.block_until_ready(st.params)
    best_x = 0.0
    for r in range(2):
        st = fresh()
        t0 = time.perf_counter()
        st, _ = run_xla(st, jax.random.PRNGKey(r))
        jax.block_until_ready(st.params)
        best_x = max(best_x, xla_batch * steps / (time.perf_counter() - t0))
    print(f"{name} XLA-backward VI step (b={xla_batch}): "
          f"{best_x/1e3:.1f}K samples/s", flush=True)

run_family("NAF", NAF(6, 0, transforms=3, key=jax.random.PRNGKey(0)),
           batch=16384, steps=5, xla_batch=2048)
run_family("UNAF", UNAF(6, 0, transforms=3, signal=8,
                        key=jax.random.PRNGKey(1)),
           batch=4096, steps=5, xla_batch=1024)
print("done", flush=True)
