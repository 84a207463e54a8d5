r"""On-hardware batch 59c: NAF/UNAF IFT re-pin after the solve-consistency
mask (r59's 3.7e-1 grad deviation was 2 PEGGED rows whose cotangents are
now zeroed; peg-excluded CPU agreement is 2.98e-3). Grad check compares
TPU f32 vs CPU f32 THROUGH THE SAME DISPATCH PATH (both masked), isolating
TPU numerics from the masking-policy difference vs the XLA path."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
import optax
from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NAF, UNAF
from zuko_tpu.parallel.train import TrainState

cpu = jax.devices("cpu")[0]

def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5

def run_family(name, flow, batch, steps):
    params, static = partition(flow)
    opt = optax.adam(1e-3)

    def loss_fn(p, key):
        d = combine(p, static)(None)
        xs, lq = d.rsample_and_log_prob(key, (batch,))
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

    st, _ = run(fresh(), jax.random.PRNGKey(0))
    jax.block_until_ready(st.params)
    best = 0.0
    for r in range(3):
        st = fresh()
        t0 = time.perf_counter()
        st, losses = run(st, jax.random.PRNGKey(r))
        jax.block_until_ready(st.params)
        best = max(best, batch * steps / (time.perf_counter() - t0))

    k0 = jax.random.PRNGKey(3)
    from zuko_tpu.ops import naf_fused as nafm
    orig = nafm._use_pallas_fused
    nafm._use_pallas_fused = lambda dt: False  # jnp fallback, same IFT math
    try:
        with jax.default_device(cpu):
            g_ref = jax.tree_util.tree_map(
                np.asarray,
                jax.grad(loss_fn)(
                    jax.tree_util.tree_map(lambda a: jax.device_put(a, cpu),
                                           params),
                    jax.device_put(k0, cpu)))
    finally:
        nafm._use_pallas_fused = orig
    g = jax.tree_util.tree_map(
        np.asarray, jax.jit(jax.grad(loss_fn))(params, k0))
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        worst = max(worst, float(
            np.abs(a - b).max() / (np.abs(b).max() + 1e-12)))
    print(f"{name} IFT VI step (b={batch}): {best/1e3:.1f}K samples/s  "
          f"grad worst-leaf rel vs CPU(same path) {worst:.3e}  "
          f"final loss {float(losses[-1]):.3f}", flush=True)

run_family("NAF", NAF(6, 0, transforms=3, key=jax.random.PRNGKey(0)),
           batch=16384, steps=5)
run_family("UNAF", UNAF(6, 0, transforms=3, signal=8,
                        key=jax.random.PRNGKey(1)), batch=4096, steps=5)
print("done", flush=True)
