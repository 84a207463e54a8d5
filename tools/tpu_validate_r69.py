r"""Batch 69 (round 4): the in-kernel CNF continuous adjoint on hardware.

A/B the CNF VI step (same r61/r67 protocol: CNF(6), b=4096, ring energy,
Adam, 3 scanned steps) with ZUKO_TPU_CNF_ADJ=kernel (the fused per-tile
adjoint integration, `_cnf_adjoint_pallas`) vs =xla (r67's odeint backward
over the fused forward, 84K samples/s) — plus a gradient cross-check
between the two backends at the init point (they integrate the same
system; r67 pinned value parity already)."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
import importlib
import optax
from zuko_tpu.core import combine, partition, named_parameters
from zuko_tpu.parallel.train import TrainState

BATCH, STEPS = 4096, 3

def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5

def bench(mode):
    os.environ["ZUKO_TPU_CNF_ADJ"] = mode
    import zuko_tpu.ops.cnf_fused as cfm
    importlib.reload(cfm)
    import zuko_tpu.ops.dispatch as dp
    importlib.reload(dp)
    from zuko_tpu.flows import CNF

    flow = CNF(6, key=jax.random.PRNGKey(0))
    params, static = partition(flow)
    opt = optax.adam(1e-3)

    def loss_fn(p, key):
        dd = combine(p, static)(None)  # public dispatch (FUSED=1)
        xs, lq = dd.rsample_and_log_prob(key, (BATCH,))
        return jnp.mean(lq) - jnp.mean(ring(xs))

    # gradient cross-check at init (one batch)
    g = jax.jit(jax.grad(loss_fn))(params, jax.random.PRNGKey(42))
    gvals = {n: np.asarray(a, np.float64) for n, a in named_parameters(g)}

    @partial(jax.jit, donate_argnums=0)
    def run(state, key):
        def body(st, i):
            loss, g = jax.value_and_grad(loss_fn)(
                st.params, jax.random.fold_in(key, i))
            u, o = opt.update(g, st.opt_state, st.params)
            return TrainState(optax.apply_updates(st.params, u), o,
                              st.step + 1), loss
        return jax.lax.scan(body, state, jnp.arange(STEPS))

    def fresh():
        p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)
        return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

    t0 = time.perf_counter()
    st, losses = run(fresh(), jax.random.PRNGKey(0))
    jax.block_until_ready((st.params, losses))
    print(f"[{mode}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    rates = []
    for r in range(3):
        st = fresh()
        t0 = time.perf_counter()
        st, losses = run(st, jax.random.PRNGKey(r))
        jax.block_until_ready((st.params, losses))
        dt = time.perf_counter() - t0
        rates.append(BATCH * STEPS / dt)
        print(f"[{mode}] CNF VI run {r}: {1e3*dt:.1f} ms -> "
              f"{rates[-1]/1e3:.1f}K samples/s  "
              f"losses {np.asarray(losses).round(3)}", flush=True)
    return gvals, max(rates)

g_k, rate_k = bench("kernel")
g_x, rate_x = bench("xla")
md, rel = 0.0, 0.0
for n in g_x:
    d = float(np.abs(g_k[n] - g_x[n]).max())
    md = max(md, d)
    rel = max(rel, d / (float(np.abs(g_x[n]).max()) + 1e-12))
print(f"grad cross-check kernel-vs-xla: max abs {md:.2e}  max rel {rel:.2e}",
      flush=True)
print(f"speed: kernel {rate_k/1e3:.1f}K vs xla {rate_x/1e3:.1f}K samples/s "
      f"({rate_k/rate_x:.2f}x)", flush=True)
print("done", flush=True)
