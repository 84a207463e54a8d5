r"""On-hardware batch 57: the PACKED constraint tier A/B (the r56 lever —
the dissection put the flagship's headroom in slab-op issue overhead:
hyper-only floor 105.3M, full 84.1M, transcendentals only 2-3%). Packed
runs softclip/softmax/exp as whole-block chains ((K*F, TB)) with pairwise
tree reductions; slab is the r55 default. Density + fused sampling +
IFT VI step, control/lever/re-control."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from functools import partial
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
import optax
from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf
from zuko_tpu.parallel.train import TrainState

d = np.load("tools/nsf_truth_f64.npz")
X, LP64 = jnp.asarray(d["x"]), d["lp"]
flow = NSF(6, 0, transforms=3, hidden_features=(64, 64), bins=8,
           key=jax.random.PRNGKey(0))
params, static = partition(flow)
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))
REPS = 10


def bench_density(label):
    lp = jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(X)
    e = np.abs(np.asarray(lp, np.float64) - LP64)
    def loop(x):
        def body(carry, _):
            return carry + jnp.sum(
                nf.fused_nsf_log_prob(flow, x + 1e-9 * carry)), None
        out, _ = lax.scan(body, 0.0, None, length=REPS)
        return out
    j = jax.jit(loop)
    j(x).block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = j(x)
        out.block_until_ready()
        best = max(best, 65536 * REPS * 5 / (time.perf_counter() - t0))
    print(f"{label} density: {best:,.0f} evals/s  err max {e.max():.3e}"
          f" median {np.median(e):.3e}", flush=True)


def bench_sampling(label):
    NS = 65536
    def loop(key):
        def body(carry, i):
            k = jax.random.fold_in(key, i)
            xs, lp = nf.fused_nsf_sample(flow, k, (NS,), want_log_prob=True)
            return carry + jnp.sum(lp) + jnp.sum(xs[:, 0]), None
        out, _ = lax.scan(body, 0.0, jnp.arange(REPS))
        return out
    j = jax.jit(loop)
    j(jax.random.PRNGKey(0)).block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            out = j(jax.random.PRNGKey(1))
        out.block_until_ready()
        best = max(best, NS * REPS * 3 / (time.perf_counter() - t0))
    print(f"{label} sample+logq: {best/1e6:.2f}M samples/s", flush=True)


def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5

BATCH, STEPS = 65536, 10
opt = optax.adam(1e-3)

def loss_fn(p, key):
    dd = combine(p, static)(None)
    xs, lq = dd.rsample_and_log_prob(key, (BATCH,))
    return jnp.mean(lq) - jnp.mean(ring(xs))

def fresh():
    p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)
    return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

def bench_vi(label):
    @partial(jax.jit, donate_argnums=0)
    def run(state, key):
        def body(st, i):
            loss, g = jax.value_and_grad(loss_fn)(
                st.params, jax.random.fold_in(key, i))
            u, o = opt.update(g, st.opt_state, st.params)
            return TrainState(optax.apply_updates(st.params, u), o,
                              st.step + 1), loss
        return jax.lax.scan(body, state, jnp.arange(STEPS))
    st, _ = run(fresh(), jax.random.PRNGKey(0))
    jax.block_until_ready(st.params)
    best = 0.0
    for r in range(3):
        st = fresh()
        t0 = time.perf_counter()
        st, losses = run(st, jax.random.PRNGKey(r))
        jax.block_until_ready(st.params)
        best = max(best, BATCH * STEPS / (time.perf_counter() - t0))
    print(f"{label} VI step: {best/1e6:.2f}M samples/s", flush=True)


for packed in [False, True, False, True]:
    nf._BINSEL_PACKED = packed
    bench_density(f"packed={int(packed)}")
nf._BINSEL_PACKED = True
bench_sampling("packed=1")
bench_vi("packed=1")
nf._BINSEL_PACKED = False
bench_sampling("packed=0")
bench_vi("packed=0")
print("done", flush=True)
