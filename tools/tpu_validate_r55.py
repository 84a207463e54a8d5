r"""On-hardware batch 55: the r50 winners as DEFAULTS, validated.

A) Fused bin-select as the default (`_FUSED_BINSEL=1`): flagship density
   accuracy vs the pinned f64 truth + rate, fused sample /
   sample_and_log_prob rates, and the IFT reverse-KL VI step (rate + f32
   grad accuracy vs the CPU XLA path) — the flag reroutes the density,
   the solve forward, AND the IFT march/linearization, so all three tiers
   are re-pinned. Off-toggle control rows for the A/B record.

B) UNAF sampling at the new default quadrature config (GL-4 coarse, GL-8
   Newton, 4 polish steps — r50 sweep winner, 296.8K vs 191.7K samples/s):
   rate confirm + sample agreement vs the long-validated previous config
   (GL-8/GL-16/3) on the same keys + fused density finiteness at the draws.
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from functools import partial

print("backend:", jax.default_backend(), flush=True)

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

import optax

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF, UNAF
from zuko_tpu.ops import naf_fused as nafm, nsf_fused as nf
from zuko_tpu.parallel.train import TrainState

assert nf._FUSED_BINSEL, "binsel should now be the default"

# ------------------------------------------------------------ A) flagship
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
    print(f"A {label} density: {best:,.0f} evals/s  err max {e.max():.3e}"
          f" median {np.median(e):.3e}", flush=True)


def bench_sampling(label, want_log_prob):
    NS = 65536

    def loop(key):
        def body(carry, i):
            k = jax.random.fold_in(key, i)
            if want_log_prob:
                xs, lp = nf.fused_nsf_sample(flow, k, (NS,),
                                             want_log_prob=True)
                return carry + jnp.sum(lp) + jnp.sum(xs[:, 0]), None
            xs = nf.fused_nsf_sample(flow, k, (NS,))
            return carry + jnp.sum(xs[:, 0]), None
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
    print(f"A {label} {'sample+logq' if want_log_prob else 'sample'}:"
          f" {best / 1e6:.2f}M samples/s", flush=True)


# IFT VI step (r52/r54 shape) + f32 grad accuracy vs CPU XLA path
def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5


BATCH, STEPS = 65536, 10
opt = optax.adam(1e-3)
cpu = jax.devices("cpu")[0]


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
                st.params, jax.random.fold_in(key, i)
            )
            u, o = opt.update(g, st.opt_state, st.params)
            return TrainState(
                optax.apply_updates(st.params, u), o, st.step + 1
            ), loss
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

    k0 = jax.random.PRNGKey(3)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    with jax.default_device(cpu):
        g_ref = jax.tree_util.tree_map(
            np.asarray,
            jax.grad(loss_fn)(
                jax.tree_util.tree_map(lambda a: jax.device_put(a, cpu),
                                       params),
                jax.device_put(k0, cpu),
            ),
        )
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    g = jax.tree_util.tree_map(
        np.asarray, jax.jit(jax.grad(loss_fn))(params, k0)
    )
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        worst = max(worst, float(
            np.abs(a - b).max() / (np.abs(b).max() + 1e-12)))
    print(f"A {label} VI step: {best / 1e6:.2f}M samples/s  grad"
          f" worst-leaf rel vs CPU {worst:.3e}", flush=True)


for binsel in [True, False, True]:  # default / control / re-check
    nf._FUSED_BINSEL = binsel
    bench_density(f"binsel={int(binsel)}")
nf._FUSED_BINSEL = True
bench_sampling("binsel=1", want_log_prob=False)
bench_sampling("binsel=1", want_log_prob=True)
bench_vi("binsel=1")

# ------------------------------------------------------------- B) UNAF
uflow = UNAF(6, 0, transforms=3, signal=8, key=jax.random.PRNGKey(2))
NS = 16384


def bench_unaf(label):
    j = jax.jit(lambda k: nafm.fused_naf_sample(uflow, k, (NS,)))
    xs0 = j(jax.random.PRNGKey(9))
    xs0.block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [j(jax.random.PRNGKey(i)) for i in range(3)]
        outs[-1].block_until_ready()
        best = max(best, NS * 3 / (time.perf_counter() - t0))
    lp = jax.jit(lambda v: nafm.fused_naf_log_prob(uflow, v))(xs0)
    print(f"B {label}: {best / 1e3:.1f}K samples/s  density finite"
          f" {bool(jnp.all(jnp.isfinite(lp)))}", flush=True)
    return np.asarray(xs0)


x_new = bench_unaf("new default 4c/8n/4N")

# previous validated config for the accuracy A/B (same keys)
nafm._UMNN_COARSE_N = 8
nafm._GL_NODES_C, nafm._GL_WEIGHTS_C = np.polynomial.legendre.leggauss(8)
nafm._UMNN_NEWTON_N = 16
nafm._GL_NODES_N, nafm._GL_WEIGHTS_N = np.polynomial.legendre.leggauss(16)
nafm._N_NEWTON_UMNN = 3
x_old = bench_unaf("previous 8c/16n/3N")
print(f"B sample agreement new-vs-previous: max abs"
      f" {np.abs(x_new - x_old).max():.3e}  median"
      f" {np.median(np.abs(x_new - x_old)):.3e}", flush=True)

print("done", flush=True)
