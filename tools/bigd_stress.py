r"""Big-D stress anchor: MINIBOONE-shaped (D=43) at production batch
(b=65536) through the fused tier, truth-checked against CPU f64.

This is the shape class where the round-2/3 hazards actually live: the
XLA:TPU composed-flow miscompile above ~12-16K rows at some feature counts
(NormalizingFlow._XLA_SAFE_ROWS chunk guard), unaligned-F slab slicing, and
pegged IFT solves at production sample counts. The digits head-to-heads
stop at D=64/b=256-scale; this pins the big-batch class.

Two phases:

    python tools/bigd_stress.py --truth     # CPU f64: writes the anchor npz
    python tools/bigd_stress.py             # TPU: fused vs truth + IFT VI

Truth protocol: a fixed NSF(43) (PRNGKey 7) after a SHORT surrogate-MLE
warmup (so the spline params are not at init), a fixed (65536, 43) input
batch, log-densities + a reverse-KL parameter gradient in f64 on CPU.
TPU phase: fused log_prob at b=65536 in one call (median/max abs error vs
truth), fused IFT rsample VI step at b=65536 (loss finite + gradient
cosine/rel-error vs the f64 truth gradient), per-run timings.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, ".")

p = argparse.ArgumentParser()
p.add_argument("--truth", action="store_true", help="CPU f64 anchor phase")
p.add_argument("--npz", default="tools/bigd_truth_f64.npz")
p.add_argument("--steps", type=int, default=3)
args = p.parse_args()

import jax

if args.truth:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
os.environ.setdefault("ZUKO_TPU_FUSED_DISPATCH", "auto" if not args.truth else "0")

import jax.numpy as jnp
import numpy as np

from zuko_tpu import combine, partition
from zuko_tpu.core import named_parameters
from zuko_tpu.data import uci_dataset
from zuko_tpu.flows import NSF

print("backend:", jax.default_backend(), flush=True)

D, B = 43, 65536
train, _, _ = uci_dataset("miniboone", n=B)
train = np.asarray(train[:B], np.float64)

def build(dtype):
    flow = NSF(D, 0, transforms=3, hidden_features=(64, 64), bins=8,
               key=jax.random.PRNGKey(7))
    params, static = partition(flow)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
        params)
    return params, static

def warmup(params, static, x, n=50):
    import optax
    opt = optax.adam(1e-3)
    st = opt.init(params)
    @jax.jit
    def step(params, st, xb):
        def loss(p):
            return -jnp.mean(combine(p, static)(None).log_prob(xb))
        l, g = jax.value_and_grad(loss)(params)
        u, st2 = opt.update(g, st, params)
        return optax.apply_updates(params, u), st2, l
    for i in range(n):
        xb = x[(i * 1024) % (B - 1024):][:1024]
        params, st, l = step(params, st, xb)
    return params, float(l)

def rkl_loss(params, static, key, n):
    d = combine(params, static)(None)
    x, lq = d.rsample_and_log_prob(key, (n,))
    return jnp.mean(lq) + 0.05 * jnp.mean(jnp.sum(x**2, -1))

KEY_VI = jax.random.PRNGKey(3)

if args.truth:
    x = jnp.asarray(train, jnp.float64)
    params, static = build(jnp.float64)
    params, final = warmup(params, static, x)
    print(f"warmup final minibatch NLL {final:.3f}", flush=True)
    lp = combine(params, static)(None).log_prob(x)
    g = jax.grad(lambda p: rkl_loss(p, static, KEY_VI, 8192))(params)
    flat = {n: np.asarray(a) for n, a in named_parameters(params)}
    gflat = {"g:" + n: np.asarray(a) for n, a in named_parameters(g)}
    np.savez(args.npz, lp=np.asarray(lp), **flat, **gflat)
    print(f"wrote {args.npz}: lp ({lp.shape}), {len(flat)} param leaves, "
          f"{len(gflat)} grad leaves", flush=True)
    sys.exit(0)

# ---------------- TPU phase ----------------
from zuko_tpu.core import update_parameters

truth = np.load(args.npz)
params, static = build(jnp.float32)
updates = {n: jnp.asarray(truth[n], jnp.float32)
           for n, _ in named_parameters(params)}
flow32 = update_parameters(combine(params, static), updates)
params32, static32 = partition(flow32)
x32 = jnp.asarray(train, jnp.float32)

d = flow32(None)
print("dispatch type:", type(d).__name__, flush=True)
lp_fn = jax.jit(lambda p, xx: combine(p, static32)(None).log_prob(xx))
lp = lp_fn(params32, x32)
jax.block_until_ready(lp)
for r in range(3):
    t0 = time.perf_counter()
    lp = lp_fn(params32, x32)
    jax.block_until_ready(lp)
    dt = time.perf_counter() - t0
    print(f"fused log_prob b={B} run {r}: {1e3*dt:.1f} ms -> "
          f"{B/dt/1e6:.1f}M evals/s", flush=True)
err = np.abs(np.asarray(lp, np.float64) - truth["lp"])
rel = err / np.abs(truth["lp"])
print(f"density vs f64 truth: median {np.median(err):.2e} "
      f"max {err.max():.2e} (rel median {np.median(rel):.2e})", flush=True)
assert np.median(err) < 5e-3, "big-D density drifted from f64 truth"

# reverse-KL gradient vs f64 truth
g32 = jax.jit(jax.grad(lambda p: rkl_loss(p, static32, KEY_VI, 8192)))(params32)
cos_all, rel_all = [], []
for n, a in named_parameters(g32):
    gt = truth["g:" + n].ravel()
    av = np.asarray(a, np.float64).ravel()
    cos = float(av @ gt / (np.linalg.norm(av) * np.linalg.norm(gt) + 1e-30))
    cos_all.append(cos)
    rel_all.append(float(np.linalg.norm(av - gt) / (np.linalg.norm(gt) + 1e-30)))
print(f"VI grad vs f64 truth: min cosine {min(cos_all):.4f} "
      f"max rel-norm-err {max(rel_all):.3f}", flush=True)
assert min(cos_all) > 0.99, "gradient direction drifted"

# production-scale VI steps: b=65536 through the IFT tier
import optax
from functools import partial as fpartial
from zuko_tpu.parallel.train import TrainState
opt = optax.adam(1e-3)

@fpartial(jax.jit, donate_argnums=0)
def run(state, key):
    def body(st, i):
        loss, g = jax.value_and_grad(
            lambda p: rkl_loss(p, static32, jax.random.fold_in(key, i), B)
        )(st.params)
        u, o = opt.update(g, st.opt_state, st.params)
        return TrainState(optax.apply_updates(st.params, u), o,
                          st.step + 1), loss
    return jax.lax.scan(body, state, jnp.arange(args.steps))

def fresh():
    pz = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params32)
    return TrainState(pz, opt.init(pz), jnp.zeros((), jnp.int32))

st, losses = run(fresh(), jax.random.PRNGKey(0))
jax.block_until_ready((st.params, losses))
for r in range(3):
    st = fresh()
    t0 = time.perf_counter()
    st, losses = run(st, jax.random.PRNGKey(r))
    jax.block_until_ready((st.params, losses))
    dt = time.perf_counter() - t0
    print(f"IFT VI step b={B} run {r}: {1e3*dt:.1f} ms -> "
          f"{B*args.steps/dt/1e6:.2f}M samples/s  "
          f"losses {np.asarray(losses).round(2)}", flush=True)
assert np.isfinite(np.asarray(losses)).all()
print("done", flush=True)
