r"""Batch 71 (round 4): attribute the r70 GF fused-vs-XLA on-TPU gap
(median 6.9e-3) against CPU f64 truth — the round-2 lesson: two TPU paths
share transcendental noise, so their disagreement says nothing about which
is wrong. Compares BOTH paths to tools/gf_truth_f64.npz.

Truth protocol (the bigd_stress.py pattern — the first attempt rebuilt the
flow under x64, so `jax.random.normal` drew DIFFERENT parameter values
than the f32 flow on TPU; params must ride in the npz):

    python tools/tpu_validate_r71.py --truth   # CPU f64: writes the npz
    python tools/tpu_validate_r71.py           # TPU: both paths vs truth

The truth phase trains a GF(6) for 50 Adam steps on a synthetic 6-D
mixture (so the erf-mixture params are post-init, the regime users
measure), ROUNDS the final params to f32 (the dtype the TPU evaluates
at), and computes log-densities at those exact values in f64.
"""
import argparse
import os
import sys

sys.path.insert(0, ".")

p = argparse.ArgumentParser()
p.add_argument("--truth", action="store_true")
p.add_argument("--npz", default="tools/gf_truth_f64.npz")
args = p.parse_args()

import jax

if args.truth:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0" if args.truth else "1"

import jax.numpy as jnp
import numpy as np

from zuko_tpu import combine, partition
from zuko_tpu.core import named_parameters, update_parameters
from zuko_tpu.flows import GF

print("backend:", jax.default_backend(), flush=True)

D, B = 6, 16384


def build():
    return GF(D, 0, transforms=3, key=jax.random.PRNGKey(0))


def synth(key, n):
    """6-D two-component mixture: the digits-protocol stand-in."""
    k1, k2, k3 = jax.random.split(key, 3)
    comp = jax.random.bernoulli(k1, 0.5, (n, 1))
    mu = jnp.where(comp, 1.5, -1.5)
    return mu + jax.random.normal(k2, (n, D)) * jnp.where(comp, 0.6, 1.0)


if args.truth:
    import optax

    flow = build()
    params, static = partition(flow)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
        params)
    xtr = synth(jax.random.PRNGKey(9), B).astype(jnp.float64)
    opt = optax.adam(1e-3)
    st = opt.init(params)

    @jax.jit
    def step(params, st, xb):
        loss, g = jax.value_and_grad(
            lambda q: -jnp.mean(combine(q, static)(None).log_prob(xb)))(params)
        u, st2 = opt.update(g, st, params)
        return optax.apply_updates(params, u), st2, loss

    for i in range(50):
        xb = xtr[(i * 256) % (B - 256):][:256]
        params, st, loss = step(params, st, xb)
    print(f"warmup final minibatch NLL {float(loss):.3f}", flush=True)

    # round to f32 (what the TPU holds), then evaluate AT those values in f64
    params32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
        params)
    params64 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
        params32)
    x32 = synth(jax.random.PRNGKey(1), B).astype(jnp.float32)
    lp = combine(params64, static)(None).log_prob(x32.astype(jnp.float64))
    flat = {n: np.asarray(a, np.float32) for n, a in named_parameters(params32)}
    np.savez(args.npz, x=np.asarray(x32), lp=np.asarray(lp), **flat)
    print(f"wrote {args.npz}: lp ({lp.shape}), {len(flat)} param leaves",
          flush=True)
    sys.exit(0)

truth = np.load(args.npz)
x = jnp.asarray(truth["x"])
lp_t = truth["lp"]

flow = build()
params, static = partition(flow)
updates = {n: jnp.asarray(truth[n], jnp.float32)
           for n, _ in named_parameters(params)}
flow = update_parameters(combine(params, static), updates)

d = flow(None)
print("dispatch type:", type(d).__name__, flush=True)
lp_f = np.asarray(jax.jit(lambda v: flow(None).log_prob(v))(x), np.float64)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
lp_x = np.asarray(jax.jit(lambda v: flow(None).log_prob(v))(x), np.float64)
for name, lp in (("fused", lp_f), ("xla", lp_x)):
    err = np.abs(lp - lp_t)
    print(f"GF {name} vs CPU f64 truth: median {np.median(err):.2e} "
          f"max {err.max():.2e}", flush=True)
print("done", flush=True)
