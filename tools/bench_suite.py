r"""Full benchmark suite — reproduces the PERF.md headline rows on the current
backend (TPU by default; transparently falls back to jnp paths on CPU).

Default batch is the PRODUCTION batch (b=1M): the fused kernels are
launch/dispatch-bound below ~100K rows (PERF.md round-4), so smaller
batches — including --quick, meant only as a smoke run — under-report
device capability by up to ~100x through the tunnel.

Run: python tools/bench_suite.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from jax import lax

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF
from zuko_tpu.ops.nsf_fused import fused_nsf_log_prob, fused_nsf_sample


def timed(fn, *args, iters=3):
    # Block EVERY run and take the best — queuing identical unblocked
    # dispatches overlaps their dispatch overhead and inflates rates
    # ~25% at b=1M (and up to 180x in the degenerate all-queued form;
    # PERF.md "bench-harness hazards").
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--batch", type=int, default=1048576)
    parser.add_argument("--repeats", type=int, default=10)
    args = parser.parse_args()

    if args.quick:
        args.batch, args.repeats = 8192, 2

    B, R = args.batch, args.repeats
    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}  batch={B} repeats={R}")

    flow = NSF(6, 0, transforms=3, hidden_features=(64, 64), key=key)
    params, static = partition(flow)
    x = jax.random.normal(key, (B, 6))

    # --- log_prob, XLA path --------------------------------------------------
    # the public API auto-dispatches to the fused kernels on TPU, so the
    # XLA rows must force the gate off; the gate is read at trace time,
    # so it is set before this jit's warmup and the CALLER's value is
    # restored after (pop would clobber an explicit =1 override on CPU)
    _saved_gate = os.environ.get("ZUKO_TPU_FUSED_DISPATCH")

    def _restore_gate():
        if _saved_gate is None:
            os.environ.pop("ZUKO_TPU_FUSED_DISPATCH", None)
        else:
            os.environ["ZUKO_TPU_FUSED_DISPATCH"] = _saved_gate

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"

    @jax.jit
    def lp_xla(p, x):
        def body(carry, _):
            fl = combine(p, static)
            return carry + jnp.sum(fl(None).log_prob(x + 1e-9 * carry)), None

        return lax.scan(body, 0.0, None, length=R)[0]

    dt = timed(lp_xla, params, x)
    _restore_gate()
    print(f"log_prob  XLA  : {B * R / dt / 1e6:8.1f} M evals/s")

    # --- log_prob, fused kernel ---------------------------------------------
    @jax.jit
    def lp_fused(p, x):
        def body(carry, _):
            fl = combine(p, static)
            return carry + jnp.sum(fused_nsf_log_prob(fl, x + 1e-9 * carry)), None

        return lax.scan(body, 0.0, None, length=R)[0]

    dt = timed(lp_fused, params, x)
    print(f"log_prob  fused: {B * R / dt / 1e6:8.1f} M evals/s")

    # --- sampling, XLA path --------------------------------------------------
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"

    @jax.jit
    def samp_xla(p, k):
        def body(carry, i):
            fl = combine(p, static)
            return carry + jnp.sum(fl(None).sample(jax.random.fold_in(k, i), (B,))), None

        return lax.scan(body, 0.0, jnp.arange(R))[0]

    dt = timed(samp_xla, params, key)
    _restore_gate()
    print(f"sampling  XLA  : {B * R / dt / 1e6:8.2f} M samples/s")

    # --- sampling, fused kernel ---------------------------------------------
    @jax.jit
    def samp_fused(p, k):
        def body(carry, i):
            fl = combine(p, static)
            return carry + jnp.sum(
                fused_nsf_sample(fl, jax.random.fold_in(k, i), (B,))
            ), None

        return lax.scan(body, 0.0, jnp.arange(R))[0]

    dt = timed(samp_fused, params, key)
    print(f"sampling  fused: {B * R / dt / 1e6:8.2f} M samples/s")

    # --- fused sample_and_log_prob (reverse-KL quantity) ---------------------
    from zuko_tpu.ops.nsf_fused import fused_nsf_sample_and_log_prob

    @jax.jit
    def slp_fused(p, k):
        def body(carry, i):
            fl = combine(p, static)
            _, lq = fused_nsf_sample_and_log_prob(
                fl, jax.random.fold_in(k, i), (B,)
            )
            return carry + jnp.sum(lq), None

        return lax.scan(body, 0.0, jnp.arange(R))[0]

    dt = timed(slp_fused, params, key)
    print(f"sample+logq fused: {B * R / dt / 1e6:6.2f} M samples/s")

    # --- MLE training step ---------------------------------------------------
    import optax

    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def train(p, s, x):
        def loss(p):
            return -jnp.mean(combine(p, static)(None).log_prob(x))

        l, g = jax.value_and_grad(loss)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    p2, s2, l = train(params, state, x)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        p2, s2, l = train(p2, s2, x)
    jax.block_until_ready(l)
    dt = (time.perf_counter() - t0) / args.repeats
    print(f"train step     : {B / dt / 1e6:8.2f} M examples/s")

    # --- round-2 fused families (dispatch = public API) ----------------------
    import jax.tree_util as jtu

    from zuko_tpu.flows import CNF, GF, NAF

    # solver-family batches: the r74/r82-r84 validated shapes (GF sampling
    # runs fine at b=1M; NAF's solver tier at 262K; CNF's ODE tier at 262K)
    Bs = min(B, 262144)
    Rs = max(R // 2, 2)

    def density_row(label, fl, BB=B):
        xx = jax.random.normal(key, (BB, 6))

        @jax.jit
        def lp(x):
            def body(carry, _):
                return carry + jnp.sum(fl(None).log_prob(x + 1e-9 * carry)), None
            return lax.scan(body, 0.0, None, length=Rs)[0]

        dt = timed(lp, xx)
        print(f"{label}: {BB * Rs / dt / 1e6:8.2f} M evals/s")

    def sample_row(label, fl, BB=Bs):
        @jax.jit
        def sm(k):
            def body(carry, i):
                s = fl(None).sample(jax.random.fold_in(k, i), (BB,))
                return carry + jnp.sum(s), None
            return lax.scan(body, 0.0, jnp.arange(Rs))[0]

        dt = timed(sm, key)
        print(f"{label}: {BB * Rs / dt / 1e6:8.2f} M samples/s")

    gf = GF(6, transforms=3, key=key)
    pg, sg = partition(gf)
    gf = combine(jtu.tree_map(lambda a: a * 0.3, pg), sg)
    density_row("GF  density fused", gf)
    sample_row("GF  sampling fused", gf, BB=B)

    naf = NAF(6, transforms=3, signal=16, key=key)
    sample_row("NAF sampling fused", naf)

    cnf = CNF(6, key=key)
    density_row("CNF density fused", cnf, BB=min(B, 262144))


if __name__ == "__main__":
    main()
