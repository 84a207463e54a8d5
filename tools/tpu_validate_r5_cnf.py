r"""Round-5 batched-context fused CNF validation on hardware.

Same shape as tools/tpu_validate_r5_gf.py (the r71 protocol): CPU f64 truth
phase, then the TPU kernel path — density, sampling, and the conditional
VI step (fused forward + IN-KERNEL continuous adjoint with the per-row
folded bias) with gradient parity vs the CPU f64 XLA backward.

Perf row at b=131072 (the CNF production batch of PERF.md round 3/4).
"""

import json
import os
import subprocess
import sys
import time

B = 2048
F, CTX, HID = 4, 3, (64, 64)
TRUTH = "/tmp/r5_cnf_truth.npz"
PERF_B = 1 << 17
VI_N = 4096

sys.path.insert(0, "/root/repo")


def build(jax):
    from zuko_tpu.flows import CNF

    return CNF(F, CTX, hidden_features=HID, exact=True,
               key=jax.random.PRNGKey(0))


def inputs(jax, jnp):
    c = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (B, CTX), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, F), jnp.float32)
    return x, c


def vi_loss_fn(jax, jnp, combine, static, c, fused: bool, shape):
    """Reverse-KL-shaped objective over params: fused kernel forward +
    in-kernel adjoint when ``fused``, the XLA discrete adjoint otherwise."""
    from zuko_tpu.distributions import NormalizingFlow
    from zuko_tpu.ops.cnf_fused import fused_cnf_rsample

    def loss(params):
        f = combine(params, static)
        if fused:
            xs, lq = fused_cnf_rsample(
                f, f.transform(c), jax.random.PRNGKey(7), shape, c=c,
                want_log_prob=True,
            )
        else:
            d = NormalizingFlow(
                f.transform(c), f.base(c).expand(c.shape[:-1])
            )
            xs, lq = d.rsample_and_log_prob(jax.random.PRNGKey(7), shape)
        return jnp.mean(lq) + jnp.mean(jnp.sum(xs**2, -1))

    return loss


def truth_phase():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from zuko_tpu.core import combine, partition

    # build in f32 FIRST (x64 changes PRNG draws), then cast
    flow = build(jax)
    x, c = inputs(jax, jnp)
    jax.config.update("jax_enable_x64", True)

    # cast the WHOLE module tree (params AND buffers — a f32 base would
    # leave mixed dtypes in the odeint carry)
    flow64 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        flow,
    )
    params64, static64 = partition(flow64)
    c64 = c.astype(jnp.float64)

    lp64 = flow64(c64).log_prob(x.astype(jnp.float64))

    # VI-step truth: loss + grads through the XLA discrete adjoint at f32
    # (the TPU side draws f32 base samples — an f64 truth would draw
    # DIFFERENT PRNG values and the gradients would not be comparable;
    # the f64 method-agreement pin lives in
    # tests/test_fused_dispatch.py::test_cnf_tile_adjoint_matches_xla_backward)
    params, static = partition(flow)
    loss = vi_loss_fn(jax, jnp, combine, static, c[:64], False, (256,))
    v, g = jax.value_and_grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    np.savez(
        TRUTH,
        lp64=np.asarray(lp64),
        vi_loss=np.asarray(v),
        **{f"g{i}": np.asarray(le) for i, le in enumerate(leaves)},
    )
    print("truth written", flush=True)


def main_phase():
    if not os.path.exists(TRUTH):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--truth"],
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0

    import jax
    import jax.numpy as jnp
    import numpy as np

    from zuko_tpu.core import combine, partition
    from zuko_tpu.ops.cnf_fused import (
        fused_cnf_log_prob, fused_cnf_rsample, fused_cnf_sample,
    )

    t = np.load(TRUTH)
    flow = build(jax)
    x, c = inputs(jax, jnp)
    params, static = partition(flow)
    print("backend:", jax.default_backend(), flush=True)

    def stats(tag, got, ref):
        e = np.abs(np.asarray(got, np.float64) - np.asarray(ref, np.float64))
        print(f"{tag}: median {np.median(e):.3e} p95 "
              f"{np.quantile(e, 0.95):.3e} max {e.max():.3e}", flush=True)
        return float(np.median(e))

    # ---- kernel density at (x, c) --------------------------------------
    @jax.jit
    def kd(params, x, c):
        f = combine(params, static)
        return fused_cnf_log_prob(f, f.transform(c), x, c)

    lp_k = jax.block_until_ready(kd(params, x, c))
    med_k = stats("kernel cond density vs f64 truth", lp_k, t["lp64"])

    # ---- kernel sampling self-consistency ------------------------------
    @jax.jit
    def ks(params, key, c):
        f = combine(params, static)
        xs, lq = fused_cnf_sample(
            f, f.transform(c), key, (), c=c, want_log_prob=True
        )
        return xs, lq, fused_cnf_log_prob(f, f.transform(c), xs, c)

    xs, lq, lq2 = jax.block_until_ready(ks(params, jax.random.PRNGKey(3), c))
    stats("kernel cond sample log q vs kernel density", lq, lq2)

    # ---- VI step: fused forward + IN-KERNEL adjoint grads vs f64 truth -
    loss = vi_loss_fn(jax, jnp, combine, static, c[:64], True, (256,))
    v, g = jax.block_until_ready(jax.jit(jax.value_and_grad(loss))(params))
    print(f"vi loss: fused {float(v):.6f} f64-truth "
          f"{float(t['vi_loss']):.6f}", flush=True)
    leaves = jax.tree_util.tree_leaves(g)
    gerr = max(
        float(np.max(np.abs(np.asarray(le, np.float64) - t[f"g{i}"])))
        for i, le in enumerate(leaves)
    )
    print(f"vi grad max err vs f64 XLA backward: {gerr:.3e}", flush=True)

    # ---- perf: conditional VI step at the production batch -------------
    cb = 0.5 * jax.random.normal(jax.random.PRNGKey(4), (PERF_B, CTX),
                                 jnp.float32)
    vi_big = jax.jit(jax.value_and_grad(
        vi_loss_fn(jax, jnp, combine, static, cb, True, ())
    ))

    jax.block_until_ready(vi_big(params))
    best = None
    for r in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(vi_big(params))
        dt = time.perf_counter() - t0
        print(f"# cond VI step b={PERF_B} run {r}: {1e3 * dt:.1f} ms -> "
              f"{PERF_B / dt / 1e3:.1f}K samples/s", flush=True)
        best = dt if best is None else min(best, dt)

    print(json.dumps({
        "kernel_density_median_err": med_k,
        "vi_loss_gap": abs(float(v) - float(t["vi_loss"])),
        "vi_grad_max_err": gerr,
        "cond_vi_ksamples_per_s": round(PERF_B / best / 1e3, 1),
    }))


if __name__ == "__main__":
    if "--truth" in sys.argv:
        truth_phase()
    else:
        main_phase()
