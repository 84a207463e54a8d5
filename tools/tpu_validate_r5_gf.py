r"""Round-5 batched-context fused GF validation on hardware (r71 protocol).

Round 4 left conditional (batched-context) GF on the XLA fallback, which r71
measured at 1.0e-2 median density error on TPU vs the kernel's 2.2e-5 — a
450x accuracy cliff for conditional GF serving. Round 5 streams the per-row
hyper outputs through the kernel (gf_fused._flatten_gf column layout). This
script validates the kernel path on the real chip against CPU f64 ground
truth at damped params (the r71 plateau rule) and takes a production-batch
perf row.

Phases:
  --truth (subprocess, CPU + x64): writes /tmp/r5_gf_truth.npz with f64
      XLA-path and f64 fallback-math densities at fixed (x, c), and the f64
      solve results for a fixed augmented draw matrix.
  main (TPU): kernel density/sample vs the truth + the XLA-on-TPU
      comparison + b=1M perf rows.
"""

import json
import os
import subprocess
import sys
import time

B = 4096
F, CTX, T, K = 6, 4, 3, 8
TRUTH = "/tmp/r5_gf_truth.npz"
PERF_B = 1 << 20


def build(jax):
    from zuko_tpu.core import combine, partition
    from zuko_tpu.flows import GF

    flow = GF(F, CTX, transforms=T, components=K, key=jax.random.PRNGKey(0))
    params, static = partition(flow)
    params = jax.tree_util.tree_map(lambda a: a * 0.5, params)
    return combine(params, static)


def inputs(jax, jnp):
    c = jax.random.normal(jax.random.PRNGKey(1), (B, CTX), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, F), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(3), (B, F), jnp.float32)
    return x, c, z


def truth_phase():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from zuko_tpu.core import combine, partition
    from zuko_tpu.ops import gf_fused as gfm

    # build flow + inputs in f32 FIRST — x64 mode changes the PRNG draw
    # values, so building under x64 would pin truth for a DIFFERENT flow
    # (the exact bug this comment is from)
    flow = build(jax)
    x, c, z = inputs(jax, jnp)
    jax.config.update("jax_enable_x64", True)

    # f64 twin of the same flow
    params, static = partition(flow)
    flow64 = combine(
        jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params), static
    )
    x64, c64 = x.astype(jnp.float64), c.astype(jnp.float64)

    lp_xla64 = flow64(c64).log_prob(x64)  # libm erf/erfinv, f64
    lp_fused64 = gfm.fused_gf_log_prob(flow64, x64, c64)  # A&S/Giles, f64

    # f64 solve on the exact f32 draw matrix the TPU kernel will consume
    flat64, layout, _, cols64 = gfm._flatten_gf(flow64, c64)
    zaug64 = jnp.concatenate([z.astype(jnp.float64), cols64], axis=-1)
    x_sol64, lq64 = gfm._gf_sample_core(
        layout, F, True, zaug64, list(flat64)
    )

    np.savez(
        TRUTH,
        lp_xla64=np.asarray(lp_xla64),
        lp_fused64=np.asarray(lp_fused64),
        x_sol64=np.asarray(x_sol64),
        lq64=np.asarray(lq64),
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

    sys.path.insert(0, "/root/repo")
    from zuko_tpu.core import combine, partition
    from zuko_tpu.ops import gf_fused as gfm

    t = np.load(TRUTH)
    flow = build(jax)
    x, c, z = inputs(jax, jnp)
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
        return gfm.fused_gf_log_prob(combine(params, static), x, c)

    lp_k = jax.block_until_ready(kd(params, x, c))
    med_k = stats("kernel density vs f64 XLA truth", lp_k, t["lp_xla64"])
    stats("kernel density vs f64 fallback-math truth", lp_k, t["lp_fused64"])

    # ---- XLA path on TPU (the r71 cliff reference) ---------------------
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"

    @jax.jit
    def xd(params, x, c):
        return combine(params, static)(c).log_prob(x)

    lp_x = jax.block_until_ready(xd(params, x, c))
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "auto"
    med_x = stats("XLA-on-TPU density vs f64 XLA truth", lp_x, t["lp_xla64"])

    # ---- kernel solve on the fixed draw matrix -------------------------
    flat, layout, _, cols = gfm._flatten_gf(flow, c)
    zaug = jnp.concatenate([z, cols], axis=-1)

    @jax.jit
    def ks(zaug, *flat):
        return gfm._gf_sample_core(layout, F, True, zaug, list(flat))

    x_k, lq_k = jax.block_until_ready(ks(zaug, *flat))
    stats("kernel solve x vs f64 truth", x_k, t["x_sol64"])
    stats("kernel log q vs f64 truth", lq_k, t["lq64"])

    # ---- production-batch perf rows ------------------------------------
    cb = jax.random.normal(jax.random.PRNGKey(4), (PERF_B, CTX), jnp.float32)
    xb = jax.random.normal(jax.random.PRNGKey(5), (PERF_B, F), jnp.float32)

    @jax.jit
    def dens_1m(params, x, c):
        return jnp.sum(gfm.fused_gf_log_prob(combine(params, static), x, c))

    @jax.jit
    def slp_1m(params, key, c):
        xs, lp = gfm.fused_gf_sample(
            combine(params, static), key, (), c=c, want_log_prob=True
        )
        return jnp.sum(lp) + jnp.sum(xs[:, 0])

    rows = {}
    for tag, fn, args in (
        ("cond_density_1m", dens_1m, (params, xb, cb)),
        ("cond_sample_lp_1m", slp_1m, (params, jax.random.PRNGKey(6), cb)),
    ):
        jax.block_until_ready(fn(*args))
        best = None
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            dt = time.perf_counter() - t0
            print(f"# {tag} run {r}: {1e3 * dt:.1f} ms -> "
                  f"{PERF_B / dt / 1e6:.1f}M/s", flush=True)
            best = dt if best is None else min(best, dt)
        rows[tag] = round(PERF_B / best / 1e6, 1)

    print(json.dumps({
        "kernel_density_median_err": med_k,
        "xla_tpu_density_median_err": med_x,
        "accuracy_gain_x": round(med_x / max(med_k, 1e-12), 1),
        **{k: f"{v}M/s" for k, v in rows.items()},
    }))


if __name__ == "__main__":
    if "--truth" in sys.argv:
        truth_phase()
    else:
        main_phase()
