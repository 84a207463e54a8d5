r"""Tests for zuko_tpu.ops — fallback correctness and (via interpret mode)
Pallas kernel equivalence with the reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zuko_tpu.ops import masked_linear as ml_mod
from zuko_tpu.ops import rqs as rqs_mod
from zuko_tpu.transforms import MonotonicRQSTransform


def test_rqs_fallback_matches_transform(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w = jax.random.normal(k1, (8,))
    h = jax.random.normal(k2, (8,))
    d = jax.random.normal(k3, (7,))
    t = MonotonicRQSTransform(w, h, d)

    x = jnp.linspace(-6.0, 6.0, 41)
    y, ladj = rqs_mod.rqs_forward(x, t.horizontal, t.vertical, t.derivatives)
    y2, ladj2 = t.call_and_ladj(x)
    assert jnp.allclose(y, y2)
    assert jnp.allclose(ladj, ladj2)

    xi, ladj_i = rqs_mod.rqs_inverse(y, t.horizontal, t.vertical, t.derivatives)
    assert jnp.allclose(xi, x, atol=1e-6)
    assert jnp.allclose(ladj_i, -ladj, atol=1e-6)


def test_rqs_gradients(key):
    k1, k2, k3 = jax.random.split(key, 3)
    w = jax.random.normal(k1, (8,))
    h = jax.random.normal(k2, (8,))
    d = jax.random.normal(k3, (7,))
    t = MonotonicRQSTransform(w, h, d)

    def f(x):
        y, ladj = rqs_mod.rqs_forward(x, t.horizontal, t.vertical, t.derivatives)
        return jnp.sum(y) + jnp.sum(ladj)

    g = jax.grad(f)(jnp.asarray([0.5, -1.0, 2.0]))
    assert jnp.all(jnp.isfinite(g))


def test_masked_linear_fallback(key):
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (16, 10))
    w = jax.random.normal(k2, (6, 10))
    mask = (jax.random.uniform(k3, (6, 10)) < 0.5).astype(w.dtype)
    b = jnp.ones(6)

    y = ml_mod.masked_linear(x, w, mask, b)
    ref = x @ (mask * w).T + b
    assert jnp.allclose(y, ref, atol=1e-6)

    # no-bias path
    y = ml_mod.masked_linear(x, w, mask, None)
    assert jnp.allclose(y, x @ (mask * w).T, atol=1e-6)


def test_masked_linear_pallas_interpret(key):
    # run the actual Pallas kernel in interpreter mode on CPU
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (16, 10), jnp.float32)
    w = jax.random.normal(k2, (6, 10), jnp.float32)
    mask = (jax.random.uniform(k3, (6, 10)) < 0.5).astype(jnp.float32)

    try:
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        with pltpu.force_tpu_interpret_mode():
            y = ml_mod._masked_linear_pallas(x, w, mask, None)
    except Exception as e:
        pytest.skip(f"pallas interpret mode unavailable: {e}")

    ref = x @ (mask * w).T
    assert jnp.allclose(y, ref, atol=1e-5)


def test_fused_nsf_fallback(key):
    from zuko_tpu.flows import NSF
    from zuko_tpu.ops.nsf_fused import fused_nsf_log_prob

    flow = NSF(4, 0, transforms=2, hidden_features=(16, 16), key=key)
    x = jax.random.normal(key, (64, 4))
    lp_ref = flow(None).log_prob(x)
    lp = fused_nsf_log_prob(flow, x)
    assert jnp.allclose(lp, lp_ref, atol=1e-5)

    # gradients agree with the reference path
    from zuko_tpu.core import combine, partition

    params, static = partition(flow)
    g1 = jax.grad(lambda p: -jnp.mean(combine(p, static)(None).log_prob(x)))(params)
    g2 = jax.grad(lambda p: -jnp.mean(fused_nsf_log_prob(combine(p, static), x)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        assert jnp.allclose(a, b, atol=1e-6)


def test_fused_nsf_sample_fallback(key):
    from zuko_tpu.flows import NSF
    from zuko_tpu.ops.nsf_fused import fused_nsf_sample

    flow = NSF(4, 0, transforms=2, hidden_features=(16, 16), key=key)
    ks = jax.random.PRNGKey(5)
    x_ref = flow(None).sample(ks, (64,))
    x = fused_nsf_sample(flow, ks, (64,))
    assert x.shape == (64, 4)
    assert jnp.allclose(x, x_ref, atol=1e-5)


def test_fused_nsf_conditional_and_vi(key):
    from zuko_tpu.flows import NSF
    from zuko_tpu.ops.nsf_fused import (
        fused_nsf_log_prob,
        fused_nsf_sample_and_log_prob,
    )

    flow = NSF(3, 5, transforms=2, hidden_features=(16, 16), key=key)
    c = jax.random.normal(key, (32, 5))
    x = jax.random.normal(jax.random.PRNGKey(2), (32, 3))

    lp = fused_nsf_log_prob(flow, x, c)
    assert jnp.allclose(lp, flow(c).log_prob(x), atol=1e-5)

    # batched context contributes its batch dims after sample_shape
    # (XLA/torch semantics, the r87 fix): one draw per context row is
    # sample_shape=()
    xs, lp = fused_nsf_sample_and_log_prob(flow, jax.random.PRNGKey(5), (), c=c)
    assert xs.shape == (32, 3)
    assert jnp.allclose(lp, flow(c).log_prob(xs), atol=1e-5)

    xs2, lp2 = fused_nsf_sample_and_log_prob(
        flow, jax.random.PRNGKey(5), (4,), c=c)
    assert xs2.shape == (4, 32, 3) and lp2.shape == (4, 32)

    # conditional gradients through the fused path
    from zuko_tpu.core import combine, partition

    params, static = partition(flow)
    g1 = jax.grad(lambda p: -jnp.mean(combine(p, static)(c).log_prob(x)))(params)
    g2 = jax.grad(lambda p: -jnp.mean(fused_nsf_log_prob(combine(p, static), x, c)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        assert jnp.allclose(a, b, atol=1e-6)


@pytest.mark.parametrize("F,C,K,hidden,layers", [
    (2, 0, 4, (8,), 1),
    (5, 3, 8, (16, 16), 2),
    (7, 2, 6, (24, 24, 24), 3),
])
def test_fused_nsf_configs(key, F, C, K, hidden, layers):
    from zuko_tpu.flows import NSF
    from zuko_tpu.ops.nsf_fused import (
        fused_nsf_log_prob,
        fused_nsf_sample_and_log_prob,
    )

    flow = NSF(F, C, transforms=layers, hidden_features=hidden, bins=K, key=key)
    c = jax.random.normal(key, (16, C)) if C else None
    x = jax.random.normal(jax.random.PRNGKey(3), (16, F))

    ref = flow(c).log_prob(x) if C else flow(None).log_prob(x)
    lp = fused_nsf_log_prob(flow, x, c)
    assert jnp.allclose(lp, ref, atol=1e-5), (F, C, K)

    xs, lps = fused_nsf_sample_and_log_prob(flow, jax.random.PRNGKey(4), (16,), c=c)
    ref_s = flow(c).log_prob(xs) if C else flow(None).log_prob(xs)
    assert jnp.allclose(lps, ref_s, atol=1e-5), (F, C, K)


def test_fused_maf(key):
    from zuko_tpu.flows import MAF
    from zuko_tpu.ops.nsf_fused import (
        fused_flow_log_prob,
        fused_nsf_sample_and_log_prob,
    )

    flow = MAF(4, 3, transforms=2, hidden_features=(16, 16), key=key)
    c = jax.random.normal(key, (32, 3))
    x = jax.random.normal(jax.random.PRNGKey(2), (32, 4))

    assert jnp.allclose(
        fused_flow_log_prob(flow, x, c), flow(c).log_prob(x), atol=1e-5
    )
    xs, lp = fused_nsf_sample_and_log_prob(flow, jax.random.PRNGKey(5), (32,), c=c)
    assert jnp.allclose(lp, flow(c).log_prob(xs), atol=1e-5)


def test_fused_coupling_style_sampling(key):
    # passes=2 (coupling-style factorization inside a MAT layer): the fused
    # sampler must honor the declared pass count and stay exact
    from zuko_tpu.flows import NSF
    from zuko_tpu.ops.nsf_fused import fused_nsf_sample

    flow = NSF(6, 0, transforms=2, passes=2, hidden_features=(16, 16), key=key)
    ks = jax.random.PRNGKey(9)
    x_ref = flow(None).sample(ks, (64,))
    x = fused_nsf_sample(flow, ks, (64,))
    assert jnp.allclose(x, x_ref, atol=1e-5)


def test_fused_nice(key):
    from zuko_tpu.flows import NICE
    from zuko_tpu.ops.nsf_fused import fused_nice_log_prob

    for C in (0, 3):
        flow = NICE(4, C, transforms=3, hidden_features=(16, 16), key=key)
        c = jax.random.normal(key, (16, C)) if C else None
        x = jax.random.normal(jax.random.PRNGKey(2), (16, 4))
        ref = flow(c).log_prob(x) if C else flow(None).log_prob(x)
        assert jnp.allclose(fused_nice_log_prob(flow, x, c), ref, atol=1e-5)


def test_log_acc_f32():
    # the bit-twiddle log used for in-kernel ladjs: must beat the TPU
    # hardware log (~1e-4 max abs error measured on v5e) by ~100x; pure
    # int/mul ops, so the CPU f32 run is representative of the TPU one
    import numpy as np

    from zuko_tpu.ops.nsf_fused import _log_acc

    v = np.random.default_rng(0).uniform(1e-6, 1e6, (1 << 16,))
    v = v.astype(np.float32)
    out = np.asarray(jax.jit(_log_acc)(jnp.asarray(v)), np.float64)
    err = np.abs(out - np.log(v.astype(np.float64)))
    assert err.max() < 1e-6

    near1 = np.linspace(0.9, 1.1, 1 << 14, dtype=np.float32)
    out1 = np.asarray(jax.jit(_log_acc)(jnp.asarray(near1)), np.float64)
    err1 = np.abs(out1 - np.log(near1.astype(np.float64)))
    assert err1.max() < 1e-7


def test_reverse_kl_self_consistency_f32(key):
    # float32 path with the hoisted presplit forms: the reverse-KL solve
    # runs at the density precision (split3), so the reported log q agrees
    # with the density math to ~1e-5 — upgrading only the final ladj
    # evaluation leaves ~1e-3 z-mismatch error (measured on v5e, r10/r11)
    from zuko_tpu.flows import NSF
    from zuko_tpu.ops import nsf_fused as nf

    flow = NSF(5, 0, transforms=3, hidden_features=(32, 32), key=key)
    fp, layout, cfg = nf._flatten_flow(flow)
    fp = [p.astype(jnp.float32) for p in fp]
    z = jax.random.normal(jax.random.PRNGKey(3), (256, 5), jnp.float32)

    for mode in ("mask", "cat"):
        kp, kl = nf._presplit_params(list(fp), layout, mode)
        x, lq = nf._sample_math_T(
            z.T, kp, kl, 5, cfg["bins"], cfg["bound"], cfg["slope"], None,
            want_log_prob=True, univ=cfg["univ"], base=cfg["base"],
        )
        lp = nf._full_math_T(
            x, list(fp), layout, 5, cfg["bins"], cfg["bound"], cfg["slope"],
            None, univ=cfg["univ"], base=cfg["base"],
        )
        assert jnp.abs(lq - lp).max() < 5e-5, (mode, jnp.abs(lq - lp).max())


def test_log_acc_gradients():
    # the int32-bitcast frexp autodiffs to a silent ZERO gradient; the
    # attached custom_jvp restores the analytic 1/x (this killed the ladj
    # term of every f32 training gradient through the fused backward —
    # invisible to the f64 battery, which routes to jnp.log)
    from zuko_tpu.ops.nsf_fused import _log1p_acc, _log_acc

    v = jnp.asarray(
        np.random.default_rng(0).uniform(0.05, 20.0, (256,)), jnp.float32
    )
    g = jax.grad(lambda t: jnp.sum(_log_acc(t)))(v)
    assert jnp.abs(g - 1.0 / v).max() < 1e-5
    g1 = jax.grad(lambda t: jnp.sum(_log1p_acc(t)))(v)
    assert jnp.abs(g1 - 1.0 / (1.0 + v)).max() < 1e-5


def test_fused_backward_f32_matches_xla(key):
    # float32 end-to-end: gradients through the fused custom-VJP backward
    # (which differentiates the accurate-log / split3 math) must match the
    # plain XLA path to f32 roundoff-accumulation levels
    import os

    from zuko_tpu.core import combine, named_parameters, partition
    from zuko_tpu.flows import NSF

    flow = NSF(8, 0, transforms=2, hidden_features=(32, 32), key=key)
    x = jax.random.normal(jax.random.PRNGKey(2), (128, 8), jnp.float32)
    params, static = partition(flow)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), params
    )

    def loss(p):
        return -jnp.mean(combine(p, static)(None).log_prob(x))

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    try:
        g_fused = jax.grad(loss)(params)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    g_xla = jax.grad(loss)(params)
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

    for (n, a), (_, b) in zip(
        named_parameters(g_fused), named_parameters(g_xla)
    ):
        scale = jnp.abs(b).max() + 1e-3
        rel = float(jnp.abs(a - b).max() / scale)
        assert rel < 2e-2, (n, rel)


def test_feature_padding_math(key):
    # sublane-alignment padding (Mosaic miscompiles unaligned slab slices
    # on hardware, r16/r18): padded math with realF masking must equal the
    # unpadded math exactly, for density, sampling, and log q
    from zuko_tpu.flows import NSF
    from zuko_tpu.ops import nsf_fused as nf

    F, Fp = 11, 16
    flow = NSF(F, 0, transforms=2, hidden_features=(16, 16), key=key)
    fp, layout, cfg = nf._flatten_flow(flow)
    T = nf._univ_size(cfg["univ"], cfg["bins"])

    x = jax.random.normal(jax.random.PRNGKey(3), (64, F))
    lp = nf._full_math_T(
        x.T, list(fp), layout, F, cfg["bins"], cfg["bound"], cfg["slope"],
        None, univ=cfg["univ"], base=cfg["base"],
    )
    pp, playout = nf._pad_features(list(fp), layout, F, 0, Fp, T)
    xp = nf._pad_feature_cols(x, F, Fp)
    lp_pad = nf._full_math_T(
        xp.T, pp, playout, Fp, cfg["bins"], cfg["bound"], cfg["slope"],
        None, univ=cfg["univ"], base=cfg["base"], realF=F,
    )
    assert jnp.allclose(lp, lp_pad, atol=1e-10), jnp.abs(lp - lp_pad).max()

    z = jax.random.normal(jax.random.PRNGKey(4), (64, F))
    s, lq = nf._sample_math_T(
        z.T, list(fp), layout, F, cfg["bins"], cfg["bound"], cfg["slope"],
        None, want_log_prob=True, univ=cfg["univ"], base=cfg["base"],
    )
    zp = nf._pad_feature_cols(z, F, Fp)
    sp, lqp = nf._sample_math_T(
        zp.T, pp, playout, Fp, cfg["bins"], cfg["bound"], cfg["slope"],
        None, want_log_prob=True, univ=cfg["univ"], base=cfg["base"],
        realF=F,
    )
    assert jnp.allclose(s, sp[:F], atol=1e-10)
    assert jnp.allclose(lq, lqp, atol=1e-10)


def test_fused_kernel_interpret_large_d(key):
    # run the ACTUAL whole-flow Pallas kernel (interpret mode) at a
    # larger, sublane-unaligned feature count — the r16-r29 investigation
    # showed shape coverage beyond the D=6 tuning point matters
    from jax.experimental import pallas as pl

    from zuko_tpu.flows import NSF
    from zuko_tpu.ops import nsf_fused as nf

    flow = NSF(43, 0, transforms=2, hidden_features=(32, 32), key=key)
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 43), jnp.float32)
    fp, layout, cfg = nf._flatten_flow(flow)
    fp = [p.astype(jnp.float32) for p in fp]

    lp_ref = nf._full_math_T(
        x.T.astype(jnp.float32), list(fp), layout, 43, cfg["bins"],
        cfg["bound"], cfg["slope"], None, univ=cfg["univ"],
        base=cfg["base"],
    )[0]

    real_call = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return real_call(*a, **k)

    orig_gate = nf._use_pallas_fused
    nf.pl.pallas_call = patched
    nf._use_pallas_fused = lambda dtype: dtype == jnp.float32
    try:
        lp_k = nf.fused_nsf_log_prob(flow, x)
    finally:
        nf.pl.pallas_call = real_call
        nf._use_pallas_fused = orig_gate

    assert jnp.abs(lp_k - lp_ref).max() < 1e-4, jnp.abs(lp_k - lp_ref).max()


def test_bernstein_fused_inverse_extrapolation(key):
    # targets beyond f(+-bound): the Bernstein transform linearly
    # extrapolates there and the fused inverse must use the closed form
    # (reference: zuko/transforms.py:640-777), not peg at the bracket
    from zuko_tpu.flows import BPF
    from zuko_tpu.ops import nsf_fused as nf

    f = BPF(3, transforms=1, key=key)
    fp, layout, cfg = nf._flatten_flow(f)
    per = nf._split_layers(list(fp), layout)
    _, ps, _ = [e for e in per if e[0] == "ar"][0]
    h = nf._hyper_T(jnp.zeros((3, 8)), None, ps,
                    precision=jax.lax.Precision.HIGHEST)
    y = jnp.asarray([[30.0, -25.0, 40.0]]).T * jnp.ones((1, 8))
    x = nf._poly_inverse_F(y, h, 3, cfg["bins"], cfg["bound"],
                           cfg["slope"], "bernstein")
    assert jnp.abs(x).max() > cfg["bound"]  # actually extrapolated
    yy, _ = nf._univ_forward_F(x, h, 3, cfg["bins"], cfg["bound"],
                               cfg["slope"], "bernstein")
    assert jnp.abs(yy - y).max() < 1e-8


@pytest.mark.parametrize("slope_exp", [0, 2])
def test_spline_fused_binsel_matches_materialized(key, slope_exp):
    # The running-sweep bin-select form (the default since r55,
    # ZUKO_TPU_FUSED_BINSEL) computes the same spline as the
    # materialized-knot form — in f64, across in-domain points, bin
    # boundaries (exact running knots), and out-of-domain passthrough
    from zuko_tpu.ops import nsf_fused as nf

    F, K, TB, bound = 5, 8, 64, 5.0
    slope = 10.0 ** (-slope_exp) if slope_exp else 1e-4  # spline slopes knob
    kh, kx = jax.random.split(key)
    h = jax.random.normal(kh, (3 * K - 1, F, TB)).reshape(
        (3 * K - 1) * F, TB
    ).astype(jnp.float64)
    x = jnp.concatenate([
        jax.random.uniform(kx, (F, TB - 16), minval=-bound, maxval=bound),
        jax.random.normal(kx, (F, 8)) * 3 * bound,  # out of domain
        jnp.zeros((F, 4)),
        jnp.full((F, 4), -bound),  # domain edge
    ], axis=1).astype(jnp.float64)

    y1, l1 = nf._spline_forward_F(x, h, F, K, bound, slope)
    y2, l2 = nf._spline_forward_fused_F(x, h, F, K, bound, slope)
    assert jnp.abs(y1 - y2).max() < 1e-12, jnp.abs(y1 - y2).max()
    assert jnp.abs(l1 - l2).max() < 1e-11, jnp.abs(l1 - l2).max()

    # gradients agree too (the IFT backward linearizes through this form)
    g1 = jax.grad(lambda v: nf._spline_forward_F(
        v, h, F, K, bound, slope)[1].sum())(x)
    g2 = jax.grad(lambda v: nf._spline_forward_fused_F(
        v, h, F, K, bound, slope)[1].sum())(x)
    assert jnp.abs(g1 - g2).max() < 1e-9, jnp.abs(g1 - g2).max()
