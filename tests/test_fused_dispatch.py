r"""Automatic fused-kernel dispatch through the public flow API.

The reference's fused protocol is the default API, not an opt-in
(reference: zuko/transforms.py:46-56); these tests pin the TPU-native
analogue: ``flow(c).log_prob(x)`` routes through the fused kernels when the
structure matches (forced on CPU via ``ZUKO_TPU_FUSED_DISPATCH=1``), falls
back silently when it doesn't, and never changes results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zuko_tpu import combine, partition
from zuko_tpu.core import named_parameters
from zuko_tpu.distributions import DiagNormal, NormalizingFlow
from zuko_tpu.flows import MAF, NAF, NICE, NSF, UNAF
from zuko_tpu.lazy import Flow, UnconditionalDistribution
from zuko_tpu.ops.dispatch import (
    FusedAutoregressiveFlow,
    FusedCouplingFlow,
    fused_dispatch_enabled,
    maybe_fused_flow,
)
from zuko_tpu.ops.nsf_fused import (
    FusedStructureError,
    extract_coupling_params,
    fused_nice_log_prob,
    fused_nsf_log_prob,
)


@pytest.fixture
def dispatch_on(monkeypatch):
    monkeypatch.setenv("ZUKO_TPU_FUSED_DISPATCH", "1")


@pytest.fixture
def dispatch_off(monkeypatch):
    monkeypatch.setenv("ZUKO_TPU_FUSED_DISPATCH", "0")


def test_dispatch_gating(monkeypatch):
    monkeypatch.setenv("ZUKO_TPU_FUSED_DISPATCH", "0")
    assert not fused_dispatch_enabled()
    monkeypatch.setenv("ZUKO_TPU_FUSED_DISPATCH", "1")
    assert fused_dispatch_enabled()
    monkeypatch.delenv("ZUKO_TPU_FUSED_DISPATCH")
    # auto: off on the CPU test backend
    assert not fused_dispatch_enabled()


@pytest.mark.parametrize("cls,ctx", [
    (NSF, 0), (NSF, 3), (MAF, 0), (MAF, 3), (NICE, 0), (NICE, 3),
])
def test_dispatched_log_prob_matches_xla(cls, ctx, key, dispatch_on):
    r"""flow(c).log_prob(x) through the fused path equals the XLA path for
    every supported flow class, conditional and unconditional."""
    kf, kx, kc = jax.random.split(key, 3)
    flow = cls(4, ctx, transforms=2, hidden_features=(16, 16), key=kf)
    x = jax.random.normal(kx, (32, 4))
    c = jax.random.normal(kc, (3,)) if ctx else None

    d = flow(c)
    expected = FusedCouplingFlow if cls is NICE else FusedAutoregressiveFlow
    assert type(d) is expected, type(d)
    lp = d.log_prob(x)

    # XLA path: plain NormalizingFlow built directly from the same pieces
    plain = NormalizingFlow(flow.transform(c), d.base)
    lp_ref = plain.log_prob(x)
    assert lp.shape == lp_ref.shape == (32,)
    assert jnp.allclose(lp, lp_ref, atol=1e-8), jnp.abs(lp - lp_ref).max()


def test_dispatched_sampling_matches_xla(key, dispatch_on):
    r"""Fused sample / sample_and_log_prob equal the XLA path (same base
    draws, inverted by fixed-point sweeps vs scan)."""
    kf, ks = jax.random.split(key)
    flow = NSF(3, 0, transforms=2, hidden_features=(16, 16), key=kf)

    d = flow(None)
    assert type(d) is FusedAutoregressiveFlow
    x = d.sample(ks, (64,))

    plain = NormalizingFlow(flow.transform(None), d.base)
    x_ref = plain.sample(ks, (64,))
    assert jnp.allclose(x, x_ref, atol=1e-6), jnp.abs(x - x_ref).max()

    xs, lq = d.sample_and_log_prob(ks, (64,))
    xs_ref, lq_ref = plain.sample_and_log_prob(ks, (64,))
    assert jnp.allclose(xs, xs_ref, atol=1e-6)
    assert jnp.allclose(lq, lq_ref, atol=1e-6)

    # the differentiable path stays XLA and still agrees
    xr, lr = d.rsample_and_log_prob(ks, (16,))
    assert jnp.allclose(lr, d.log_prob(xr), atol=1e-5)


def test_dispatched_gradients_match(key, dispatch_on):
    r"""Training gradients through the dispatched path equal the XLA path
    (the fused custom-VJP backward runs the identical math)."""
    kf, kx = jax.random.split(key)
    flow = NSF(3, 0, transforms=2, hidden_features=(16, 16), key=kf)
    x = jax.random.normal(kx, (64, 3))
    params, static = partition(flow)

    def loss(p):
        return -jnp.mean(combine(p, static)(None).log_prob(x))

    g_fused = jax.grad(loss)(params)

    import os

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        g_ref = jax.grad(loss)(params)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

    # params are float32: allow roundoff from the different expression order
    for (n, a), (_, b) in zip(named_parameters(g_fused), named_parameters(g_ref)):
        assert jnp.allclose(a, b, atol=2e-6), (n, jnp.abs(a - b).max())


def test_structure_mismatch_falls_back(key, dispatch_on):
    r"""Non-representable structures silently keep the XLA path — and the
    direct fused call raises instead of computing a wrong density
    (round-1 hazard)."""
    x = jax.random.normal(key, (8, 3))

    for bad in [
        NSF(3, transforms=2, residual=True, key=key),
        NSF(3, transforms=2, activation=jax.nn.elu, key=key),
        MAF(3, transforms=2, activation=jax.nn.elu, key=key),
    ]:
        d = bad(None)
        assert type(d) is NormalizingFlow, type(d)
        assert jnp.all(jnp.isfinite(d.log_prob(x)))
        with pytest.raises(FusedStructureError):
            fused_nsf_log_prob(bad, x)

    # coupling path: LayerNorm'd hyper-net must NOT extract cleanly
    nice = NICE(4, transforms=2, normalize=True, key=key)
    d = nice(None)
    assert type(d) is NormalizingFlow
    with pytest.raises(FusedStructureError):
        extract_coupling_params(nice)
    with pytest.raises(FusedStructureError):
        fused_nice_log_prob(nice, jax.random.normal(key, (8, 4)))


def test_nonstandard_base_falls_back(key, dispatch_on):
    r"""A non-N(0,I) base is not representable by the kernels — it must fall
    back (not silently assume a standard base)."""
    from zuko_tpu.flows.autoregressive import MaskedAutoregressiveTransform

    layers = [
        MaskedAutoregressiveTransform(features=3, key=k)
        for k in jax.random.split(key, 2)
    ]
    base = UnconditionalDistribution(
        DiagNormal, jnp.full(3, 0.5), jnp.full(3, 2.0), buffer=True
    )
    flow = Flow(layers, base)
    d = flow(None)
    assert type(d) is NormalizingFlow, type(d)
    x = jax.random.normal(key, (8, 3))
    assert jnp.all(jnp.isfinite(d.log_prob(x)))
    with pytest.raises(FusedStructureError):
        fused_nsf_log_prob(flow, x)


def test_nondefault_bound_slope_honored(key, dispatch_on):
    r"""The kernels take bound/slope from the flow's own univariate config —
    a non-default NSF(slope=...) must not silently use the defaults."""
    from functools import partial as fpartial

    from zuko_tpu.flows.autoregressive import MaskedAutoregressiveTransform
    from zuko_tpu.transforms import MonotonicRQSTransform

    rqs = fpartial(MonotonicRQSTransform, bound=3.0, slope=1e-2)
    layers = [
        MaskedAutoregressiveTransform(
            features=3, univariate=rqs, shapes=[(6,), (6,), (5,)], key=k
        )
        for k in jax.random.split(key, 2)
    ]
    base = UnconditionalDistribution(
        DiagNormal, jnp.zeros(3), jnp.ones(3), buffer=True
    )
    flow = Flow(layers, base)
    d = flow(None)
    assert type(d) is FusedAutoregressiveFlow, type(d)

    x = jax.random.normal(key, (32, 3)) * 2.0
    lp_ref = NormalizingFlow(flow.transform(None), d.base).log_prob(x)
    assert jnp.allclose(d.log_prob(x), lp_ref, atol=1e-8)


def test_dispatch_under_jit_with_partitioned_params(key, dispatch_on):
    r"""Inside jit, weights are traced but buffers ride in `static` as
    concrete arrays — dispatch must still engage and agree with XLA."""
    kf, kx = jax.random.split(key)
    flow = NSF(3, 0, transforms=2, hidden_features=(16, 16), key=kf)
    x = jax.random.normal(kx, (32, 3))
    params, static = partition(flow)

    calls = []
    orig = maybe_fused_flow

    def spy(*args):
        out = orig(*args)
        calls.append(type(out).__name__)
        return out

    import zuko_tpu.ops.dispatch as disp

    old = disp.maybe_fused_flow
    disp.maybe_fused_flow = spy
    try:
        lp = jax.jit(
            lambda p, x: combine(p, static)(None).log_prob(x)
        )(params, x)
    finally:
        disp.maybe_fused_flow = old

    assert calls == ["FusedAutoregressiveFlow"], calls

    import os

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        lp_ref = flow(None).log_prob(x)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    assert jnp.allclose(lp, lp_ref, atol=1e-8)


def test_train_mle_through_dispatch(key, dispatch_on):
    r"""The canonical training loop converges identically whether or not
    dispatch is engaged (custom-VJP backward == XLA backward)."""
    import os

    from zuko_tpu.parallel import train_mle

    data = np.asarray(jax.random.normal(key, (128, 3)))
    flow = NSF(3, transforms=2, hidden_features=(16, 16), key=key)
    _, losses = train_mle(flow, data, epochs=2, batch_size=32, key=key)

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        flow2 = NSF(3, transforms=2, hidden_features=(16, 16), key=key)
        _, losses_ref = train_mle(flow2, data, epochs=2, batch_size=32, key=key)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

    assert np.allclose(losses, losses_ref, atol=1e-6), (losses, losses_ref)


@pytest.mark.parametrize(
    "family",
    ["nsf", "ncsf", "maf", "sospf", "bpf", "naf", "unaf", "gf", "cnf"],
)
def test_batched_context_density_sweep(family, key, dispatch_on):
    r"""Standing batched-context sweep (round 5): EVERY fused family's
    conditional density with a (B, ctx) context must match the XLA path —
    per-row parameters stream through the kernels (GF/CNF) or the context
    columns ride the data (AR families). Small shapes; the per-family
    deep checks live in the dedicated tests."""
    import os

    from zuko_tpu import flows as fz

    kf, kx, kc = jax.random.split(key, 3)
    mk = {
        "nsf": lambda: fz.NSF(3, 2, transforms=2, hidden_features=(8, 8), key=kf),
        "ncsf": lambda: fz.NCSF(3, 2, transforms=2, hidden_features=(8, 8), key=kf),
        "maf": lambda: fz.MAF(3, 2, transforms=2, hidden_features=(8, 8), key=kf),
        "sospf": lambda: fz.SOSPF(3, 2, transforms=2, key=kf),
        "bpf": lambda: fz.BPF(3, 2, transforms=2, key=kf),
        "naf": lambda: fz.NAF(3, 2, transforms=2, signal=6, key=kf),
        "unaf": lambda: fz.UNAF(3, 2, transforms=2, signal=6, key=kf),
        "gf": lambda: fz.GF(3, 2, transforms=2, key=kf),
        "cnf": lambda: fz.CNF(3, 2, hidden_features=(16, 16), key=kf),
    }
    flow = mk[family]()
    B = 7
    c = 0.5 * jax.random.normal(kc, (B, 2))
    x = jax.random.normal(kx, (B, 3))

    lp = flow(c).log_prob(x)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        lp_ref = flow(c).log_prob(x)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    assert lp.shape == (B,)
    assert jnp.allclose(lp, lp_ref, atol=5e-4), (
        family, jnp.abs(lp - lp_ref).max(),
    )


def test_naf_warm_sweeps_match_full_bracket(key, dispatch_on, monkeypatch):
    r"""The warm-started later sweeps (round 5 default: bracket around the
    previous sweep's root with per-row fallback) produce the same inverses
    as the original full-bracket solver to solver tolerance, for both NAF
    and UNAF. Hardware A/B: tools/tpu_validate_r5_iter2.py (+35%/+20%)."""
    import zuko_tpu.ops.naf_fused as nf

    from zuko_tpu.flows import NAF, UNAF

    kf, ks = jax.random.split(key)
    for cls in (NAF, UNAF):
        flow = cls(4, transforms=2, signal=6, key=kf)
        d = flow(None)

        monkeypatch.setattr(nf, "_WARM_SWEEPS", True)
        xw, lw = d.sample_and_log_prob(ks, (256,))
        monkeypatch.setattr(nf, "_WARM_SWEEPS", False)
        xf, lf = d.sample_and_log_prob(ks, (256,))

        assert jnp.allclose(xw, xf, atol=1e-4), (
            cls.__name__, jnp.abs(xw - xf).max(),
        )
        assert jnp.allclose(lw, lf, atol=1e-3), (
            cls.__name__, jnp.abs(lw - lf).max(),
        )


def test_naf_fused_sampling_matches_xla(key, dispatch_on):
    r"""NAF sampling dispatches through the fused bisection kernel and equals
    the XLA newton_bisection path to solver tolerance."""
    from zuko_tpu.flows import NAF
    from zuko_tpu.ops.dispatch import FusedNeuralSamplingFlow
    from zuko_tpu.ops.naf_fused import FusedStructureError as FSE
    from zuko_tpu.ops.naf_fused import extract_naf_params, fused_naf_sample

    kf, ks = jax.random.split(key)
    flow = NAF(3, transforms=2, signal=8, key=kf)
    d = flow(None)
    assert type(d) is FusedNeuralSamplingFlow, type(d)

    x = d.sample(ks, (32,))
    plain = NormalizingFlow(flow.transform(None), d.base)
    x_ref = plain.sample(ks, (32,))
    assert jnp.allclose(x, x_ref, atol=1e-5), jnp.abs(x - x_ref).max()

    # conditional path
    flow_c = NAF(3, 2, transforms=2, signal=8, key=kf)
    c = jnp.ones(2)
    dc = flow_c(c)
    assert type(dc) is FusedNeuralSamplingFlow
    xc = dc.sample(ks, (16,))
    xc_ref = NormalizingFlow(flow_c.transform(c), dc.base).sample(ks, (16,))
    assert jnp.allclose(xc, xc_ref, atol=1e-5)

    # density and rsample stay on the (differentiable) XLA path
    lp = d.log_prob(x)
    assert jnp.allclose(lp, plain.log_prob(x), atol=1e-6)
    xr = d.rsample(ks, (4,))
    assert jnp.allclose(xr, plain.sample(ks, (4,)), atol=1e-6)

    # structure hazards are rejected, not silently mis-sampled
    bad = NAF(3, transforms=2, signal=8, activation=jax.nn.elu, key=kf)
    assert type(bad(None)) is NormalizingFlow
    with pytest.raises(FSE):
        extract_naf_params(bad)
    with pytest.raises(FSE):
        fused_naf_sample(bad, ks, (4,))


def test_ncsf_fused_dispatch(key, dispatch_on):
    r"""NCSF (circular splines over a BoxUniform base, reference:
    zuko/flows/spline.py:65-117) dispatches through the fused kernels: the
    circular wrap, the pi-bounded spline, and the box base density all match
    the XLA path, for density, sampling, and the fused reverse-KL pair."""
    import os

    from zuko_tpu.flows import NCSF

    kf, kx, ks = jax.random.split(key, 3)
    flow = NCSF(3, transforms=2, hidden_features=(16, 16), key=kf)
    d = flow(None)
    assert type(d) is FusedAutoregressiveFlow, type(d)

    x = jax.random.uniform(kx, (32, 3), minval=-4.0, maxval=4.0)

    def xla(fn):
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
        try:
            return fn()
        finally:
            os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

    assert jnp.allclose(d.log_prob(x), xla(lambda: flow(None).log_prob(x)), atol=1e-5)

    s = d.sample(ks, (24,))
    assert jnp.allclose(s, xla(lambda: flow(None).sample(ks, (24,))), atol=1e-5)

    xs, lq = d.sample_and_log_prob(ks, (24,))
    xs_r, lq_r = xla(lambda: flow(None).sample_and_log_prob(ks, (24,)))
    assert jnp.allclose(xs, xs_r, atol=1e-5)
    assert jnp.allclose(lq, lq_r, atol=1e-5)

    # conditional
    flow_c = NCSF(3, 2, transforms=2, hidden_features=(16, 16), key=kf)
    c = jnp.ones(2)
    dc = flow_c(c)
    assert type(dc) is FusedAutoregressiveFlow
    assert jnp.allclose(
        dc.log_prob(x), xla(lambda: flow_c(c).log_prob(x)), atol=1e-5
    )


def test_unaf_fused_sampling_matches_xla(key, dispatch_on):
    r"""UNAF sampling dispatches through the fused kernel: the 32-point
    Gauss-Legendre integrand evaluations are batched along lanes inside the
    bisection (reference: zuko/transforms.py:911-918, 609-617)."""
    import os

    from zuko_tpu.flows import UNAF
    from zuko_tpu.ops.dispatch import FusedNeuralSamplingFlow
    from zuko_tpu.ops.naf_fused import FusedStructureError as FSE
    from zuko_tpu.ops.naf_fused import fused_naf_sample

    kf, ks = jax.random.split(key)
    flow = UNAF(3, transforms=2, signal=8, key=kf)
    d = flow(None)
    assert type(d) is FusedNeuralSamplingFlow, type(d)

    def xla(fn):
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
        try:
            return fn()
        finally:
            os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

    x = d.sample(ks, (24,))
    assert jnp.allclose(
        x, xla(lambda: flow(None).sample(ks, (24,))), atol=1e-5
    ), x

    # conditional
    flow_c = UNAF(3, 2, transforms=2, signal=8, key=kf)
    c = jnp.ones(2)
    xc = flow_c(c).sample(ks, (12,))
    assert jnp.allclose(
        xc, xla(lambda: flow_c(c).sample(ks, (12,))), atol=1e-5
    )

    # a non-ELU integrand is rejected, not silently mis-sampled
    bad = UNAF(3, transforms=2, signal=8,
               network={"activation": jax.nn.relu}, key=kf)
    assert type(bad(None)) is NormalizingFlow
    with pytest.raises(FSE):
        fused_naf_sample(bad, ks, (4,))


@pytest.mark.parametrize("cls", ["SOSPF", "BPF"])
def test_polynomial_fused_density(cls, key, dispatch_on):
    r"""SOSPF/BPF densities dispatch through the fused AR kernel
    and sample through the fused iterative inverse. Reference univariates: zuko/transforms.py:927-963
    (SOSP) and :780-831 (bounded Bernstein), recipes
    zuko/flows/polynomial.py:32-117."""
    import os

    from zuko_tpu.flows import BPF, SOSPF
    from zuko_tpu.ops.dispatch import FusedDensityFlow
    from zuko_tpu.ops.nsf_fused import fused_nsf_sample

    flow_cls = {"SOSPF": SOSPF, "BPF": BPF}[cls]
    kf, kx, ks = jax.random.split(key, 3)
    flow = flow_cls(4, transforms=3, hidden_features=(16, 16), key=kf)
    x = jax.random.normal(kx, (64, 4))

    d = flow(None)
    assert type(d) is FusedDensityFlow, type(d)
    lp = d.log_prob(x)

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        lp_ref = flow(None).log_prob(x)
        s_ref = flow(None).sample(ks, (8,))
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    assert lp.shape == lp_ref.shape == (64,)
    assert jnp.allclose(lp, lp_ref, atol=1e-8), jnp.abs(lp - lp_ref).max()

    # sampling now runs the fused iterative inverse (coarse bisection +
    # free-derivative Newton) — solver-tolerance parity with the XLA
    # newton_bisection path
    s = d.sample(ks, (8,))
    assert jnp.allclose(s, s_ref, atol=1e-5), jnp.abs(s - s_ref).max()

    # gradients through the dispatched density equal the XLA path
    params, static = partition(flow)

    def loss(p):
        return -jnp.mean(combine(p, static)(None).log_prob(x))

    g_fused = jax.grad(loss)(params)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        g_ref = jax.grad(loss)(params)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    for (n, a), (_, b) in zip(named_parameters(g_fused), named_parameters(g_ref)):
        assert jnp.allclose(a, b, atol=2e-6), (n, jnp.abs(a - b).max())


def test_polynomial_fused_conditional(key, dispatch_on):
    r"""Conditional SOSPF through the fused path matches XLA."""
    import os

    from zuko_tpu.flows import SOSPF

    kf, kx, kc = jax.random.split(key, 3)
    flow = SOSPF(3, 2, transforms=2, hidden_features=(16, 16), key=kf)
    x = jax.random.normal(kx, (32, 3))
    c = jax.random.normal(kc, (2,))

    lp = flow(c).log_prob(x)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        lp_ref = flow(c).log_prob(x)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    assert jnp.allclose(lp, lp_ref, atol=1e-8), jnp.abs(lp - lp_ref).max()


def _moderate(flow):
    r"""Scale parameters down to a trained-like regime: a random-init GF
    saturates its gaussianization layers (samples peg at the +-10 monotone
    bound), where any f32-level erf difference is amplified by the flat
    inverse. Parity tolerances below reflect the in-kernel erf/erfinv
    approximations (~1.4e-7 abs, Mosaic lowers no erf primitive)."""
    import jax.tree_util as jtu

    params, static = partition(flow)
    return combine(jtu.tree_map(lambda a: a * 0.3, params), static)


@pytest.mark.parametrize("ctx", [0, 2])
def test_gf_fused_density(ctx, key, dispatch_on):
    r"""GF densities dispatch through the fused gaussianization kernel
    (analytic ladj, rotation matmuls); parity with the XLA path to the
    in-kernel erf approximation error. Reference: zuko/transforms.py:834-875
    and zuko/flows/gaussianization.py:97-155."""
    import os

    from zuko_tpu.flows import GF
    from zuko_tpu.ops.dispatch import FusedGaussianizationFlow

    kf, kx, kc = jax.random.split(key, 3)
    flow = GF(4, ctx, transforms=3, key=kf)
    x = jax.random.normal(kx, (64, 4))
    c = jax.random.normal(kc, (ctx,)) if ctx else None

    d = flow(c)
    assert type(d) is FusedGaussianizationFlow, type(d)
    lp = d.log_prob(x)

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        lp_ref = flow(c).log_prob(x)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    assert lp.shape == lp_ref.shape == (64,)
    assert jnp.allclose(lp, lp_ref, atol=5e-4), jnp.abs(lp - lp_ref).max()

    # gradients through the dispatched density track the XLA path
    params, static = partition(flow)

    def loss(p):
        return -jnp.mean(combine(p, static)(c).log_prob(x))

    g_fused = jax.grad(loss)(params)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        g_ref = jax.grad(loss)(params)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    for (n, a), (_, b) in zip(named_parameters(g_fused), named_parameters(g_ref)):
        assert jnp.allclose(a, b, atol=1e-4), (n, jnp.abs(a - b).max())


def test_gf_fused_sampling(key, dispatch_on):
    r"""GF sampling through the fused bisection kernel matches the XLA
    newton-bisection path (moderate regime; the solves are ill-conditioned
    exactly where the layer saturates, see _moderate)."""
    import os

    from zuko_tpu.flows import GF

    kf, ks = jax.random.split(key)
    flow = _moderate(GF(4, transforms=3, key=kf))

    d = flow(None)
    x = d.sample(ks, (128,))
    x2, lq = d.sample_and_log_prob(ks, (128,))

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        x_ref = flow(None).sample(ks, (128,))
        _, lq_ref = flow(None).sample_and_log_prob(ks, (128,))
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

    assert x.shape == x_ref.shape == (128, 4)
    # Quantile contract: the gaussianization inverse is ill-conditioned
    # exactly where the layer saturates (|f'| -> 0 near the +-10 bound), and
    # there any f32-level erf difference shifts the root arbitrarily — the
    # XLA path pegs at the bound the same way the reference's bisection does
    # (zuko/transforms.py:609-617). Away from saturation the solves agree to
    # solver tolerance.
    e = jnp.abs(x - x_ref)
    assert jnp.median(e) < 1e-5, jnp.median(e)
    assert jnp.quantile(e, 0.95) < 1e-2, jnp.quantile(e, 0.95)
    assert jnp.allclose(x2, x, atol=0.0)
    el = jnp.abs(lq - lq_ref)
    assert jnp.median(el) < 1e-3, jnp.median(el)
    # log q is self-consistent with the fused density at the drawn points
    from zuko_tpu.ops.gf_fused import fused_gf_log_prob

    es = jnp.abs(lq - fused_gf_log_prob(flow, x2))
    assert jnp.median(es) < 1e-4, jnp.median(es)

    # rsample runs the SAME fused solve as sample (IFT gradients) —
    # bit-identical values for the same key
    r = d.rsample(ks, (16,))
    assert jnp.allclose(r, d.sample(ks, (16,)), atol=0.0)


def test_gf_fused_batched_context(key, dispatch_on):
    r"""Batched-context GF (round 5): the per-row hyper outputs stream
    through the kernel as parameter columns concatenated to the data rows
    (gf_fused._flatten_gf). Density/sampling parity with the XLA path,
    sample/log q self-consistency, and IFT rsample gradients matching the
    XLA backward. Reference: zuko/flows/gaussianization.py:74-77."""
    import os

    from zuko_tpu.flows import GF
    from zuko_tpu.ops.dispatch import FusedGaussianizationFlow
    from zuko_tpu.ops.gf_fused import fused_gf_log_prob

    kf, kx, kc, ks = jax.random.split(key, 4)
    flow = GF(4, 3, transforms=2, components=5, key=kf)
    B = 6
    c = jax.random.normal(kc, (B, 3))
    x = jax.random.normal(kx, (B, 4))

    d = flow(c)
    assert type(d) is FusedGaussianizationFlow, type(d)
    lp = d.log_prob(x)

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        lp_ref = flow(c).log_prob(x)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    assert lp.shape == (B,)
    assert jnp.allclose(lp, lp_ref, atol=5e-4), jnp.abs(lp - lp_ref).max()

    # x broadcasting over the context batch (extra sample dims)
    xs3 = jax.random.normal(kx, (5, B, 4))
    lp3 = d.log_prob(xs3)
    assert lp3.shape == (5, B)

    # sampling: sample_shape + context batch + event; log q matches the
    # fused density at the drawn points
    xs, lq = d.sample_and_log_prob(ks, (7,))
    assert xs.shape == (7, B, 4) and lq.shape == (7, B)
    es = jnp.abs(lq - fused_gf_log_prob(flow, xs, c))
    assert jnp.median(es) < 1e-4, jnp.median(es)
    # rsample runs the same fused solve: bit-identical draws
    assert jnp.allclose(d.rsample(ks, (7,)), d.sample(ks, (7,)), atol=0.0)

    # IFT rsample gradients vs the XLA backward (damped params — the GF
    # plateau gradient contract, PERF.md r71)
    params, static = partition(flow)
    params = jax.tree_util.tree_map(lambda a: a * 0.2, params)

    def vi(p):
        xs, lq = combine(p, static)(c).rsample_and_log_prob(ks, (4,))
        return jnp.mean(lq) + jnp.mean(xs**2)

    v_fused, g_fused = jax.value_and_grad(vi)(params)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        v_ref, g_ref = jax.value_and_grad(vi)(params)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    assert jnp.allclose(v_fused, v_ref, atol=2e-3)
    for (n, a), (_, b) in zip(named_parameters(g_fused), named_parameters(g_ref)):
        assert jnp.allclose(a, b, atol=1e-3), (n, jnp.abs(a - b).max())


def test_gf_fused_structure_rejection(key, dispatch_on):
    r"""Non-GF structures raise from the extractor rather than silently
    computing a wrong density; a batched context (representable since
    round 5 — per-row hyper outputs stream through the kernel) routes
    through the fused class and matches the XLA path."""
    from zuko_tpu.flows import GF
    from zuko_tpu.ops.gf_fused import extract_gf_params, fused_gf_log_prob
    from zuko_tpu.ops.dispatch import FusedGaussianizationFlow

    kf, kc = jax.random.split(key)
    flow = GF(3, 2, transforms=2, key=kf)

    # batched context -> fused dispatch, matching the XLA path
    cb = jax.random.normal(kc, (5, 2))
    assert type(flow(cb)) is FusedGaussianizationFlow
    x = jax.random.normal(kc, (5, 3))
    got = fused_gf_log_prob(flow, x, cb)
    ref = NormalizingFlow(flow.transform(cb), flow.base(cb).expand((5,))).log_prob(x)
    assert jnp.allclose(got, ref, atol=5e-4), jnp.max(jnp.abs(got - ref))

    # a non-GF structure is rejected by the extractor
    from zuko_tpu.flows import NSF

    nsf = NSF(3, 0, transforms=2, key=kf)
    with pytest.raises(FusedStructureError):
        extract_gf_params(nsf)


@pytest.mark.parametrize("exact", [True, False])
def test_cnf_fused_density(exact, key, dispatch_on):
    r"""CNF densities dispatch through the fused dopri45 kernel (XLA-path
    math off-TPU: global-step augmented integration, exact-jvp or Hutchinson
    trace). Reference: zuko/transforms.py:1076-1179, zuko/utils.py:366-593."""
    import os

    from zuko_tpu.flows import CNF
    from zuko_tpu.ops.dispatch import FusedContinuousFlow

    kf, kx, kh = jax.random.split(key, 3)
    flow = CNF(3, exact=exact, key=kf)
    x = jax.random.normal(kx, (32, 3))

    d = flow(None, key=None if exact else kh)
    assert type(d) is FusedContinuousFlow, type(d)
    lp = d.log_prob(x)

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        lp_ref = flow(None, key=None if exact else kh).log_prob(x)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    assert lp.shape == lp_ref.shape == (32,)
    assert jnp.allclose(lp, lp_ref, atol=1e-5), jnp.abs(lp - lp_ref).max()

    # gradients through the dispatched density equal the XLA path
    params, static = partition(flow)

    def loss(p):
        return -jnp.mean(
            combine(p, static)(None, key=None if exact else kh).log_prob(x)
        )

    g_fused = jax.grad(loss)(params)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        g_ref = jax.grad(loss)(params)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    for (n, a), (_, b) in zip(named_parameters(g_fused), named_parameters(g_ref)):
        assert jnp.allclose(a, b, atol=1e-6), (n, jnp.abs(a - b).max())


def test_cnf_fused_tile_math_matches_reference(key):
    r"""The kernel's per-tile adaptive integration (the math the Pallas
    program runs) agrees with the global-step reference math when one tile
    holds the whole batch (identical accept/reject decisions)."""
    from zuko_tpu.flows import CNF
    from zuko_tpu.ops.cnf_fused import (
        _cnf_tile_math,
        _ref_log_prob,
        extract_cnf_params,
    )

    kf, kx = jax.random.split(key)
    flow = CNF(3, key=kf)
    transform = flow.transform(None)
    ws, bs, c_phi, _, cfg = extract_cnf_params(flow, transform, None)
    x = jax.random.normal(kx, (64, 3)).astype(ws[0].dtype)

    nf, F = cfg["nf"], cfg["F"]
    W1 = ws[0]
    params = [W1[:, 2 * nf : 2 * nf + F], W1[:, : 2 * nf], bs[0]]
    for W, b in zip(ws[1:], bs[1:]):
        params += [W, b]
    lp_tile = _cnf_tile_math(x.T, None, params, cfg)[0]
    lp_ref = _ref_log_prob(x, None, ws, bs, None, cfg)
    assert jnp.allclose(lp_tile, lp_ref, atol=1e-4), jnp.abs(lp_tile - lp_ref).max()


def test_cnf_fused_structure_rejection(key, dispatch_on):
    r"""ODE nets the CNF kernel cannot represent (LayerNorm, non-ELU
    activations, batched context) fall back to the XLA path."""
    from zuko_tpu.flows import CNF
    from zuko_tpu.ops.cnf_fused import extract_cnf_params
    from zuko_tpu.ops.nsf_fused import FusedStructureError

    kf, kc = jax.random.split(key)
    # LayerNorm hyper-net -> fallback
    flow_ln = CNF(3, normalize=True, key=kf)
    assert type(flow_ln(None)) is NormalizingFlow
    with pytest.raises(FusedStructureError):
        extract_cnf_params(flow_ln, flow_ln.transform(None))

    # non-ELU activation -> fallback
    flow_relu = CNF(3, activation=jax.nn.relu, key=kf)
    assert type(flow_relu(None)) is NormalizingFlow

    # batched context is representable since round 5 (the per-row folded
    # first bias streams with the data rows) -> fused dispatch
    from zuko_tpu.ops.dispatch import FusedContinuousFlow

    flow_c = CNF(3, 2, key=kf)
    cb = jax.random.normal(kc, (5, 2))
    assert type(flow_c(cb)) is FusedContinuousFlow


def test_cnf_fused_batched_context(key, dispatch_on):
    r"""Batched-context CNF (round 5): the per-row folded first bias
    streams through the kernel with the data rows (cnf_fused._batched_aug).
    Density/sampling parity with the XLA path and density gradients
    (including the context gradient) matching the XLA backward.
    Reference: zuko/flows/continuous.py:88-97."""
    import os

    from zuko_tpu.flows import CNF
    from zuko_tpu.ops.dispatch import FusedContinuousFlow
    from zuko_tpu.ops.cnf_fused import fused_cnf_log_prob

    kf, kx, kc, ks = jax.random.split(key, 4)
    flow = CNF(3, 2, hidden_features=(16, 16), key=kf)
    B = 5
    c = 0.5 * jax.random.normal(kc, (B, 2))
    x = jax.random.normal(kx, (B, 3))

    d = flow(c)
    assert type(d) is FusedContinuousFlow, type(d)
    lp = d.log_prob(x)

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        lp_ref = flow(c).log_prob(x)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    assert lp.shape == (B,)
    assert jnp.allclose(lp, lp_ref, atol=1e-4), jnp.abs(lp - lp_ref).max()

    # sampling: sample_shape + context batch + event; log q matches the
    # fused density at the drawn points
    xs, lq = d.sample_and_log_prob(ks, (4,))
    assert xs.shape == (4, B, 3) and lq.shape == (4, B)
    es = jnp.abs(lq - fused_cnf_log_prob(flow, flow.transform(c), xs, c))
    assert jnp.median(es) < 1e-3, jnp.median(es)

    # density gradients incl. the context gradient track the XLA path
    params, static = partition(flow)

    def loss(p, c):
        return -jnp.mean(combine(p, static)(c).log_prob(x))

    g_fused, gc_fused = jax.grad(loss, argnums=(0, 1))(params, c)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        g_ref, gc_ref = jax.grad(loss, argnums=(0, 1))(params, c)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    assert jnp.allclose(gc_fused, gc_ref, atol=1e-4), (
        jnp.abs(gc_fused - gc_ref).max()
    )
    for (n, a), (_, b) in zip(named_parameters(g_fused), named_parameters(g_ref)):
        assert jnp.allclose(a, b, atol=1e-4), (n, jnp.abs(a - b).max())


def test_cnf_exact_trace_vmem_gate(key, dispatch_on):
    r"""Exact-trace CNF structures whose in-kernel tangent block cannot fit
    VMEM even at the minimum tile are REJECTED to the XLA path with
    guidance (r5: D=64 exact measured 29.7MB against the 16MB scoped
    limit), instead of failing at compile time; Hutchinson at the same
    size stays representable, and mid sizes shrink the tile instead."""
    from zuko_tpu.flows import CNF
    from zuko_tpu.ops.cnf_fused import (
        _cnf_tb, extract_cnf_params, FusedStructureError,
    )

    flow = CNF(64, 10, exact=True, key=key)
    c = jnp.zeros((4, 10))
    with pytest.raises(FusedStructureError, match="Hutchinson"):
        extract_cnf_params(flow, flow.transform(c), c)
    assert type(flow(c)) is NormalizingFlow  # dispatch falls back

    # Hutchinson at the same size is representable
    fh = CNF(64, 10, exact=False, key=key)
    ws, bs, c_phi, _, cfg = extract_cnf_params(
        fh, fh.transform(c, key=key), c
    )
    assert _cnf_tb(cfg, max(int(w.shape[0]) for w in ws)) == 256

    # mid-size exact shrinks the tile instead of rejecting
    f32f = CNF(32, 0, exact=True, key=key)
    ws, bs, _, _, cfg = extract_cnf_params(f32f, f32f.transform(None))
    assert _cnf_tb(cfg, max(int(w.shape[0]) for w in ws)) == 128


def test_cnf_fused_exhaustion_poisons(key):
    r"""The kernel tile math NaN-poisons on step-budget exhaustion, exactly
    like utils.odeint (reference never truncates silently,
    zuko/utils.py:538-552)."""
    from zuko_tpu.flows import CNF
    from zuko_tpu.ops.cnf_fused import _cnf_tile_math, extract_cnf_params

    flow = CNF(3, max_steps=1, key=key)
    transform = flow.transform(None)
    ws, bs, _, _, cfg = extract_cnf_params(flow, transform, None)
    # a 1-step budget cannot integrate t=0..1 below tolerance for a generic
    # random net unless the dynamics are trivially smooth — force exhaustion
    # with a hard budget and check the poison path wiring instead
    cfg = dict(cfg, max_steps=0)
    nf, F = cfg["nf"], cfg["F"]
    W1 = ws[0]
    params = [W1[:, 2 * nf : 2 * nf + F], W1[:, : 2 * nf], bs[0]]
    for W, b in zip(ws[1:], bs[1:]):
        params += [W, b]
    x = jax.random.normal(key, (8, 3)).astype(ws[0].dtype)
    lp = _cnf_tile_math(x.T, None, params, cfg)
    assert jnp.all(jnp.isnan(lp)), "exhausted budget must NaN-poison"


@pytest.mark.parametrize("exact", [True, False])
def test_cnf_fused_sampling(exact, key, dispatch_on):
    r"""CNF sampling dispatches through the fused backward-integration
    kernel: the plain inverse is bit-identical to the XLA path (same
    un-augmented integration), sample_and_log_prob agrees to roundoff, and
    rsample runs the same fused forward under the continuous-adjoint
    custom VJP (fused_cnf_rsample) — value-identical to the XLA draw
    (reference semantics: zuko/transforms.py:1129-1138,
    zuko/distributions.py:121-138). Gradient parity is pinned separately in
    test_cnf_rsample_gradients_match_xla_f64."""
    import os

    from zuko_tpu.flows import CNF
    from zuko_tpu.ops.dispatch import FusedContinuousFlow

    kf, ks, kh = jax.random.split(key, 3)
    flow = CNF(3, exact=exact, key=kf)
    hk = None if exact else kh

    d = flow(None, key=hk)
    assert type(d) is FusedContinuousFlow
    x = d.sample(ks, (32,))
    x2, lq = d.sample_and_log_prob(ks, (32,))
    r = d.rsample(ks, (8,))

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        dref = flow(None, key=hk)
        x_ref = dref.sample(ks, (32,))
        x2r, lqr = dref.sample_and_log_prob(ks, (32,))
        r_ref = dref.rsample(ks, (8,))
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

    assert jnp.allclose(x, x_ref, atol=0.0), jnp.abs(x - x_ref).max()
    assert jnp.allclose(x2, x2r, atol=0.0)
    assert jnp.allclose(lq, lqr, atol=1e-5), jnp.abs(lq - lqr).max()
    assert jnp.allclose(r, r_ref, atol=0.0)


def test_cnf_fused_sample_tile_math_matches_reference(key):
    r"""The sampling kernel's per-tile math (reversed augmented integration)
    agrees with the global-step reference when one tile holds the batch."""
    from zuko_tpu.flows import CNF
    from zuko_tpu.ops.cnf_fused import (
        _cnf_tile_sample_math,
        _kernel_params,
        _ref_sample,
        extract_cnf_params,
    )

    kf, kz = jax.random.split(key)
    flow = CNF(3, key=kf)
    transform = flow.transform(None)
    ws, bs, c_phi, _, cfg = extract_cnf_params(flow, transform, None)
    z = jax.random.normal(kz, (64, 3)).astype(ws[0].dtype)

    params = _kernel_params(ws, bs, None, cfg)
    x_t, lq_t = _cnf_tile_sample_math(z.T, None, params, cfg, True)
    x_r, lq_r = _ref_sample(z, None, ws, bs, None, cfg, True)
    assert jnp.allclose(x_t.T, x_r, atol=1e-4), jnp.abs(x_t.T - x_r).max()
    assert jnp.allclose(lq_t[0], lq_r, atol=1e-4), jnp.abs(lq_t[0] - lq_r).max()

    x_t2 = _cnf_tile_sample_math(z.T, None, params, cfg, False)
    x_r2 = _ref_sample(z, None, ws, bs, None, cfg, False)
    assert jnp.allclose(x_t2.T, x_r2, atol=1e-4)


def test_bayesian_reparam_dispatches_fused(key, dispatch_on):
    r"""A Bayesian-wrapped flow's reparameterized draws keep the fused fast
    path: the swapped-in traced weights extract cleanly and gradients route
    to the posterior means/logvars through the fused custom VJP
    (reference semantics: zuko/bayesian.py:141-168)."""
    import os

    from zuko_tpu.bayesian import BayesianModel

    kf, kr, kx = jax.random.split(key, 3)
    flow = NSF(3, 0, transforms=2, hidden_features=(16, 16), key=kf)
    bm = BayesianModel(flow)
    x = jax.random.normal(kx, (32, 3))

    rflow = bm.reparameterize(kr)
    d = rflow(None)
    assert type(d) is FusedAutoregressiveFlow, type(d)
    lp = d.log_prob(x)

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        lp_ref = rflow(None).log_prob(x)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    assert jnp.allclose(lp, lp_ref, atol=1e-8), jnp.abs(lp - lp_ref).max()

    # gradients flow to the posterior parameters and match the XLA path
    params, static = partition(bm)

    def loss(p):
        m = combine(p, static)
        return -jnp.mean(m.reparameterize(kr)(None).log_prob(x))

    g_fused = jax.grad(loss)(params)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        g_ref = jax.grad(loss)(params)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    for (n, a), (_, b) in zip(named_parameters(g_fused), named_parameters(g_ref)):
        assert jnp.allclose(a, b, atol=2e-6), (n, jnp.abs(a - b).max())


def test_checkpoint_roundtrip_keeps_fused_path(key, dispatch_on, tmp_path):
    r"""Checkpoint round-trips serialize jax.nn.relu BY VALUE (it does not
    pickle by reference), so the loaded activation is a fresh object — the
    structure extractor must still recognize it or served models silently
    lose the fused fast path (caught by examples/serving.py)."""
    from zuko_tpu import serial
    from zuko_tpu.ops.nsf_fused import extract_nsf_params

    flow = NSF(3, 0, transforms=2, hidden_features=(16, 16), key=key)
    p = str(tmp_path / "ckpt.zuko")
    serial.save(p, flow)
    loaded = serial.load(p)

    extract_nsf_params(loaded)  # must not raise
    d = loaded(None)
    assert type(d) is FusedAutoregressiveFlow
    x = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    assert jnp.allclose(d.log_prob(x), flow(None).log_prob(x), atol=1e-6)


@pytest.mark.parametrize("cls", [NAF, UNAF])
def test_naf_fused_sample_and_log_prob(cls, key, dispatch_on):
    r"""Fused NAF/UNAF sample_and_log_prob: log q computed analytically at
    the solved x (monotone-net derivative; FTC integrand point for UMNN)
    must agree with the flow's density. UMNN tolerance reflects the
    method difference: the density path differentiates the GL-32
    quadrature (node-motion terms included), the fused ladj IS the true
    derivative g(x)."""
    flow = cls(4, transforms=2, signal=12, key=key)
    d = flow(None)
    x, lq = d.sample_and_log_prob(jax.random.PRNGKey(7), (128,))
    lp = d.log_prob(x)
    # NAF: both quantities are exact functions of the solved x, but the
    # warm-started sweeps (r5) may land a ~1e-9-different root than the
    # full-bracket solver — well inside the eps=1e-6 solve contract; the
    # old 1e-10 pin was an incidental bitwise property of the full path.
    tol = 1e-7 if cls is NAF else 1e-4
    assert jnp.abs(lq - lp).max() < tol, jnp.abs(lq - lp).max()


@pytest.mark.parametrize("cls", [NAF, UNAF])
def test_naf_fused_density(cls, key, dispatch_on):
    r"""Fused NAF/UNAF density: forward monotone-net evaluation with
    analytic ladjs (no jvp) must match the XLA path, values and
    gradients (NAF exactly; UMNN to the quadrature-derivative method
    difference)."""
    flow = cls(4, transforms=2, signal=12, key=key)
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 4))
    lp = flow(None).log_prob(x)

    import os

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        lp_ref = flow(None).log_prob(x)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    tol = 1e-10 if cls is NAF else 1e-4
    assert jnp.abs(lp - lp_ref).max() < tol, jnp.abs(lp - lp_ref).max()

    params, static = partition(flow)

    def loss(p):
        return -jnp.mean(combine(p, static)(None).log_prob(x))

    g_fused = jax.grad(loss)(params)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        g_ref = jax.grad(loss)(params)
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    for (n, a), (_, b) in zip(
        named_parameters(g_fused), named_parameters(g_ref)
    ):
        assert jnp.allclose(a, b, atol=1e-4), (n, jnp.abs(a - b).max())


@pytest.mark.parametrize("cls_name", ["SOSPF", "BPF"])
def test_polynomial_fused_sampling(cls_name, key, dispatch_on):
    r"""Fused polynomial (SOSPF/BPF) sampling: coarse bisection + Newton
    with the free analytic derivative (the forward's own log f') must
    match the XLA newton_bisection path to solver tolerance, and the
    fused log q must match the fused density."""
    import zuko_tpu.flows as zf

    cls = getattr(zf, cls_name)
    flow = cls(4, transforms=2, key=key)
    d = flow(None)
    ks = jax.random.PRNGKey(7)
    x = d.sample(ks, (128,))

    import os

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        x_ref = flow(None).sample(ks, (128,))
    finally:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
    assert jnp.abs(x - x_ref).max() < 1e-5, jnp.abs(x - x_ref).max()

    xs, lq = d.sample_and_log_prob(ks, (128,))
    assert jnp.abs(lq - d.log_prob(xs)).max() < 1e-10


def test_naf_fused_density_conditional(key, dispatch_on):
    r"""Conditional NAF/UNAF fused density (context concatenated into the
    MADE input, reference: zuko/flows/autoregressive.py:207-215)."""
    for cls in (NAF, UNAF):
        flow = cls(4, 3, transforms=2, signal=12, key=key)
        c = jax.random.normal(jax.random.PRNGKey(5), (32, 3))
        x = jax.random.normal(jax.random.PRNGKey(6), (32, 4))
        lp = flow(c).log_prob(x)

        import os

        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
        try:
            lp_ref = flow(c).log_prob(x)
        finally:
            os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
        tol = 1e-10 if cls is NAF else 1e-4
        assert jnp.abs(lp - lp_ref).max() < tol


# --------------------------------------------------------- IFT rsample tier


def _cast_params(params, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        params,
    )


def _rkl_loss_pair(flow, c, k, n=64):
    """(fused/IFT loss fn, XLA scan-inverse loss fn) over the params of
    ``flow`` for a reverse-KL-shaped objective."""
    params, static = partition(flow)

    def loss_ift(p):
        d = combine(p, static)(c)  # dispatched: IFT custom-VJP rsample
        x, lq = d.rsample_and_log_prob(k, (n,))
        return jnp.mean(lq) + jnp.mean(jnp.sum(x**2, -1))

    def loss_xla(p):
        d = combine(p, static)(c)
        d2 = NormalizingFlow(d.transform, d.base)  # plain scan inverse
        x, lq = d2.rsample_and_log_prob(k, (n,))
        return jnp.mean(lq) + jnp.mean(jnp.sum(x**2, -1))

    return params, loss_ift, loss_xla


@pytest.mark.parametrize("case", ["NSF", "NSF-cond", "MAF", "NCSF"])
def test_ift_rsample_gradients_match_xla_f64(case, key, dispatch_on):
    r"""The IFT custom-VJP reverse-KL gradients equal differentiating the
    XLA scan inverse (reference semantics: zuko/distributions.py:129-138)
    — exactly, in f64: the triangular-transpose solve is exact after
    ``passes`` iterations, like the forward fixed point."""
    from zuko_tpu.flows import NCSF

    kf, kc, kk = jax.random.split(key, 3)
    c = None
    if case == "NSF":
        flow = NSF(5, 0, transforms=3, key=kf)
    elif case == "NSF-cond":
        flow = NSF(5, 3, transforms=3, key=kf)
        c = jax.random.normal(kc, (3,), dtype=jnp.float64)
    elif case == "MAF":
        flow = MAF(5, 0, transforms=3, key=kf)
    else:
        flow = NCSF(4, 0, transforms=2, key=kf)

    params, loss_ift, loss_xla = _rkl_loss_pair(flow, c, kk)
    params = _cast_params(params, jnp.float64)

    l1, g1 = jax.value_and_grad(loss_xla)(params)
    l2, g2 = jax.value_and_grad(loss_ift)(params)
    assert jnp.abs(l1 - l2) < 1e-9
    for (n, a), (_, b) in zip(named_parameters(g1), named_parameters(g2)):
        assert jnp.allclose(a, b, atol=1e-9), (n, jnp.abs(a - b).max())


@pytest.mark.parametrize("cls_name", ["SOSPF", "BPF"])
def test_ift_rsample_gradients_polynomial(cls_name, key, dispatch_on):
    r"""SOSPF/BPF rsample gradients via IFT match the XLA path to solver
    tolerance (their fused inverse is coarse bisection + Newton at
    eps ~1e-6; the IFT Jacobians are evaluated at the solved point)."""
    from zuko_tpu import flows

    kf, kk = jax.random.split(key)
    flow = getattr(flows, cls_name)(4, 0, transforms=2, key=kf)
    params, loss_ift, loss_xla = _rkl_loss_pair(flow, None, kk)
    params = _cast_params(params, jnp.float64)

    l1, g1 = jax.value_and_grad(loss_xla)(params)
    l2, g2 = jax.value_and_grad(loss_ift)(params)
    assert jnp.abs(l1 - l2) < 1e-5
    for (n, a), (_, b) in zip(named_parameters(g1), named_parameters(g2)):
        assert jnp.allclose(a, b, atol=1e-4), (n, jnp.abs(a - b).max())


def test_ift_rsample_values_match_sample(key, dispatch_on):
    r"""rsample (IFT path) draws the same values as the non-differentiable
    fused sample for the same key, and its log q equals the fused
    sample_and_log_prob."""
    kf, kk = jax.random.split(key)
    flow = NSF(5, 0, transforms=3, key=kf)
    d = flow(None)
    assert isinstance(d, FusedAutoregressiveFlow)
    x1 = d.sample(kk, (32,))
    x2 = d.rsample(kk, (32,))
    assert jnp.allclose(x1, x2, atol=1e-6)
    x3, lq3 = d.sample_and_log_prob(kk, (32,))
    x4, lq4 = d.rsample_and_log_prob(kk, (32,))
    assert jnp.allclose(x3, x4, atol=1e-6)
    assert jnp.allclose(lq3, lq4, atol=1e-6)


def test_ift_rsample_gradients_f32(key, dispatch_on):
    r"""f32 gradient regression through the dispatch (the silent-zero-grad
    hazard class: bit-twiddle primitives without custom_jvp showed only in
    f32). Grad must be finite, non-zero, and close to the XLA path."""
    kf, kk = jax.random.split(key)
    flow = NSF(4, 0, transforms=2, hidden_features=(16, 16), key=kf)
    params, loss_ift, loss_xla = _rkl_loss_pair(flow, None, kk, n=32)
    params = _cast_params(params, jnp.float32)

    g1 = jax.grad(loss_xla)(params)
    g2 = jax.grad(loss_ift)(params)
    total = 0.0
    for (n, a), (_, b) in zip(named_parameters(g1), named_parameters(g2)):
        assert jnp.all(jnp.isfinite(b)), n
        assert jnp.allclose(a, b, atol=5e-5), (n, jnp.abs(a - b).max())
        total += float(jnp.sum(jnp.abs(b)))
    assert total > 1e-3  # gradients actually flow


def test_ift_env_escape_hatch(key, monkeypatch, dispatch_on):
    r"""ZUKO_TPU_IFT=0 falls back to the XLA scan-inverse rsample."""
    monkeypatch.setenv("ZUKO_TPU_IFT", "0")
    kf, kk = jax.random.split(key)
    flow = NSF(4, 0, transforms=2, key=kf)
    d = flow(None)
    x, lq = d.rsample_and_log_prob(kk, (8,))
    d2 = NormalizingFlow(d.transform, d.base)
    x2, lq2 = d2.rsample_and_log_prob(kk, (8,))
    assert jnp.allclose(x, x2, atol=1e-6)
    assert jnp.allclose(lq, lq2, atol=1e-5)


def test_reverse_kl_step_through_ift(key, dispatch_on):
    r"""The VI train step (make_reverse_kl_step) runs through the IFT path
    and optimizes: loss decreases on a tractable ring energy
    (reference: docs/tutorials/reverse_kl.ipynb)."""
    from zuko_tpu.parallel.train import make_reverse_kl_step

    kf, kk = jax.random.split(key)
    flow = NSF(2, 0, transforms=3, hidden_features=(32, 32), key=kf)
    params, static = partition(flow)
    params = _cast_params(params, jnp.float32)

    def log_energy(x):
        r = jnp.linalg.norm(x, axis=-1)
        return -((r - 2.0) ** 2) / 0.1

    init_fn, step_fn = make_reverse_kl_step(static, log_energy, n_samples=256)
    state = init_fn(params)
    losses = []
    for i in range(30):
        state, loss = step_fn(state, jax.random.fold_in(kk, i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.5


@pytest.mark.parametrize("case", ["NAF", "UNAF", "NAF-cond"])
def test_ift_rsample_gradients_neural(case, key, dispatch_on):
    r"""NAF/UNAF rsample gradients via the IFT tier match differentiating
    the XLA scan inverse to solver tolerance (the fused bisection+Newton
    root carries eps ~1e-6; UNAF additionally the GL-16-vs-GL-32
    quadrature gap). Reference semantics: zuko/distributions.py:121-138."""
    from zuko_tpu.flows import NAF, UNAF

    kf, kc, kk = jax.random.split(key, 3)
    c = None
    tol = 1e-6
    if case == "NAF":
        flow = NAF(4, 0, transforms=2, key=kf)
    elif case == "UNAF":
        flow = UNAF(4, 0, transforms=2, signal=8, key=kf)
        tol = 5e-4
    else:
        flow = NAF(4, 2, transforms=2, key=kf)
        c = jax.random.normal(kc, (2,), dtype=jnp.float64) * 0.3

    params, loss_ift, loss_xla = _rkl_loss_pair(flow, c, kk)
    params = _cast_params(params, jnp.float64)

    l1, g1 = jax.value_and_grad(loss_xla)(params)
    l2, g2 = jax.value_and_grad(loss_ift)(params)
    assert jnp.abs(l1 - l2) < tol
    for (n, a), (_, b) in zip(named_parameters(g1), named_parameters(g2)):
        assert jnp.allclose(a, b, atol=tol), (n, jnp.abs(a - b).max())


def test_ift_rsample_values_match_sample_naf(key, dispatch_on):
    r"""The NAF IFT rsample draws the same values as the non-differentiable
    fused sample for the same key; its log q equals the fused
    sample_and_log_prob."""
    from zuko_tpu.flows import NAF
    from zuko_tpu.ops.dispatch import FusedNeuralSamplingFlow

    kf, kk = jax.random.split(key)
    flow = NAF(3, 0, transforms=2, key=kf)
    d = flow(None)
    assert isinstance(d, FusedNeuralSamplingFlow)
    x1 = d.sample(kk, (16,))
    x2 = d.rsample(kk, (16,))
    assert jnp.allclose(x1, x2, atol=1e-6)
    x3, lq3 = d.sample_and_log_prob(kk, (16,))
    x4, lq4 = d.rsample_and_log_prob(kk, (16,))
    assert jnp.allclose(x3, x4, atol=1e-6)
    assert jnp.allclose(lq3, lq4, atol=1e-6)


def test_ift_pegged_solve_rows_contribute_zero(key, dispatch_on):
    r"""Unreachable tail targets peg the NAF bisection at the +-bound
    bracket edge, where T(x) != z and the IFT premise fails — the XLA
    path there returns near-garbage gradients that can dominate the whole
    batch (r59: 2 pegged rows carried 92% of a 16384-row gradient). The
    IFT backward must zero those rows' cotangents (`ift._SOLVE_ATOL`) and
    leave the valid rows matching the XLA path."""
    from zuko_tpu.flows import NAF
    from zuko_tpu.ops import ift, naf_fused as nafm

    kf, kz = jax.random.split(key)
    flow = NAF(3, 0, transforms=2, key=kf)
    stages, cfg = nafm.extract_naf_params(flow)
    F, S = cfg["features"], cfg["signal"]
    fp, layout = nafm._stage_layout(stages, F, S)

    z = jax.random.normal(kz, (8, 3), dtype=jnp.float64)
    z = z.at[3, 1].set(200.0)  # unreachable: pegs the feature-1 solve

    x, _ = ift._naf_ift_op(layout, F, 0, S, True, z, *fp)
    assert jnp.abs(x[3]).max() >= 10.0 - 1e-6  # pegged at the solve bound

    def f(zz):
        xs, lq = ift._naf_ift_op(layout, F, 0, S, True, zz, *fp)
        return jnp.sum(lq) + jnp.sum(xs**2)

    g = jax.grad(f)(z)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert jnp.abs(g[3]).max() == 0.0  # pegged row: zero cotangent

    # valid rows still match differentiating the XLA inverse
    d = NormalizingFlow(flow(None).transform, flow(None).base)

    def f_xla(zz):
        xs, ladj = d.transform.inverse_and_ladj(zz)
        lq = d.base.log_prob(zz) - ladj
        return jnp.sum(lq) + jnp.sum(xs**2)

    g_xla = jax.grad(f_xla)(z)
    mask = jnp.arange(8) != 3
    assert jnp.allclose(g[mask], g_xla[mask], atol=1e-6), (
        jnp.abs(g[mask] - g_xla[mask]).max()
    )


@pytest.mark.parametrize("cond", [0, 2])
def test_ift_rsample_gradients_gf(cond, key, dispatch_on):
    r"""GF rsample gradients via the IFT tier (diagonal solves +
    orthogonal-rotation transposes) match the XLA path on a
    well-conditioned flow — unconditional and conditional (the context
    folds into the extracted shift/scale, so context gradients chain
    through `_flatten_gf`). At a RANDOM init the erf-mixture has plateaus
    where the fused and XLA roots differ by the solver contract (~3e-4)
    and the gradient field varies exponentially — BOTH paths' gradients
    are ill-conditioned there (the documented GF init-fragility), so the
    parity check uses damped parameters; a finite-difference probe
    validates the IFT backward at its own root regardless."""
    from zuko_tpu.flows import GF
    from zuko_tpu.ops.dispatch import FusedGaussianizationFlow

    kf, kk = jax.random.split(key)
    flow = GF(4, cond, transforms=2, key=kf)
    c = jnp.asarray([0.3, -0.2], jnp.float64) if cond else None
    params, loss_ift, loss_xla = _rkl_loss_pair(flow, c, kk)
    params = jax.tree_util.tree_map(
        lambda a: (a * 0.2).astype(jnp.float64)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        params,
    )

    l1, g1 = jax.value_and_grad(loss_xla)(params)
    l2, g2 = jax.value_and_grad(loss_ift)(params)
    assert jnp.abs(l1 - l2) < 1e-3
    for (n, a), (_, b) in zip(named_parameters(g1), named_parameters(g2)):
        rel = jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-12)
        # 1e-2: even damped, a draw can sit near a mild plateau where the
        # two solvers' root gap amplifies; this test guards the WIRING —
        # the FD probe (journaled, r60) pins the backward at its own root
        assert rel < 1e-2, (n, rel)

    # rsample values == the non-differentiable fused sample, same key
    d = flow(c)
    assert isinstance(d, FusedGaussianizationFlow)
    x1 = d.sample(kk, (16,))
    x2 = d.rsample(kk, (16,))
    assert jnp.allclose(x1, x2, atol=1e-6)


def test_ift_rsample_gradients_f32_neural(key, dispatch_on):
    r"""f32 gradient regression through the NAF IFT tier (the
    silent-zero-grad hazard class hides from the f64 battery: `_log_ladj`
    routes to the bit-twiddle `_log_acc` only in f32). Grads must be
    finite, non-zero, and close to the XLA path at a small batch (no
    pegged rows)."""
    from zuko_tpu.flows import NAF

    kf, kk = jax.random.split(key)
    flow = NAF(3, 0, transforms=2, key=kf)
    params, loss_ift, loss_xla = _rkl_loss_pair(flow, None, kk, n=32)
    params = _cast_params(params, jnp.float32)

    g1 = jax.grad(loss_xla)(params)
    g2 = jax.grad(loss_ift)(params)
    total = 0.0
    for (n, a), (_, b) in zip(named_parameters(g1), named_parameters(g2)):
        assert jnp.all(jnp.isfinite(b)), n
        # both paths carry f32 solver noise at their own roots
        assert jnp.allclose(a, b, atol=5e-3), (n, jnp.abs(a - b).max())
        total += float(jnp.sum(jnp.abs(b)))
    assert total > 1e-3  # gradients actually flow


def test_inverted_flow_dispatch(key, dispatch_on):
    r"""Inverted flows (``Flow(flow.transform.inv, flow.base)`` — the
    reference's reverse-KL recipe, zuko/lazy.py:81-98) dispatch with the
    roles SWAPPED onto the fused kernels: sample/rsample = the forward
    APPLY (no solve, differentiable custom VJP), log_prob = the fused
    solve with raw-mode IFT gradients. All surfaces and both gradient
    directions match the XLA path in f64."""
    from zuko_tpu.lazy import Flow
    from zuko_tpu.ops.dispatch import FusedInvertedAutoregressiveFlow

    kf, kk, kx = jax.random.split(key, 3)
    flow = NSF(3, 0, transforms=2, key=kf)
    inv = Flow(flow.transform.inv, flow.base)
    params, static = partition(inv)
    params = _cast_params(params, jnp.float64)
    d = combine(params, static)(None)
    assert isinstance(d, FusedInvertedAutoregressiveFlow)

    dx = NormalizingFlow(d.transform, d.base)
    x = jax.random.normal(kx, (32, 3), jnp.float64)
    assert jnp.allclose(d.log_prob(x), dx.log_prob(x), atol=1e-9)
    assert jnp.allclose(d.sample(kk, (16,)), dx.sample(kk, (16,)), atol=1e-9)
    xs, ls = d.sample_and_log_prob(kk, (16,))
    xr, lr = dx.sample_and_log_prob(kk, (16,))
    assert jnp.allclose(xs, xr, atol=1e-9)
    assert jnp.allclose(ls, lr, atol=1e-9)

    # reverse-KL gradients through the apply op's custom VJP
    def loss_vi(p, force_xla):
        dd = combine(p, static)(None)
        if force_xla:
            dd = NormalizingFlow(dd.transform, dd.base)
        s, lq = dd.rsample_and_log_prob(kk, (32,))
        return jnp.mean(lq) + jnp.mean(jnp.sum(s**2, -1))

    g1 = jax.grad(lambda p: loss_vi(p, True))(params)
    g2 = jax.grad(lambda p: loss_vi(p, False))(params)
    for (n, a), (_, b) in zip(named_parameters(g1), named_parameters(g2)):
        assert jnp.allclose(a, b, atol=1e-9), (n, jnp.abs(a - b).max())

    # forward-KL (MLE) gradients through the raw-mode IFT solve
    def loss_fk(p, force_xla):
        dd = combine(p, static)(None)
        if force_xla:
            dd = NormalizingFlow(dd.transform, dd.base)
        return -jnp.mean(dd.log_prob(x))

    g1 = jax.grad(lambda p: loss_fk(p, True))(params)
    g2 = jax.grad(lambda p: loss_fk(p, False))(params)
    for (n, a), (_, b) in zip(named_parameters(g1), named_parameters(g2)):
        assert jnp.allclose(a, b, atol=1e-9), (n, jnp.abs(a - b).max())


# ------------------------------------------------- CNF continuous adjoint


def _cnf_rkl_loss_pair(flow, c, hk, k, n=8):
    """(fused continuous-adjoint loss, XLA discrete-adjoint loss) over the
    params of a CNF ``flow`` for a reverse-KL-shaped objective. ``hk`` seeds
    the Hutchinson probe (None for exact trace)."""
    params, static = partition(flow)

    def build(p):
        f = combine(p, static)
        return f(c, key=hk) if hk is not None else f(c)

    def loss_fused(p):
        d = build(p)  # dispatched: fused forward + continuous-adjoint VJP
        x, lq = d.rsample_and_log_prob(k, (n,))
        return jnp.mean(lq) + jnp.mean(jnp.sum(x**2, -1))

    def loss_xla(p):
        d = build(p)
        d2 = NormalizingFlow(d.transform, d.base)  # odeint discrete adjoint
        x, lq = d2.rsample_and_log_prob(k, (n,))
        return jnp.mean(lq) + jnp.mean(jnp.sum(x**2, -1))

    return params, loss_fused, loss_xla


@pytest.mark.parametrize("case", ["exact", "exact-cond", "exact-bcond", "hutch"])
def test_cnf_rsample_gradients_match_xla_f64(case, key, dispatch_on):
    r"""fused_cnf_rsample's continuous-adjoint gradients match
    differentiating the XLA path's stored-step discrete adjoint
    (zuko/utils.py:515-593 semantics) at tight solver tolerances. Both
    discretize the same continuous adjoint; the residual gap is the
    *derivative* of each path's O(tol) discretization error, which scales
    sub-linearly in tol (measured ~7e-5 at 1e-9, ~2e-5 at 1e-11) — so the
    pin is 2e-4 at atol=rtol=1e-9, on top of exact loss equality (the
    fused CPU fallback reproduces the XLA forward bitwise). Covers exact
    and Hutchinson traces and the conditional case. max_steps is raised
    because the backward honors the same budget and correctly NaN-poisons
    on exhaustion at these tolerances (see
    test_cnf_rsample_budget_exhaustion_poisons_grads)."""
    from zuko_tpu.flows import CNF
    from zuko_tpu.ops.dispatch import FusedContinuousFlow

    kf, kc, kh, kk = jax.random.split(key, 4)
    c, hk = None, None
    tols = dict(atol=1e-9, rtol=1e-9, max_steps=16384)
    if case == "exact":
        flow = CNF(3, exact=True, key=kf, **tols)
    elif case == "exact-cond":
        flow = CNF(3, 2, exact=True, key=kf, **tols)
        c = jax.random.normal(kc, (2,), dtype=jnp.float64)
    elif case == "exact-bcond":
        # batched context (round 5): the per-row folded bias rides the
        # adjoint; the context gradient comes back per row
        flow = CNF(3, 2, exact=True, key=kf, **tols)
        c = jax.random.normal(kc, (3, 2), dtype=jnp.float64)
    else:
        flow = CNF(3, exact=False, key=kf, **tols)
        hk = kh

    assert type(flow(c, key=hk) if hk is not None else flow(c)) is (
        FusedContinuousFlow
    )
    params, loss_fused, loss_xla = _cnf_rkl_loss_pair(flow, c, hk, kk)
    params = _cast_params(params, jnp.float64)

    l1, g1 = jax.value_and_grad(loss_xla)(params)
    l2, g2 = jax.value_and_grad(loss_fused)(params)
    assert jnp.abs(l1 - l2) < 1e-9
    tol = 5e-4 if case == "hutch" else 2e-4  # Hutchinson: noisier trace term
    for (n, a), (_, b) in zip(named_parameters(g1), named_parameters(g2)):
        assert jnp.allclose(a, b, atol=tol), (n, jnp.abs(a - b).max())


def test_cnf_rsample_gradients_f32(key, dispatch_on):
    r"""f32 gradient regression through the dispatch (the silent-zero-grad
    hazard class): CNF continuous-adjoint grads at default tolerances must
    be finite, non-zero, and close to the XLA discrete adjoint."""
    from zuko_tpu.flows import CNF

    kf, kk = jax.random.split(key)
    flow = CNF(3, exact=True, key=kf)
    params, loss_fused, loss_xla = _cnf_rkl_loss_pair(flow, None, None, kk)
    params = _cast_params(params, jnp.float32)

    g1 = jax.grad(loss_xla)(params)
    g2 = jax.grad(loss_fused)(params)
    total = 0.0
    for (n, a), (_, b) in zip(named_parameters(g1), named_parameters(g2)):
        assert jnp.all(jnp.isfinite(b)), n
        scale = jnp.abs(a).max() + 1e-3
        assert jnp.abs(a - b).max() / scale < 5e-2, (n, jnp.abs(a - b).max())
        total += float(jnp.sum(jnp.abs(b)))
    assert total > 1e-3  # gradients actually flow


def test_cnf_rsample_reint_gate_poisons(key, dispatch_on, monkeypatch):
    r"""The continuous-adjoint solve-consistency gate: when the backward's
    re-integrated endpoint x(1) misses the saved base draw z (stiff /
    non-reversible dynamics), gradients must NaN-poison LOUDLY rather than
    silently return garbage (the ift._SOLVE_ATOL analog). Forced here by
    shrinking the gate tolerance below solver roundoff."""
    from zuko_tpu.flows import CNF
    from zuko_tpu.ops import cnf_fused

    kf, kk = jax.random.split(key)
    flow = CNF(3, exact=True, key=kf)
    params, loss_fused, _ = _cnf_rkl_loss_pair(flow, None, None, kk)
    params = _cast_params(params, jnp.float32)

    g = jax.grad(loss_fused)(params)  # healthy: gate passes
    for n, a in named_parameters(g):
        assert jnp.all(jnp.isfinite(a)), n

    monkeypatch.setattr(cnf_fused, "_REINT_ATOL", -1.0)
    g = jax.grad(loss_fused)(params)
    leaves = [a for _, a in named_parameters(g)]
    assert any(bool(jnp.any(jnp.isnan(a))) for a in leaves)


def test_cnf_rsample_budget_exhaustion_poisons_grads(key, dispatch_on):
    r"""Exhausting the integrator's accepted-step budget NaN-poisons through
    the continuous-adjoint custom VJP too — the forward sample is already
    NaN and the backward must not launder it into finite gradients."""
    from zuko_tpu.flows import CNF

    kf, kk = jax.random.split(key)
    flow = CNF(3, exact=True, max_steps=2, atol=1e-12, rtol=1e-12, key=kf)
    params, loss_fused, _ = _cnf_rkl_loss_pair(flow, None, None, kk)
    params = _cast_params(params, jnp.float32)

    val, g = jax.value_and_grad(loss_fused)(params)
    assert bool(jnp.isnan(val))
    leaves = [a for _, a in named_parameters(g)]
    assert any(bool(jnp.any(jnp.isnan(a))) for a in leaves)


def test_gf_saturated_ladj_stays_finite(key, dispatch_on):
    r"""The GF init-fragility fix (round 4): wherever EVERY erf-mixture
    component saturates, the naive ladj inner sum underflows to 0 in f32
    and log(0) = -inf blew up training (PARITY.md: 1/6 digits seeds
    diverging at step 3-5 on both sides; reference shares the mechanism,
    zuko/transforms.py:869-875). The log-sum-exp analytic form — XLA path
    (GaussianizationTransform.call_and_ladj) and fused kernel
    (gf_fused._gauss_mean_F) — must stay finite with finite gradients, and
    match the jvp form where it does not underflow."""
    from zuko_tpu.ops.gf_fused import _gauss_forward_F
    from zuko_tpu.transforms import GaussianizationTransform

    # saturated: all components centered 50 sigma away
    shift = jnp.full((8,), 50.0, jnp.float32)
    logsc = jnp.zeros((8,), jnp.float32)
    t = GaussianizationTransform(shift, logsc)
    x = jnp.asarray(0.0, jnp.float32)
    y, ladj = t.call_and_ladj(x)
    assert bool(jnp.isfinite(y)) and bool(jnp.isfinite(ladj))
    _, dy = jax.jvp(t.f, (x,), (jnp.ones_like(x),))
    assert bool(jnp.log(dy) == -jnp.inf)  # the jvp form does underflow

    def loss(sh):
        tt = GaussianizationTransform(sh, logsc)
        yy, ll = tt.call_and_ladj(x)
        return yy + ll

    g = jax.grad(loss)(shift)
    assert bool(jnp.all(jnp.isfinite(g)))

    # fused kernel math: same stable form, finite at the same point
    yF, lF = _gauss_forward_F(
        jnp.zeros((1, 4), jnp.float32), shift[None, :],
        jnp.exp(logsc)[None, :], 8,
    )
    assert bool(jnp.all(jnp.isfinite(lF)))
    # in-kernel erf/erfinv approximations; the y^2/2 term amplifies their
    # gap at this extreme saturation point (|ladj| ~ 1238) — finiteness and
    # sub-0.02% relative agreement are the contract here
    assert jnp.allclose(lF[0, 0], ladj, rtol=2e-4)

    # healthy regime: analytic == jvp (f64)
    kf = jax.random.split(key, 2)
    sh = jax.random.normal(kf[0], (5, 8), jnp.float64)
    sc = jax.random.normal(kf[1], (5, 8), jnp.float64) * 0.5
    t2 = GaussianizationTransform(sh, sc)
    x2 = jnp.linspace(-3.0, 3.0, 5)
    y2, l2 = t2.call_and_ladj(x2)
    y3, dy3 = jax.jvp(t2.f, (x2,), (jnp.ones_like(x2),))
    assert jnp.allclose(y2, y3, atol=0.0)
    assert jnp.allclose(l2, jnp.log(dy3), atol=1e-12)


@pytest.mark.parametrize("case", ["exact", "exact-cond", "exact-bcond", "hutch"])
def test_cnf_tile_adjoint_matches_xla_backward(case, key, dispatch_on):
    r"""The IN-KERNEL continuous adjoint (`_cnf_tile_adjoint`, the TPU
    backward of fused_cnf_rsample) integrates the same (u, a, g_theta)
    system as the XLA odeint fallback: with one tile holding the batch at
    tight tolerances the two backends' cotangents coincide (1e-10 for the
    unconditional/Hutchinson cases; the conditional case differs only
    through the step-size controllers' accepted sequences — solver
    tolerance, 1e-5)."""
    from zuko_tpu.flows import CNF
    from zuko_tpu.ops import cnf_fused as cf

    kf, kc, kh, kk = jax.random.split(key, 4)
    c, hk = None, None
    tols = dict(atol=1e-9, rtol=1e-9, max_steps=16384)
    if case == "exact":
        flow = CNF(3, exact=True, key=kf, **tols)
    elif case == "exact-cond":
        flow = CNF(3, 2, exact=True, key=kf, **tols)
        c = jax.random.normal(kc, (2,), dtype=jnp.float64)
    elif case == "exact-bcond":
        flow = CNF(3, 2, exact=True, key=kf, **tols)
        c = jax.random.normal(kc, (2, 2), dtype=jnp.float64)
    else:
        flow = CNF(3, exact=False, key=kf, **tols)
        hk = kh
    flow = _cast_params_module(flow, jnp.float64)

    transform = flow.transform(c) if hk is None else flow.transform(c, key=hk)
    static, z, eps, c_phi, flat = cf._prep_cnf_sample(
        flow, transform, kk, (8,), c, True
    )
    cfg = static.cfg
    x, lq = cf._cnf_sample_impl(static, z, eps, c_phi, *flat)
    gx = jax.random.normal(jax.random.PRNGKey(9), x.shape, x.dtype)
    glq = jax.random.normal(jax.random.PRNGKey(10), lq.shape, lq.dtype)

    outs_xla = cf._cnf_sample_bwd(static, (z, eps, c_phi, flat, x), (gx, glq))

    F = cfg["F"]
    nw = len(flat) // 2
    ws = [flat[2 * i] for i in range(nw)]
    bs = [flat[2 * i + 1] for i in range(nw)]
    params = cf._kernel_params(ws, bs, c_phi, cfg)
    epsT = None if cfg["exact"] else eps.reshape(-1, F).T
    bc = params[2].ndim > 1
    if bc:  # batched context: per-row folded bias in the adjoint theta
        H = params[2].shape[-1]
        b1_rows = jnp.broadcast_to(
            params[2], z.shape[:-1] + (H,)
        ).reshape(-1, H)
        params = params[:2] + [b1_rows.T] + params[3:]
        cfg = {**cfg, "bc": H}
    u1, a1, gth = cf._cnf_tile_adjoint(
        x.reshape(-1, F).T, gx.reshape(-1, F).T,
        glq.reshape(1, -1), epsT, params, cfg, True,
    )
    gW1_x, gW1_te = gth[0], gth[1]
    W1_c = flat[0][:, 2 * cfg["nf"] + F :]
    if bc:
        gb1_rows = gth[2].T                       # (n, H)
        gb1 = jnp.sum(gb1_rows, axis=0)
        c_rows = jnp.broadcast_to(
            c_phi, z.shape[:-1] + c_phi.shape[-1:]
        ).reshape(-1, c_phi.shape[-1])
        cols = [gW1_te, gW1_x, gb1_rows.T @ c_rows]
        gc = (gb1_rows @ W1_c).reshape(z.shape[:-1] + c_phi.shape[-1:])
        gc = jnp.sum(gc, axis=0)                  # reduce the sample dim
    else:
        gb1 = gth[2]
        cols = [gW1_te, gW1_x]
        if cfg["C"]:
            cols.append(gb1[:, None] * c_phi[None, :])
            gc = W1_c.T @ gb1
    gW1 = jnp.concatenate(cols, axis=1)

    tol = 1e-5 if case in ("exact-cond", "exact-bcond") else 1e-10
    err = jnp.max(jnp.abs(u1.T - z.reshape(-1, F)), axis=-1)
    assert bool(jnp.all(err <= cf._REINT_ATOL))  # gate passes
    dz_tile = a1.T - glq.reshape(-1)[:, None] * z.reshape(-1, F)
    assert jnp.allclose(dz_tile, outs_xla[0].reshape(-1, F), atol=tol)
    assert jnp.allclose(gW1, outs_xla[3], atol=tol)
    assert jnp.allclose(gb1, outs_xla[4], atol=tol)
    assert jnp.allclose(gth[3], outs_xla[5], atol=tol)
    if cfg["C"]:
        assert jnp.allclose(gc, outs_xla[2], atol=tol)


def _cast_params_module(flow, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        flow,
    )


def test_fused_sampling_batched_context(key, dispatch_on):
    r"""Batched-context sampling through the fused tier: ``flow(c)`` with
    ``c`` of shape (B, ctx) must sample with torch/XLA semantics
    ``sample_shape + (B,) + event`` and match the XLA path row-for-row
    (the old prep broadcast either crashed at sample_shape=() or, when
    B == S, silently returned one draw per row at the WRONG shape)."""
    import os

    from zuko_tpu.flows import MAF, NAF, NSF

    def xla(fn):
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
        try:
            return fn()
        finally:
            os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

    kf, ks = jax.random.split(key)
    # the full shape sweep runs on NSF; MAF/NAF (different prep paths)
    # cover one shape each — every (family x shape) combination compiles
    # 4 programs, and the full cross product made this the battery's
    # slowest test (round-5 wall-clock audit)
    for name, flow, shapes in [
        ("NSF", NSF(3, 2, transforms=2, hidden_features=(8, 8), key=kf),
         [(5, ()), (5, (4,)), (5, (2, 3))]),
        ("MAF", MAF(3, 2, transforms=2, hidden_features=(8, 8), key=kf),
         [(5, (4,))]),
        ("NAF", NAF(3, 2, transforms=2, signal=6, key=kf), [(5, (4,))]),
    ]:
        for B, sshape in shapes:
            c = jax.random.normal(jax.random.key(7), (B, 2))
            d = flow(c)
            x = d.sample(ks, sshape)
            want = tuple(sshape) + (B, 3)
            assert x.shape == want, (name, B, sshape, x.shape)
            x_ref = xla(lambda: flow(c).sample(ks, sshape))
            assert jnp.allclose(x, x_ref, atol=1e-5), (
                name, B, sshape, float(jnp.abs(x - x_ref).max()))
            xs, lq = d.sample_and_log_prob(ks, sshape)
            assert xs.shape == want and lq.shape == want[:-1], name
            lp = xla(lambda: flow(c).log_prob(xs))
            assert jnp.allclose(lq, lp, atol=1e-5), name

    # IFT rsample gradients with batched context match the XLA adjoint
    from zuko_tpu.core import combine, partition

    flow = NSF(3, 2, transforms=2, hidden_features=(8, 8), key=kf)
    params, static = partition(flow)
    c = jax.random.normal(jax.random.key(8), (6, 2))

    def loss(p):
        xs, lq = combine(p, static)(c).rsample_and_log_prob(ks, ())
        return jnp.sum(xs**2) + jnp.sum(lq)

    g1 = jax.grad(loss)(params)
    g2 = xla(lambda: jax.grad(loss)(params))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        assert jnp.max(jnp.abs(a - b) / (1.0 + jnp.abs(b))) < 1e-5
