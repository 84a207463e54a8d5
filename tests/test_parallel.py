r"""Tests for the mesh/sharding layer on 8 virtual CPU devices.

The reference has no distributed tier; this validates the new TPU-native
design's correctness contract: sharded computation == single-device
computation (SURVEY §4 plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NAF, NSF
from zuko_tpu.parallel import (
    make_mesh,
    make_mle_step,
    shard_batch,
    shard_module,
    tensor_parallel_spec,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _flow(key):
    return NSF(4, 0, transforms=2, hidden_features=(16, 16), key=key)


def test_sharded_log_prob_matches(key):
    flow = _flow(key)
    x = jax.random.normal(key, (64, 4))

    lp_ref = flow(None).log_prob(x)

    mesh = make_mesh(model=1)
    with mesh:
        flow_s = shard_module(mesh, flow)
        xs = shard_batch(mesh, x)
        params, static = partition(flow_s)

        @jax.jit
        def log_prob(p, x):
            return combine(p, static)(None).log_prob(x)

        lp = log_prob(params, xs)

    assert jnp.allclose(lp, lp_ref, atol=1e-10)


def test_sharded_grads_match(key):
    flow = _flow(key)
    x = jax.random.normal(key, (64, 4))

    params, static = partition(flow)

    def loss(p, x):
        return -jnp.mean(combine(p, static)(None).log_prob(x))

    g_ref = jax.grad(loss)(params, x)

    mesh = make_mesh(model=1)
    with mesh:
        flow_s = shard_module(mesh, flow)
        ps, ss = partition(flow_s)

        def loss_s(p, x):
            return -jnp.mean(combine(p, ss)(None).log_prob(x))

        g = jax.jit(jax.grad(loss_s))(ps, shard_batch(mesh, x))

    ref_leaves = jax.tree_util.tree_leaves(g_ref)
    s_leaves = jax.tree_util.tree_leaves(g)
    for a, b in zip(ref_leaves, s_leaves):
        assert jnp.allclose(a, b, atol=1e-8)


def test_data_model_mesh_train_step(key):
    mesh = make_mesh(model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2

    with mesh:
        naf = NAF(4, 0, transforms=2, signal=4, hidden_features=(8, 8), key=key)
        specs = tensor_parallel_spec(naf)
        assert any("weight" in k for k in specs)
        naf = shard_module(mesh, naf, specs)
        params, static = partition(naf)

        init_fn, step_fn = make_mle_step(static, lr=1e-3)
        state = init_fn(params)
        x = shard_batch(mesh, jax.random.normal(key, (32, 4)))
        state, loss = step_fn(state, x, None)
        assert jnp.isfinite(loss)


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip, entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert jnp.isfinite(out)

    dryrun_multichip(8)


def test_sharded_fused_log_prob(key):
    from zuko_tpu.parallel import sharded_fused_log_prob

    flow = _flow(key)
    x = jax.random.normal(key, (64, 4))
    lp_ref = flow(None).log_prob(x)

    mesh = make_mesh(model=1)
    with mesh:
        xs = shard_batch(mesh, x)
        lp = sharded_fused_log_prob(mesh, flow, xs)
    assert jnp.allclose(lp, lp_ref, atol=1e-5)

    # conditional
    from zuko_tpu.flows import NSF

    cflow = NSF(3, 5, transforms=2, hidden_features=(16, 16), key=key)
    c = jax.random.normal(key, (64, 5))
    x3 = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    lp_ref = cflow(c).log_prob(x3)
    with mesh:
        lp = sharded_fused_log_prob(
            mesh, cflow, shard_batch(mesh, x3), shard_batch(mesh, c)
        )
    assert jnp.allclose(lp, lp_ref, atol=1e-5)


def test_sharded_fused_sample(key):
    r"""Sample-parallel fused sampling over the data axis: correct shapes,
    deterministic for a fixed key, and the fused ``log q`` equals the flow's
    own density at the drawn points."""
    from zuko_tpu.parallel import sharded_fused_sample

    flow = _flow(key)
    mesh = make_mesh(model=1)

    x = sharded_fused_sample(mesh, flow, jax.random.PRNGKey(3), (64,))
    assert x.shape == (64, 4)
    assert jnp.all(jnp.isfinite(x))
    x_again = sharded_fused_sample(mesh, flow, jax.random.PRNGKey(3), (64,))
    assert jnp.array_equal(x, x_again)

    x2, lp = sharded_fused_sample(
        mesh, flow, jax.random.PRNGKey(3), (64,), want_log_prob=True
    )
    assert x2.shape == (64, 4) and lp.shape == (64,)
    assert jnp.allclose(lp, flow(None).log_prob(x2), atol=1e-5)


def test_sharded_train_mle_matches(key):
    r"""train_mle with a mesh shards every minibatch over the data axis (real
    DP, VERDICT round-1 item 3); the loss trajectory must match the
    single-device run."""
    from zuko_tpu.parallel import train_mle

    x = np.asarray(jax.random.normal(key, (256, 4)))
    flow = _flow(key)
    _, losses_ref = train_mle(
        flow, x, epochs=2, batch_size=32, lr=1e-2, key=key
    )

    mesh = make_mesh(model=1)
    flow2 = _flow(key)
    metrics = []
    _, losses = train_mle(
        flow2, x, epochs=2, batch_size=32, lr=1e-2, key=key,
        mesh=mesh, callback=metrics.append,
    )
    assert np.allclose(losses, losses_ref, atol=1e-8), (losses, losses_ref)

    # metrics hooks: one dict per optimizer step with the advertised keys
    assert len(metrics) == 2 * (256 // 32)
    for m in metrics:
        assert {"step", "epoch", "loss", "grad_norm", "examples_per_s"} <= set(m)
        assert np.isfinite(m["loss"]) and np.isfinite(m["grad_norm"])


def test_sharded_fused_on_model_axis_mesh(key):
    r"""The sharded fused tier works on a 2-axis (data, model) mesh: sampling
    and density shard over ``data`` and replicate over ``model``. Also a
    regression gate for the eagerly-executed shard_map pathology (the body
    ran op by op across the mesh, ~100x slower than jitted)."""
    import time

    from zuko_tpu.parallel import sharded_fused_log_prob, sharded_fused_sample

    flow = _flow(key)
    mesh = make_mesh(model=2)

    t0 = time.time()
    with mesh:
        x, lq = sharded_fused_sample(
            mesh, flow, jax.random.PRNGKey(5), (32,), want_log_prob=True
        )
        lp = sharded_fused_log_prob(mesh, flow, x)
        jax.block_until_ready(lp)
    assert time.time() - t0 < 120, "sharded fused tier pathologically slow"
    assert x.shape == (32, 4) and lp.shape == (32,)
    assert jnp.allclose(lq, lp, atol=1e-6)
    assert jnp.allclose(lp, flow(None).log_prob(x), atol=1e-6)


@pytest.mark.parametrize("family", ["gf", "cnf", "naf"])
def test_sharded_fused_sample_families(family, key):
    r"""Sample-parallel fused sampling covers the whole fused-sampler zoo:
    the sharded draw equals running the same fused sampler per device shard
    (deterministic fold_in keys), and densities at the draws are finite."""
    import jax.tree_util as jtu

    from zuko_tpu.core import combine, partition
    from zuko_tpu.flows import CNF, GF, NAF
    from zuko_tpu.parallel import sharded_fused_sample

    if family == "gf":
        flow = GF(3, transforms=2, key=key)
        p, st = partition(flow)
        flow = combine(jtu.tree_map(lambda a: a * 0.3, p), st)
    elif family == "cnf":
        flow = CNF(3, key=key)
    else:
        flow = NAF(3, transforms=2, signal=4, key=key)

    mesh = make_mesh(model=1)
    x = sharded_fused_sample(mesh, flow, jax.random.PRNGKey(3), (32,))
    assert x.shape == (32, 3)
    assert jnp.all(jnp.isfinite(x))
    x2 = sharded_fused_sample(mesh, flow, jax.random.PRNGKey(3), (32,))
    assert jnp.array_equal(x, x2)
    assert jnp.all(jnp.isfinite(flow(None).log_prob(x)))

    x3, lq = sharded_fused_sample(
        mesh, flow, jax.random.PRNGKey(3), (32,), want_log_prob=True
    )
    assert x3.shape == (32, 3) and lq.shape == (32,)
    assert jnp.all(jnp.isfinite(lq))


@pytest.mark.parametrize("family", ["nsf", "gf"])
def test_sharded_fused_sample_batched_context(family, key):
    r"""Context-sharded fused sampling (round 5): with a batched context
    (B, ctx) the CONTEXT batch shards over ``data`` and each device draws
    the full sample_shape for its rows. Shapes follow the single-device
    fused semantics (sample_shape + (B,) + event), draws are deterministic,
    and log q equals the flow's own density at the drawn points."""
    import jax.tree_util as jtu

    from zuko_tpu.core import combine, partition
    from zuko_tpu.flows import GF, NSF
    from zuko_tpu.parallel import sharded_fused_sample

    if family == "nsf":
        flow = NSF(3, 2, transforms=2, hidden_features=(8, 8), key=key)
    else:
        flow = GF(3, 2, transforms=2, key=key)
        p, st = partition(flow)
        flow = combine(jtu.tree_map(lambda a: a * 0.3, p), st)

    mesh = make_mesh(model=1)
    B = 16  # divides the 8-device data axis
    c = jax.random.normal(jax.random.PRNGKey(7), (B, 2))

    x, lq = sharded_fused_sample(
        mesh, flow, jax.random.PRNGKey(3), (5,), c=c, want_log_prob=True
    )
    assert x.shape == (5, B, 3) and lq.shape == (5, B)
    assert jnp.all(jnp.isfinite(x))
    assert jnp.allclose(lq, flow(c).log_prob(x), atol=1e-4)

    # deterministic plain-vs-plain (the want_log_prob solve runs a
    # different precision mode in f32, so slp-vs-plain is close, not
    # bitwise)
    x2 = sharded_fused_sample(mesh, flow, jax.random.PRNGKey(3), (5,), c=c)
    x2b = sharded_fused_sample(mesh, flow, jax.random.PRNGKey(3), (5,), c=c)
    assert jnp.array_equal(x2, x2b)
    assert jnp.allclose(x, x2, atol=1e-4)

    # sample_shape=() serving form: one draw per context row
    x3 = sharded_fused_sample(mesh, flow, jax.random.PRNGKey(4), (), c=c)
    assert x3.shape == (B, 3)

    # >2 context batch dims: loud guidance, not an opaque reshape error
    with pytest.raises(NotImplementedError, match="flatten"):
        sharded_fused_sample(
            mesh, flow, jax.random.PRNGKey(3), (5,),
            c=jnp.ones((2, 8, 2)),
        )


@pytest.mark.parametrize("family", ["nice", "gf", "cnf", "naf"])
def test_sharded_fused_density_families(family, key):
    r"""The sharded fused density dispatches by structure exactly like the
    single-chip tier (VERDICT r2 item 3): every fused family's log_prob is
    available under shard_map and equals the single-device value."""
    import jax.tree_util as jtu

    from zuko_tpu.flows import CNF, GF, NAF, NICE
    from zuko_tpu.parallel import sharded_fused_log_prob

    if family == "nice":
        flow = NICE(4, 0, transforms=2, hidden_features=(16, 16), key=key)
    elif family == "gf":
        flow = GF(4, transforms=2, key=key)
        p, st = partition(flow)
        flow = combine(jtu.tree_map(lambda a: a * 0.3, p), st)
    elif family == "cnf":
        flow = CNF(4, key=key)
    else:
        flow = NAF(4, 0, transforms=2, signal=4, key=key)

    x = jax.random.normal(key, (64, 4))
    lp_ref = flow(None).log_prob(x)

    mesh = make_mesh(model=1)
    with mesh:
        lp = sharded_fused_log_prob(mesh, flow, shard_batch(mesh, x))
    atol = 1e-3 if family == "cnf" else 1e-5  # CNF: adaptive-step tolerance
    assert lp.shape == lp_ref.shape
    assert jnp.allclose(lp, lp_ref, atol=atol), jnp.abs(lp - lp_ref).max()


def test_sharded_fused_naf_sample_and_log_prob(key):
    r"""NAF/UNAF sharded sampling now carries the fused log q (the stale
    sample-only refusal was removed — the kernel grew analytic-forward
    log q in round 2)."""
    from zuko_tpu.parallel import sharded_fused_sample

    flow = NAF(3, 0, transforms=2, signal=4, key=key)
    mesh = make_mesh(model=1)
    x, lq = sharded_fused_sample(
        mesh, flow, jax.random.PRNGKey(3), (32,), want_log_prob=True
    )
    assert x.shape == (32, 3) and lq.shape == (32,)
    assert jnp.allclose(lq, flow(None).log_prob(x), atol=1e-4)


def test_sharded_reverse_kl_matches(key):
    r"""The sample-axis-sharded VI step (make_reverse_kl_step(mesh=...))
    produces the SAME loss and the SAME post-step parameters as the
    single-device computation over the identical global draw set
    (mirror of the MLE test above; VERDICT r2 item 4)."""
    import optax

    from zuko_tpu.parallel.train import make_reverse_kl_step

    mesh = make_mesh(model=1)
    n_dev = mesh.shape["data"]
    n_samples = 64
    local_n = n_samples // n_dev

    flow = _flow(key)
    params, static = partition(flow)

    def log_energy(x):
        r = jnp.linalg.norm(x, axis=-1)
        return -((r - 1.5) ** 2) / 0.5

    # single-device equivalent: the same per-device fold_in draw set
    def loss_single(p, k):
        model = combine(p, static)
        xs, lqs = [], []
        for idx in range(n_dev):
            x, lq = model(None).rsample_and_log_prob(
                jax.random.fold_in(k, idx), (local_n,)
            )
            xs.append(x)
            lqs.append(lq)
        x = jnp.concatenate(xs)
        lq = jnp.concatenate(lqs)
        return jnp.mean(lq) - jnp.mean(log_energy(x))

    k0 = jax.random.PRNGKey(11)
    loss_ref, g_ref = jax.value_and_grad(loss_single)(params, k0)

    init_fn, step_fn = make_reverse_kl_step(
        static, log_energy, n_samples=n_samples, mesh=mesh,
        optimizer=optax.sgd(1e-2),
    )
    # the step DONATES its state — feed it copies so `params` stays alive
    state = init_fn(jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True), params
    ))
    state, loss = step_fn(state, k0)

    assert jnp.allclose(loss, loss_ref, atol=1e-6), (loss, loss_ref)
    # post-SGD params pin the gradients: p' = p - lr * g
    new_leaves = jax.tree_util.tree_leaves(state.params)
    old_leaves = jax.tree_util.tree_leaves(params)
    ref_leaves = jax.tree_util.tree_leaves(g_ref)
    for new, old, gr in zip(new_leaves, old_leaves, ref_leaves):
        assert jnp.allclose(new, old - 1e-2 * gr, atol=1e-6)


def test_tensor_parallel_megatron_specs(key):
    r"""tensor_parallel_spec emits Megatron column/row splits for hyper-MLP
    hidden layers (docstring promise, VERDICT r2 weak item 2) and the
    TP-sharded density/gradients equal the single-device values."""
    from jax.sharding import PartitionSpec as P

    flow = NSF(4, 0, transforms=2, hidden_features=(16, 16), key=key)
    specs = tensor_parallel_spec(flow, model=2)

    col = [k for k, s in specs.items() if s == P("model", None)]
    row = [k for k, s in specs.items() if s == P(None, "model")]
    assert col and row, specs
    # masks shard alongside MaskedLinear weights
    assert any(k.endswith(".mask") for k in col)
    # the final hyper layer stays replicated
    assert not any(".layers.4." in k for k in specs)

    x = jax.random.normal(key, (64, 4))
    params, static = partition(flow)

    def loss(p, x):
        return -jnp.mean(combine(p, static)(None).log_prob(x))

    l_ref, g_ref = jax.value_and_grad(loss)(params, x)

    mesh = make_mesh(model=2)
    with mesh:
        flow_s = shard_module(mesh, flow, specs)
        ps, ss = partition(flow_s)

        def loss_s(p, x):
            return -jnp.mean(combine(p, ss)(None).log_prob(x))

        l_s, g_s = jax.jit(jax.value_and_grad(loss_s))(
            ps, shard_batch(mesh, x)
        )

    assert jnp.allclose(l_s, l_ref, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_s)):
        assert jnp.allclose(a, b, atol=1e-6)


@pytest.mark.parametrize("family", ["naf", "gf"])
def test_sharded_reverse_kl_ift_families(family, key, monkeypatch):
    r"""The sample-axis-sharded VI step also runs the solver families'
    fused IFT rsample tier under shard_map (NAF: triangular IFT solves;
    GF: diagonal/orthogonal) — sharded loss and post-step params equal
    the single-device computation over the identical global draw set."""
    import optax

    from zuko_tpu.flows import GF
    from zuko_tpu.parallel.train import make_reverse_kl_step

    monkeypatch.setenv("ZUKO_TPU_FUSED_DISPATCH", "1")
    mesh = make_mesh(model=1)
    n_dev = mesh.shape["data"]
    n_samples = 32
    local_n = n_samples // n_dev

    if family == "naf":
        flow = NAF(3, 0, transforms=2, key=key)
    else:
        flow = GF(3, 0, transforms=2, key=key)
        # damp: random-init GF saturates (plateau ill-conditioning)
        flow = combine(
            jax.tree_util.tree_map(
                lambda a: a * 0.2 if hasattr(a, "dtype") else a,
                partition(flow)[0],
            ),
            partition(flow)[1],
        )
    params, static = partition(flow)

    def log_energy(x):
        r = jnp.linalg.norm(x, axis=-1)
        return -((r - 1.5) ** 2) / 0.5

    def loss_single(p, k):
        model = combine(p, static)
        xs, lqs = [], []
        for idx in range(n_dev):
            x, lq = model(None).rsample_and_log_prob(
                jax.random.fold_in(k, idx), (local_n,)
            )
            xs.append(x)
            lqs.append(lq)
        x = jnp.concatenate(xs)
        lq = jnp.concatenate(lqs)
        return jnp.mean(lq) - jnp.mean(log_energy(x))

    k0 = jax.random.PRNGKey(11)
    loss_ref, g_ref = jax.value_and_grad(loss_single)(params, k0)

    init_fn, step_fn = make_reverse_kl_step(
        static, log_energy, n_samples=n_samples, mesh=mesh,
        optimizer=optax.sgd(1e-2),
    )
    state = init_fn(jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True), params
    ))
    state, loss = step_fn(state, k0)

    assert jnp.allclose(loss, loss_ref, atol=1e-5), (loss, loss_ref)
    for new, old, gr in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(g_ref),
    ):
        assert jnp.allclose(new, old - 1e-2 * gr, atol=1e-5)


def test_sharded_serving_cache_survives_flow_rebuild(key, tmp_path):
    r"""The serving cache keys on STRUCTURE, not object identity: a server
    that reloads params and rebuilds the flow (serial.load_params pattern)
    must hit the already-compiled program instead of retracing per request
    (the 0.03M-rows/s failure mode). Probed by counting builds of the
    jitted shard_map program."""
    from zuko_tpu.parallel import mesh as meshmod
    from zuko_tpu.parallel import sharded_fused_log_prob
    from zuko_tpu.serial import load_params, save_params

    flow = _flow(key)
    x = jax.random.normal(key, (64, 4))
    lp_ref = flow(None).log_prob(x)

    builds = []
    orig = meshmod._sharded_log_prob_fn

    def counting(*a, **kw):
        builds.append(1)
        return orig(*a, **kw)

    meshmod._sharded_log_prob_fn = counting
    try:
        meshmod._SHARDED_FN_CACHE.clear()
        mesh = make_mesh(model=1)
        with mesh:
            xs = shard_batch(mesh, x)
            lp1 = sharded_fused_log_prob(mesh, flow, xs)

            # server restart pattern: save params, rebuild the flow object,
            # load params back — a DIFFERENT object, same structure
            save_params(tmp_path / "params.npz", flow)
            flow2 = load_params(_flow(key), tmp_path / "params.npz")
            assert flow2 is not flow
            lp2 = sharded_fused_log_prob(mesh, flow2, xs)
    finally:
        meshmod._sharded_log_prob_fn = orig

    assert jnp.allclose(lp1, lp_ref, atol=1e-5)
    assert jnp.allclose(lp2, lp_ref, atol=1e-5)
    assert len(builds) == 1, f"rebuilt flow retraced ({len(builds)} builds)"


def test_sharded_sampling_cache_and_no_retrace(key, tmp_path):
    r"""sharded_fused_sample rides the same structure-keyed program cache
    as the density path: params are jit ARGUMENTS (not closure constants),
    and a rebuilt flow (load_params pattern) reuses the compiled program.
    Values are unchanged vs the per-call form: deterministic for a given
    key and mesh shape."""
    from zuko_tpu.parallel import mesh as meshmod
    from zuko_tpu.parallel import sharded_fused_sample
    from zuko_tpu.serial import load_params, save_params

    flow = _flow(key)
    mesh = make_mesh(model=1)
    meshmod._SHARDED_FN_CACHE.clear()

    with mesh:
        x1, lp1 = sharded_fused_sample(
            mesh, flow, jax.random.PRNGKey(5), (64,), want_log_prob=True
        )
        assert x1.shape == (64, 4) and lp1.shape == (64,)
        # log q agrees with the flow's own density at the drawn points
        lp_ref = flow(None).log_prob(x1)
        assert jnp.allclose(lp1, lp_ref, atol=1e-4), (
            jnp.abs(lp1 - lp_ref).max()
        )

        size_before = len(meshmod._SHARDED_FN_CACHE)
        save_params(tmp_path / "p.npz", flow)
        flow2 = load_params(_flow(key), tmp_path / "p.npz")
        x2, lp2 = sharded_fused_sample(
            mesh, flow2, jax.random.PRNGKey(5), (64,), want_log_prob=True
        )
    assert jnp.allclose(x1, x2, atol=0.0)
    assert jnp.allclose(lp1, lp2, atol=0.0)
    # rebuilt flow hit the cached program: no new cache entry was created
    assert len(meshmod._SHARDED_FN_CACHE) == size_before
    # ... and no retrace INSIDE jit either: the rebuilt flow's params must
    # flatten to an EQUAL treedef (core._freeze decomposes partials by
    # value — identity-compared partials made every such call retrace)
    fns = [v for v in meshmod._SHARDED_FN_CACHE.values() if callable(v)]
    assert all(fn._cache_size() == 1 for fn in fns), [
        fn._cache_size() for fn in fns
    ]
