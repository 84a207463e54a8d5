r"""Two-process CPU tests for the multi-host launch path.

The reference has no multi-process tier; this validates the new
``distributed_init`` wrapper (zuko_tpu/parallel/mesh.py) end-to-end: two real
processes rendezvous at a coordinator, see each other's virtual devices, build
a global mesh, and compute an MLE loss and gradient over the global ``data``
axis. Numerical contract, the closest a single host gets to multi-host
confidence ahead of real pod time:

* the two processes bit-match EACH OTHER on the production (psum) path;
* every per-device partial loss/grad shard bit-matches the single-process
  8-device run of the same program (the collective's operands are identical —
  only the all-reduce's association order is runtime-dependent, Gloo
  cross-process vs in-process XLA, measured 1 ulp apart);
* the fixed-order host reduction of those shards bit-matches exactly, and
  the production psum value agrees with it to a few ulp.
"""

import hashlib
import math
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

# The shard_map program both sides run: per-device partial loss (local
# sum of -log_prob, scaled by the GLOBAL row count) and its gradient,
# WITHOUT any collective — reductions happen in fixed order afterwards.
_COMMON = textwrap.dedent("""
    import hashlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jax.sharding import PartitionSpec as P

    from zuko_tpu.core import combine, partition
    from zuko_tpu.flows import NSF

    N_ROWS = 64

    def build():
        flow = NSF(3, 0, transforms=2, hidden_features=(16, 16),
                   key=jax.random.PRNGKey(0))
        params, static = partition(flow)
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (N_ROWS, 3)))
        return params, static, x

    def make_partial_fn(mesh, static):
        def body(params, x):
            def local_loss(p):
                return -jnp.sum(combine(p, static)(None).log_prob(x)) / N_ROWS

            l, g = jax.value_and_grad(local_loss)(params)
            return l[None], jax.tree_util.tree_map(lambda a: a[None], g)

        return jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P("data")),
            out_specs=(P("data"), P("data")), check_vma=False,
        ))

    def make_psum_fn(mesh, static):
        def loss_fn(params, x):
            return -jnp.mean(combine(params, static)(None).log_prob(x))

        return jax.jit(jax.value_and_grad(loss_fn))

    def digest(arrays):
        h = hashlib.sha256()
        for a in arrays:
            h.update(np.ascontiguousarray(a).tobytes())
        return h.hexdigest()
""")

_WORKER = _COMMON + textwrap.dedent("""
    import os, sys

    pid = int(sys.argv[1])

    from zuko_tpu.parallel import distributed_init, make_mesh

    info = distributed_init("localhost:" + sys.argv[2], 2, pid)
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 8, info

    # idempotent second call
    info2 = distributed_init()
    assert info2 == info, (info, info2)

    from jax.experimental import multihost_utils

    val = multihost_utils.broadcast_one_to_all(jnp.asarray(100 + pid))
    assert int(val) == 100, val  # everyone sees process 0's value

    mesh = make_mesh(model=1)
    assert mesh.shape["data"] == 8, mesh

    params, static, x = build()
    local = x[pid * 32:(pid + 1) * 32]
    with mesh:
        xg = multihost_utils.host_local_array_to_global_array(
            local, mesh, P("data")
        )
        pg = multihost_utils.host_local_array_to_global_array(params, mesh, P())

    def to_host(a):
        # this process's rows of a P("data")-sharded array, global order
        shards = sorted(a.addressable_shards, key=lambda s: s.index[0].start)
        local = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        # gather the other process's rows (process order == device order)
        full = np.asarray(multihost_utils.process_allgather(local))
        return full.reshape((-1,) + local.shape[1:])

    # per-device partials: bit-comparable to the single-process run
    pl, pgrads = make_partial_fn(mesh, static)(pg, xg)
    pl = to_host(pl)
    leaves = [to_host(g) for g in jax.tree_util.tree_leaves(pgrads)]
    print("PARTIALS", digest([pl] + leaves))
    print("SUMLOSS", float(np.sum(pl, axis=0)).hex())
    print("SUMGRADS", digest([np.sum(g, axis=0) for g in leaves]))

    # production path (jnp.mean + autodiff psum): processes must agree
    loss, grads = make_psum_fn(mesh, static)(pg, xg)
    loss = float(jax.device_get(loss.addressable_data(0)))
    gl = [np.asarray(jax.device_get(g.addressable_data(0)))
          for g in jax.tree_util.tree_leaves(grads)]
    print("PSUMLOSS", loss.hex())
    print("PSUMGRADS", digest(gl))
    print("WORKER_OK", pid)
""")


def _single_process_reference():
    """The same partial-shard program on this process's own 8-device mesh."""
    import jax

    from zuko_tpu.parallel import make_mesh, replicate, shard_batch

    ns = {}
    exec(_COMMON, ns)  # the identical program text the workers run

    params, static, x = ns["build"]()
    mesh = make_mesh(model=1)
    xg = shard_batch(mesh, x)
    pg = replicate(mesh, params)

    pl, pgrads = ns["make_partial_fn"](mesh, static)(pg, xg)
    pl = np.asarray(pl)
    leaves = [np.asarray(g) for g in jax.tree_util.tree_leaves(pgrads)]
    digest = ns["digest"]
    loss, _ = ns["make_psum_fn"](mesh, static)(pg, xg)
    return {
        "PARTIALS": digest([pl] + leaves),
        "SUMLOSS": float(np.sum(pl, axis=0)).hex(),
        "SUMGRADS": digest([np.sum(g, axis=0) for g in leaves]),
        "PSUMLOSS": float(loss),
    }


@pytest.mark.skipif(
    os.environ.get("ZUKO_TPU_SKIP_MULTIPROC") == "1",
    reason="multi-process smoke test disabled",
)
def test_two_process_cpu_matches_single_process(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    boilerplate = textwrap.dedent("""
        import os, sys

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

        sys.path.insert(0, {repo!r})
    """).format(repo=os.path.dirname(os.path.dirname(__file__)))
    script.write_text(boilerplate + _WORKER)

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out, out

    def field(out, tag):
        return [ln.split()[1] for ln in out.splitlines()
                if ln.startswith(tag + " ")][0]

    # the two processes must bit-match each other on EVERY quantity,
    # including the production psum path
    for tag in ("PARTIALS", "SUMLOSS", "SUMGRADS", "PSUMLOSS", "PSUMGRADS"):
        assert field(outs[0], tag) == field(outs[1], tag), tag

    ref = _single_process_reference()

    # per-device partial losses and grads bit-match the single-process run,
    # and so do their fixed-order host reductions
    assert field(outs[0], "PARTIALS") == ref["PARTIALS"]
    assert field(outs[0], "SUMLOSS") == ref["SUMLOSS"]
    assert field(outs[0], "SUMGRADS") == ref["SUMGRADS"]

    # the production psum loss agrees with the single-process value to a
    # few ulp (the all-reduce association order is runtime-dependent:
    # Gloo cross-process vs in-process XLA)
    got = float.fromhex(field(outs[0], "PSUMLOSS"))
    assert abs(got - ref["PSUMLOSS"]) <= 4 * math.ulp(ref["PSUMLOSS"]), (
        got, ref["PSUMLOSS"],
    )
