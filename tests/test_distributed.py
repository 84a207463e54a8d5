r"""Two-process CPU smoke test for the multi-host launch path.

The reference has no multi-process tier; this validates the new
``distributed_init`` wrapper (zuko_tpu/parallel/mesh.py) end-to-end: two real
processes rendezvous at a coordinator, see each other's virtual devices, build
a global mesh, and agree on a broadcast value.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    sys.path.insert(0, {repo!r})
    from zuko_tpu.parallel import distributed_init, make_mesh

    pid = int(sys.argv[1])
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

    print("WORKER_OK", pid)
""")


@pytest.mark.skipif(
    os.environ.get("ZUKO_TPU_SKIP_MULTIPROC") == "1",
    reason="multi-process smoke test disabled",
)
def test_two_process_cpu_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=os.path.dirname(os.path.dirname(__file__))))

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
