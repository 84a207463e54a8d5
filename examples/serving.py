r"""Production batch-scoring recipe: checkpoint -> mesh -> sharded fused
density evaluation.

The deployment story end-to-end: train a flow (here briefly, on the real
offline digits data), persist it with ``zuko_tpu.serial``, reload it in a
fresh "serving" step, lay a ``(data, model)`` mesh over the available
chips, and score a large dataset through the fused Pallas kernel under
``shard_map`` — each chip runs the whole-flow kernel on its shard of
rows and XLA handles the gather-free output layout. On one v5e chip the
fused density evaluates ~144M rows/s at D=6 and production batch (PERF.md); the mesh scales
rows across chips with no code change.

Run:  python examples/serving.py            (TPU or CPU)
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          JAX_PLATFORMS=cpu python examples/serving.py   (8-way CPU mesh)
"""

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")

import jax

# honor an explicit JAX_PLATFORMS request: this environment pre-imports
# jax from sitecustomize, which freezes platform selection before the env
# var can act — re-assert it so `JAX_PLATFORMS=cpu python examples/...`
# (the documented invocation) actually runs on CPU
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from zuko_tpu import serial
from zuko_tpu.data import digits_dataset
from zuko_tpu.flows import NSF
from zuko_tpu.parallel import make_mesh, sharded_fused_log_prob, train_mle


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--score-rows", type=int, default=1 << 16)
    args = parser.parse_args()

    train, _, test = digits_dataset()
    D = train.shape[1]

    # ---- "training job": fit and persist ----------------------------
    flow = NSF(D, transforms=3, hidden_features=(64, 64),
               key=jax.random.PRNGKey(0))
    flow, losses = train_mle(flow, train, epochs=args.epochs,
                             batch_size=256, key=jax.random.PRNGKey(1))
    ckpt = tempfile.mktemp(suffix=".zuko")
    serial.save(ckpt, flow)
    print(f"trained {args.epochs} epochs (final loss"
          f" {float(losses[-1]):.2f}); checkpoint -> {ckpt}")

    # ---- "serving job": reload, shard, score ------------------------
    served = serial.load(ckpt)
    n_dev = len(jax.devices())
    mesh = make_mesh(model=1)
    print(f"mesh: {n_dev} device(s), data axis {mesh.shape['data']}")

    # a large scoring workload: tile the test set to --score-rows rows
    reps = -(-args.score_rows // test.shape[0])
    x = jnp.asarray(np.tile(test, (reps, 1))[: args.score_rows])

    lp = sharded_fused_log_prob(mesh, served, x)  # compile + first run
    lp.block_until_ready()
    t0 = time.perf_counter()
    lp = sharded_fused_log_prob(mesh, served, x)
    lp.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"scored {x.shape[0]:,} rows in {dt * 1e3:.1f} ms "
          f"({x.shape[0] / dt / 1e6:.1f}M rows/s); "
          f"mean log-density {float(lp.mean()):.3f}")

    # the served model matches the training-process model exactly
    ref = flow(None).log_prob(x[:256])
    # f32 tolerance: the sharded program and the in-process dispatch are
    # structurally different XLA programs (different fusion, same math)
    assert jnp.allclose(lp[:256], ref, atol=2e-3), "checkpoint mismatch"
    print("serving output == training-process output (f32 round-trip)")

    # ---- conditional serving tier (round 5) -------------------------
    # Batched (per-request) contexts run through the fused kernels too:
    # the per-row hyper outputs stream with the data rows, and
    # sharded_fused_sample shards the CONTEXT batch over the mesh —
    # one draw (or sample_shape draws) per request row.
    from zuko_tpu.data import digits_conditional
    from zuko_tpu.parallel import sharded_fused_sample

    (cx, cy), _, _ = digits_conditional()
    cflow = NSF(cx.shape[1], cy.shape[1], transforms=3,
                hidden_features=(64, 64), key=jax.random.PRNGKey(2))
    cflow, _ = train_mle(cflow, cx, context=cy, epochs=args.epochs,
                         batch_size=256, key=jax.random.PRNGKey(3))

    B = (1024 // mesh.shape["data"]) * mesh.shape["data"]
    req_c = jnp.asarray(np.tile(cy, (-(-B // cy.shape[0]), 1))[:B])
    req_x = jnp.asarray(np.tile(cx, (-(-B // cx.shape[0]), 1))[:B])
    clp = sharded_fused_log_prob(mesh, cflow, req_x, req_c)
    draws = sharded_fused_sample(
        mesh, cflow, jax.random.PRNGKey(4), (), c=req_c
    )
    print(f"conditional serving: scored {B} request rows (mean "
          f"log-density {float(clp.mean()):.3f}) and drew one sample per "
          f"request, shape {tuple(draws.shape)}")


if __name__ == "__main__":
    main()
