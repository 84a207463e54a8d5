r"""Batch 68 (round 4): roofline re-sweep of the flagship density under the
round-3 defaults (fused bin-select + packed constraints). ROADMAP item 3
levers: the batch-tile optimum may have moved with the smaller live set
(old sweep: 1024 > 2048 > 512, pre-binsel), and the 1-pass hyper mode
bounds the hyper-tier headroom. All configs run in THIS process by
re-importing the ops module per setting (flag-at-import, same discipline
as the r50 sweeps); one session, pipelined timing, per-run prints."""
import importlib
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

BATCH, REPEATS = 65536, 10


def measure(tag):
    # fresh module state under the current env
    import zuko_tpu.ops.nsf_fused as nf
    importlib.reload(nf)
    import zuko_tpu.ops.dispatch as dp
    importlib.reload(dp)
    from zuko_tpu.core import combine, partition
    from zuko_tpu.flows import NSF

    flow = NSF(6, 0, transforms=3, hidden_features=(64, 64), bins=8,
               key=jax.random.PRNGKey(0))
    params, static = partition(flow)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 6))

    @jax.jit
    def loop(params, x):
        def body(carry, _):
            model = combine(params, static)
            d = model(None)  # public dispatch (ZUKO_TPU_FUSED_DISPATCH=1)
            return carry + jnp.sum(d.log_prob(x + 1e-9 * carry)), None
        out, _ = jax.lax.scan(body, 0.0, None, length=REPEATS)
        return out

    out = loop(params, x)
    out.block_until_ready()
    rates = []
    for r in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = loop(params, x)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        rates.append(BATCH * REPEATS * 5 / dt)
    print(f"{tag}: " + " / ".join(f"{r/1e6:.1f}M" for r in rates)
          + f" evals/s (TB={nf._TB})", flush=True)
    return max(rates)


base = None
for tb in ("1024", "2048", "4096", "512"):
    os.environ["ZUKO_TPU_DENSITY_TB"] = tb
    rate = measure(f"density TB={tb} (split3)")
    if tb == "1024":
        base = rate

os.environ["ZUKO_TPU_DENSITY_TB"] = "1024"
os.environ["ZUKO_TPU_DENSITY_PREC"] = "fast"
measure("density TB=1024 (1-pass hyper, accuracy ~2e-3)")
del os.environ["ZUKO_TPU_DENSITY_PREC"]

print(f"baseline(TB=1024, split3): {base/1e6:.1f}M evals/s", flush=True)
print("done", flush=True)
