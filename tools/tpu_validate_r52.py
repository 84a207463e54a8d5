r"""On-hardware batch 52: the IFT reverse-KL step, measured the standard way
(CLAUDE.md harness discipline: amortize steps inside one jit call — every
host->device dispatch through the tunnel costs ~3.5 ms). r49's 0.51M/s was
10 sequential un-amortized dispatches under host contention; r51's
dissection puts the IFT backward at ~one density-backward, which predicts
~6-7M/s amortized. Same-session XLA-backward baseline at a compile-safe
batch for the honest ratio."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: F401
import jax
import jax.numpy as jnp
import optax

from functools import partial

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF
from zuko_tpu.parallel.train import TrainState

flow = NSF(6, 0, transforms=3, key=jax.random.PRNGKey(0))
params, static = partition(flow)
opt = optax.adam(1e-3)
STEPS = 10


def ring(x):
    r = jnp.linalg.norm(x, axis=-1)
    return -((r - 2.0) ** 2) / 0.5


def make_scanned(batch):
    def loss_fn(p, key):
        d = combine(p, static)(None)
        x, lq = d.rsample_and_log_prob(key, (batch,))
        return jnp.mean(lq) - jnp.mean(ring(x))

    @partial(jax.jit, donate_argnums=0)
    def run(state, key):
        def body(st, i):
            loss, g = jax.value_and_grad(loss_fn)(
                st.params, jax.random.fold_in(key, i)
            )
            u, o = opt.update(g, st.opt_state, st.params)
            return TrainState(
                optax.apply_updates(st.params, u), o, st.step + 1
            ), loss

        return jax.lax.scan(body, state, jnp.arange(STEPS))

    return run


def fresh_state():
    p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)
    return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))


def bench(label, batch):
    run = make_scanned(batch)
    state, _ = run(fresh_state(), jax.random.PRNGKey(0))
    jax.block_until_ready(state.params)
    best = 0.0
    for r in range(3):
        st = fresh_state()
        t0 = time.perf_counter()
        st, losses = run(st, jax.random.PRNGKey(r))
        jax.block_until_ready(st.params)
        best = max(best, batch * STEPS / (time.perf_counter() - t0))
    print(f"{label}: {best / 1e6:.2f}M samples/s (batch {batch}, "
          f"loss {float(losses[-1]):.3f})", flush=True)
    return best


os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
bench("VI scanned steps, IFT, b=65536", 65536)
bench("VI scanned steps, IFT, b=16384", 16384)

os.environ["ZUKO_TPU_IFT"] = "0"
try:
    bench("VI scanned steps, XLA bwd, b=8192", 8192)
finally:
    del os.environ["ZUKO_TPU_IFT"]
print("done", flush=True)
