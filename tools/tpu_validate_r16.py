r"""On-hardware validation batch 16: (a) MLE train-step throughput after
the _log_acc custom_jvp fix (the backward now differentiates the
accurate-log path; PERF's 8.4M examples/s row predates it and was
measured with a broken ladj gradient), (b) fused density/sampling at
NON-flagship shapes — GAS-shaped (D=8, hidden 256x2), MINIBOONE-shaped
(D=43, hidden 64x2), digits-shaped (D=64, hidden 64x2) — the kernel's
perf story beyond the D=6 tuning point, with accuracy vs the XLA path."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import optax

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

key = jax.random.PRNGKey(0)

# ---------- (a) train step, flagship config --------------------------
B = 65536
flow = NSF(6, 0, transforms=3, hidden_features=(64, 64), key=key)
params, static = partition(flow)
x = jax.random.normal(jax.random.PRNGKey(1), (B, 6))
opt = optax.adam(1e-3)
opt_state = opt.init(params)


@jax.jit
def steps(params, opt_state, x):
    def body(carry, _):
        p, s = carry

        def loss_fn(q):
            return -jnp.mean(combine(q, static)(None).log_prob(x))

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return (optax.apply_updates(p, up), s), loss

    (params, opt_state), losses = lax.scan(
        body, (params, opt_state), None, length=8)
    return params, opt_state, losses


p2, s2, ls = steps(params, opt_state, x)
jax.block_until_ready(ls)
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(3):
        p2, s2, ls = steps(p2, s2, x)
    jax.block_until_ready(ls)
    best = max(best, 3 * 8 * B / (time.perf_counter() - t0))
print(f"train step (fwd+bwd+adam, fused dispatch): {best:,.0f} examples/s"
      f"  (loss[0] {float(ls[0]):.3f} finite={bool(jnp.isfinite(ls).all())})",
      flush=True)

# ---------- (b) non-flagship shapes ----------------------------------
CONFIGS = [
    ("gas-shaped  D=8  h=256x2", 8, (256, 256), 65536),
    ("miniboone   D=43 h=64x2 ", 43, (64, 64), 16384),
    ("digits      D=64 h=64x2 ", 64, (64, 64), 16384),
]

for label, D, hidden, batch in CONFIGS:
    fl = NSF(D, 0, transforms=3, hidden_features=hidden,
             key=jax.random.PRNGKey(2))
    xv = jax.random.normal(jax.random.PRNGKey(3), (batch, D))

    import os
    lp_f = jax.jit(lambda v: nf.fused_nsf_log_prob(fl, v))(xv)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    lp_x = jax.jit(lambda v: fl(None).log_prob(v))(xv)
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
    err = float(jnp.abs(lp_f - lp_x).max())

    def loop(v, fl=fl):
        def body(c, _):
            return c + jnp.sum(nf.fused_nsf_log_prob(fl, v + 1e-9 * c)), None
        return lax.scan(body, 0.0, None, length=8)[0]

    j = jax.jit(loop)
    j(xv).block_until_ready()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            out = j(xv)
        out.block_until_ready()
        best = max(best, 3 * 8 * batch / (time.perf_counter() - t0))
    print(f"{label}: {best:,.0f} evals/s  |fused-XLA| {err:.2e}", flush=True)

print("DONE", flush=True)
