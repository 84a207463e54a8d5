r"""Batch 64: decompose the 105M hyper-only floor (r56) for the round-4
attack. Hyper-only rate at split3 vs 1-pass matmuls and at batch tiles
512/1024/2048: if 1-pass ~= split3, the floor is layout/issue-bound, not
MXU-pass-bound; the tile sweep sizes the per-tile overhead."""
import functools, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from jax import lax
print("backend:", jax.default_backend(), flush=True)
from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

flow = NSF(6, 0, transforms=3, hidden_features=(64, 64), bins=8,
           key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))
REPS = 10

def univ_hyper_only(xx, h, F, K, bound, slope, univ):
    return xx + 1e-6 * h[:F, :], 1e-6 * h[F:2 * F, :]

orig_univ = nf._univ_forward_F
orig_tb = nf._TB
orig_prec = nf._DENSITY_HYPER_PREC

def measure(label):
    def loop(x):
        def body(carry, _):
            return carry + jnp.sum(
                nf.fused_nsf_log_prob(flow, x + 1e-9 * carry)), None
        out, _ = lax.scan(body, 0.0, None, length=REPS)
        return out
    j = jax.jit(loop)
    j(x).block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = j(x)
        out.block_until_ready()
        best = max(best, 65536 * REPS * 5 / (time.perf_counter() - t0))
    print(f"{label}: {best:,.0f} evals/s", flush=True)

nf._univ_forward_F = univ_hyper_only
for prec_label, prec in [("split3", "split3"), ("1-pass", None)]:
    nf._DENSITY_HYPER_PREC = prec
    for tb in [512, 1024, 2048]:
        nf._TB = tb
        measure(f"hyper-only {prec_label} tb={tb}")
nf._TB = orig_tb
nf._DENSITY_HYPER_PREC = orig_prec
nf._univ_forward_F = orig_univ

# full kernel at 1-pass for the envelope at the final defaults
nf._DENSITY_HYPER_PREC = None
measure("full 1-pass (envelope)")
nf._DENSITY_HYPER_PREC = orig_prec
measure("full split3 (control)")
print("done", flush=True)
