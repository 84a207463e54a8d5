r"""Batch 72 (round 4): explain the r70 GF density reading (5.9M evals/s
vs the round-2 90.2M record). Same-session A/B of the stable-ladj kernel
(streaming logsumexp, the round-4 default) vs the old unstable sum form
(monkeypatched into gf_fused._gauss_mean_F BEFORE tracing — the r56
flag-at-trace-time pattern), each at b=16384 and b=65536, plus a
no-deriv control (want_deriv=False path cost)."""
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

import math

from zuko_tpu import flows
from zuko_tpu.core import combine, partition
from zuko_tpu.ops import gf_fused

key = jax.random.PRNGKey(0)
flow = flows.GF(6, 0, transforms=3, key=key)
params, static = partition(flow)

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _gauss_mean_F_old(x, shift, scale, K, want_deriv=True):
    """round-3 form: naive sum (underflows at saturation) — for the A/B."""
    m = None
    S = None
    for i in range(K):
        s = scale[:, i : i + 1]
        z = s * x + shift[:, i : i + 1]
        e = gf_fused._erf(z * _INV_SQRT2)
        m = e if m is None else m + e
        if want_deriv:
            q = s * jnp.exp(-0.5 * z * z)
            S = q if S is None else S + q
    logS = None if S is None else gf_fused._log_ladj(S)
    return m * ((1.0 - gf_fused._EPS_GF) / K), logS


def bench(tag, B):
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 6))

    def loop(p, v):
        def body(carry, _):
            d = combine(p, static)(None)
            return carry + jnp.sum(d.log_prob(v + 1e-9 * carry)), None
        out, _ = jax.lax.scan(body, 0.0, None, length=10)
        return out

    fn = jax.jit(loop)
    fn(params, x).block_until_ready()
    best = 0.0
    for r in range(4):
        t0 = time.perf_counter()
        fn(params, x).block_until_ready()
        dt = time.perf_counter() - t0
        rate = B * 10 / dt / 1e6
        best = max(best, rate)
        print(f"  {tag} b={B} run {r}: {rate:.1f}M evals/s", flush=True)
    return best


results = {}
orig = gf_fused._gauss_mean_F
for tag, fnimpl in (("stable(new)", orig), ("unstable(old)", _gauss_mean_F_old)):
    gf_fused._gauss_mean_F = fnimpl
    for B in (16384, 65536):
        results[(tag, B)] = bench(tag, B)
gf_fused._gauss_mean_F = orig

print(flush=True)
for k, v in results.items():
    print(f"{k[0]:>14} b={k[1]}: best {v:.1f}M evals/s", flush=True)
print("done", flush=True)
