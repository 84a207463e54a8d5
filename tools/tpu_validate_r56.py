r"""On-hardware batch 56: flagship roofline DISSECTION.

The recorded bound (~150M VREG-row, PERF.md "Speed-of-light analysis") was
an op-count estimate that ignored transcendental multi-op costs. Measure
the marginal cost of each pipeline stage by swapping module functions
before tracing fresh jits (trace-time binding, the r50 flag pattern):

  full          — the production kernel (binsel default), the control
  no-logacc     — `_log_ladj` -> hardware jnp.log (the known ~8% row)
  no-log        — `_log_ladj` -> identity (all ladj logs free)
  no-exp        — softmax/derivative exps -> algebraic stand-ins of the
                  same slab shape (softmax -> |a|/sum|a|, exp(d) -> 1+|d|):
                  constraint-pass transcendentals free, arithmetic kept
  hyper-only    — kernel body runs only the 3 MADE matmul stacks + a thin
                  coupling (x += 1e-6 h[:F]) and the base reduction:
                  the MXU + layout floor

Stage costs then decompose 1/rate_full into measured parts and the PERF.md
bound gets revised from evidence.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

d = np.load("tools/nsf_truth_f64.npz")
X, LP64 = jnp.asarray(d["x"]), d["lp"]

flow = NSF(6, 0, transforms=3, hidden_features=(64, 64), bins=8,
           key=jax.random.PRNGKey(0))
x = jax.random.normal(jax.random.PRNGKey(1), (65536, 6))
REPS = 10


def measure(label, check_truth=True):
    lp = jax.jit(lambda v: nf.fused_nsf_log_prob(flow, v))(X)
    e = np.abs(np.asarray(lp, np.float64) - LP64)

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
    err = f"  err max {e.max():.3e} median {np.median(e):.3e}" \
        if check_truth else "  (math altered; no truth check)"
    print(f"{label}: {best:,.0f} evals/s{err}", flush=True)
    return best


orig_log_ladj = nf._log_ladj
orig_softmax = nf._softmax_slabs
orig_univ = nf._univ_forward_F

rates = {}
rates["full"] = measure("full (control)")

nf._log_ladj = lambda v: jnp.log(v)
rates["no-logacc"] = measure("no-logacc (hardware log)", check_truth=False)

nf._log_ladj = lambda v: v
rates["no-log"] = measure("no-log (ladj log free)", check_truth=False)
nf._log_ladj = orig_log_ladj


def softmax_cheap(slabs):
    es = [jnp.abs(a) + 1e-3 for a in slabs]
    tot = es[0]
    for e in es[1:]:
        tot = tot + e
    inv = 1.0 / tot
    return [e * inv for e in es]


def univ_noexp(x, h, F, K, bound, slope, univ):
    # the fused-binsel spline with exp(d) -> 1+|d| (positive, same shape)
    assert univ == "rqs"
    import math as _m
    log_s = _m.log(slope)
    ws = [h[t * F:(t + 1) * F, :] for t in range(K)]
    hs = [h[(K + t) * F:(K + t + 1) * F, :] for t in range(K)]
    rds = [h[(2 * K + t) * F:(2 * K + t + 1) * F, :] for t in range(K - 1)]
    ws = [w / (1 + jnp.abs(2 * w / log_s)) for w in ws]
    hs = [v / (1 + jnp.abs(2 * v / log_s)) for v in hs]
    rds = [dd / (1 + jnp.abs(dd / log_s)) for dd in rds]
    ws = softmax_cheap(ws)
    hs = softmax_cheap(hs)
    one = jnp.ones_like(ws[0])
    dds = [one] + [1.0 + jnp.abs(dd) for dd in rds] + [one]
    two_b = 2.0 * bound
    xj = jnp.full_like(ws[0], -bound)
    yj = jnp.full_like(ws[0], -bound)
    zero = jnp.zeros_like(ws[0])
    x0, y0, dx, dy, d0, d1 = zero, zero, one, one, zero, zero
    for jj in range(K):
        wj = two_b * ws[jj]
        hj = two_b * hs[jj]
        xn = xj + wj
        m = (xj < x) & ~(xn < x)
        x0 = jnp.where(m, xj, x0)
        y0 = jnp.where(m, yj, y0)
        dx = jnp.where(m, wj, dx)
        dy = jnp.where(m, hj, dy)
        d0 = jnp.where(m, dds[jj], d0)
        d1 = jnp.where(m, dds[jj + 1], d1)
        xj = xn
        yj = yj + hj
    neg_b = jnp.full_like(x, -bound)
    mask = (neg_b < x) & ~(xj < x)
    s = dy / dx
    z = jnp.where(mask, (x - x0) / dx, 0.0)
    z1 = z * (1 - z)
    denom = s + (d0 + d1 - 2 * s) * z1
    y = y0 + dy * (s * z**2 + d0 * z1) / denom
    jac = s**2 * (2 * s * z1 + d0 * (1 - z)**2 + d1 * z**2) / denom**2
    return jnp.where(mask, y, x), jnp.where(mask, nf._log_ladj(jac), 0.0)


nf._univ_forward_F = univ_noexp
rates["no-exp"] = measure("no-exp (constraint exps free)",
                          check_truth=False)
nf._univ_forward_F = orig_univ


def univ_hyper_only(x, h, F, K, bound, slope, univ):
    # thin coupling keeps the layer chain + data dependency, no spline
    return x + 1e-6 * h[:F, :], 1e-6 * h[F:2 * F, :]


nf._univ_forward_F = univ_hyper_only
rates["hyper-only"] = measure("hyper-only (MXU + layout floor)",
                              check_truth=False)
nf._univ_forward_F = orig_univ

t_full = 1e9 / rates["full"]
print("\nper-eval ns decomposition (65536-batch amortized):", flush=True)
print(f"  full                 {t_full:8.2f} ns", flush=True)
for k in ["no-logacc", "no-log", "no-exp", "hyper-only"]:
    dt = t_full - 1e9 / rates[k]
    print(f"  minus {k:<14} {1e9 / rates[k]:8.2f} ns  (stage cost"
          f" {dt:+.2f} ns, {100 * dt * rates['full'] / 1e9:.1f}%)",
          flush=True)
print("done", flush=True)
