r"""On-hardware validation batch 4: the refactored CNF kernels — density
(exact + Hutchinson) and the new backward-integration sampling kernel
(plain inverse un-augmented; sample_and_log_prob augmented)."""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
key = jax.random.PRNGKey(0)
ks = jax.random.PRNGKey(7)


def xla(fn):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        return fn()
    finally:
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]


from zuko_tpu.flows import CNF
from zuko_tpu.ops.cnf_fused import fused_cnf_log_prob, fused_cnf_sample

# ---- density, exact trace ---------------------------------------------------
cnf = CNF(6, key=key)
tr = cnf.transform(None)
x = jax.random.normal(jax.random.PRNGKey(1), (2048, 6))
t0 = time.perf_counter()
lp_k = jax.jit(lambda x: fused_cnf_log_prob(cnf, tr, x))(x)
lp_k.block_until_ready()
print(f"cnf density(exact) compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
with jax.default_matmul_precision("highest"):
    lp_x = xla(lambda: jax.jit(lambda x: cnf(None).log_prob(x))(x))
print("cnf density(exact) vs XLA(highest) |max|:",
      float(jnp.abs(lp_k - lp_x).max()), flush=True)

# ---- density, Hutchinson ----------------------------------------------------
cnf_h = CNF(6, exact=False, key=key)
kh = jax.random.PRNGKey(5)
tr_h = cnf_h.transform(None, key=kh)
t0 = time.perf_counter()
lph_k = jax.jit(lambda x: fused_cnf_log_prob(cnf_h, tr_h, x))(x)
lph_k.block_until_ready()
print(f"cnf density(hutch) compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
with jax.default_matmul_precision("highest"):
    lph_x = xla(lambda: jax.jit(
        lambda x: cnf_h(None, key=kh).log_prob(x))(x))
print("cnf density(hutch) vs XLA(highest) |max|:",
      float(jnp.abs(lph_k - lph_x).max()), flush=True)

# ---- sampling ---------------------------------------------------------------
t0 = time.perf_counter()
s_k = jax.jit(lambda k: fused_cnf_sample(cnf, tr, k, (2048,)))(ks)
s_k.block_until_ready()
print(f"cnf sample compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
with jax.default_matmul_precision("highest"):
    s_x = xla(lambda: jax.jit(lambda k: cnf(None).sample(k, (2048,)))(ks))
print("cnf sample vs XLA(highest) |max|:",
      float(jnp.abs(s_k - s_x).max()), flush=True)

t0 = time.perf_counter()
s2, lq = jax.jit(
    lambda k: fused_cnf_sample(cnf, tr, k, (2048,), want_log_prob=True)
)(ks)
s2.block_until_ready()
print(f"cnf sample+logq compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
with jax.default_matmul_precision("highest"):
    s2x, lqx = xla(lambda: jax.jit(
        lambda k: cnf(None).sample_and_log_prob(k, (2048,)))(ks))
print("cnf s&lp x |max|:", float(jnp.abs(s2 - s2x).max()),
      " lq |max|:", float(jnp.abs(lq - lqx).max()), flush=True)

# ---- throughput -------------------------------------------------------------
B = 16384
xb = jax.random.normal(jax.random.PRNGKey(2), (B, 6))


def loop(fused):
    @jax.jit
    def go(k):
        def body(carry, _):
            if fused:
                lp = fused_cnf_log_prob(cnf, tr, xb + 1e-9 * carry)
            else:
                lp = cnf(None).log_prob(xb + 1e-9 * carry)
            return carry + jnp.sum(lp), None
        out, _ = jax.lax.scan(body, 0.0, None, length=4)
        return out
    return go


for fused, label in ((True, "cnf fused density"), (False, "cnf XLA density")):
    if not fused:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    g = loop(fused)
    t0 = time.perf_counter()
    g(ks).block_until_ready()
    print(f"{label} loop compile: {time.perf_counter()-t0:.1f}s", flush=True)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            out = g(ks)
        out.block_until_ready()
        best = max(best, B * 4 * 3 / (time.perf_counter() - t0))
    print(f"{label}: {best/1e6:.2f}M evals/s", flush=True)
    if not fused:
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]


def sloop(fused):
    @jax.jit
    def go(k):
        def body(carry, i):
            if fused:
                s = fused_cnf_sample(cnf, tr, jax.random.fold_in(k, i), (2048,))
            else:
                s = cnf(None).sample(jax.random.fold_in(k, i), (2048,))
            return carry + jnp.sum(s), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(4))
        return out
    return go


for fused, label in ((True, "cnf fused sampling"), (False, "cnf XLA sampling")):
    if not fused:
        os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    g = sloop(fused)
    t0 = time.perf_counter()
    g(ks).block_until_ready()
    print(f"{label} loop compile: {time.perf_counter()-t0:.1f}s", flush=True)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            out = g(ks)
        out.block_until_ready()
        best = max(best, 2048 * 4 * 3 / (time.perf_counter() - t0))
    print(f"{label}: {best/1e6:.2f}M samples/s", flush=True)
    if not fused:
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

print("DONE", flush=True)
