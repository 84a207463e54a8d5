r"""On-hardware validation batch 3: rolled (fori_loop) NAF/UNAF sampling
kernels, polynomial densities at f32-exact matmul precision, and the fused
CNF dopri45 kernel (Mosaic while_loop lowering + parity + throughput)."""

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


def bench(fn, label, per_call, reps=3):
    jfn = jax.jit(fn)
    jfn(ks).block_until_ready()
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(reps):
            out = jfn(jax.random.fold_in(ks, i))
        out.block_until_ready()
        best = max(best, reps * per_call / (time.perf_counter() - t0))
    print(f"{label}: {best:,.0f}/s", flush=True)


def scan_samples(sampler, rep=8):
    def fn(k):
        def body(carry, i):
            s = sampler(jax.random.fold_in(k, i))
            return carry + jnp.sum(s), None
        out, _ = jax.lax.scan(body, 0.0, jnp.arange(rep))
        return out
    return fn


# ---- 1) CNF fused density ---------------------------------------------------
from zuko_tpu.flows import CNF
from zuko_tpu.ops.cnf_fused import fused_cnf_log_prob

cnf = CNF(6, key=key)
xc = jax.random.normal(jax.random.PRNGKey(1), (4096, 6))
t0 = time.perf_counter()
tr = cnf.transform(None)
lp_k = jax.jit(lambda x: fused_cnf_log_prob(cnf, tr, x))(xc)
lp_k.block_until_ready()
print(f"cnf kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
with jax.default_matmul_precision("highest"):
    lp_x = xla(lambda: jax.jit(lambda x: cnf(None).log_prob(x))(xc))
print("cnf kernel vs XLA(highest) |max|:", float(jnp.abs(lp_k - lp_x).max()),
      flush=True)

B = 16384
xb = jax.random.normal(jax.random.PRNGKey(2), (B, 6))


def cnf_loop(fused):
    @jax.jit
    def loop(k):
        def body(carry, _):
            if fused:
                lp = fused_cnf_log_prob(cnf, tr, xb + 1e-9 * carry)
            else:
                lp = cnf(None).log_prob(xb + 1e-9 * carry)
            return carry + jnp.sum(lp), None
        out, _ = jax.lax.scan(body, 0.0, None, length=4)
        return out
    return loop


jl = cnf_loop(True)
t0 = time.perf_counter()
jl(ks).block_until_ready()
print(f"cnf density loop compile: {time.perf_counter()-t0:.1f}s", flush=True)
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(3):
        out = jl(ks)
    out.block_until_ready()
    best = max(best, B * 4 * 3 / (time.perf_counter() - t0))
print(f"cnf fused density: {best/1e6:.2f}M evals/s", flush=True)

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
jx = cnf_loop(False)
t0 = time.perf_counter()
jx(ks).block_until_ready()
print(f"cnf XLA loop compile: {time.perf_counter()-t0:.1f}s", flush=True)
best = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(3):
        out = jx(ks)
    out.block_until_ready()
    best = max(best, B * 4 * 3 / (time.perf_counter() - t0))
print(f"cnf XLA density: {best/1e6:.2f}M evals/s", flush=True)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

# ---- 2) rolled NAF/UNAF sampling kernels ------------------------------------
from zuko_tpu.flows import NAF, UNAF
from zuko_tpu.ops.naf_fused import fused_naf_sample

naf = NAF(6, transforms=3, signal=16, key=key)
t0 = time.perf_counter()
n_k = jax.jit(lambda k: fused_naf_sample(naf, k, (4096,)))(ks)
n_k.block_until_ready()
print(f"naf rolled kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
with jax.default_matmul_precision("highest"):
    n_xh = xla(lambda: jax.jit(lambda k: naf(None).sample(k, (4096,)))(ks))
print("naf rolled vs XLA(highest) |max|:", float(jnp.abs(n_k - n_xh).max()),
      flush=True)

unaf = UNAF(6, transforms=3, signal=16, key=key)
t0 = time.perf_counter()
u_k = jax.jit(lambda k: fused_naf_sample(unaf, k, (1024,)))(ks)
u_k.block_until_ready()
print(f"unaf rolled kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
with jax.default_matmul_precision("highest"):
    u_xh = xla(lambda: jax.jit(lambda k: unaf(None).sample(k, (1024,)))(ks))
print("unaf rolled vs XLA(highest) |max|:", float(jnp.abs(u_k - u_xh).max()),
      flush=True)

bench(scan_samples(lambda k: fused_naf_sample(naf, k, (4096,))),
      "naf fused samples", 4096 * 8)
bench(scan_samples(lambda k: fused_naf_sample(unaf, k, (1024,)), rep=4),
      "unaf fused samples", 1024 * 4)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
bench(scan_samples(lambda k: naf(None).sample(k, (4096,))),
      "naf XLA samples", 4096 * 8)
bench(scan_samples(lambda k: unaf(None).sample(k, (1024,)), rep=4),
      "unaf XLA samples", 1024 * 4)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

# ---- 3) polynomial densities: f32-exact hyper matmuls -----------------------
from zuko_tpu.flows import BPF, SOSPF
from zuko_tpu.ops.nsf_fused import fused_nsf_log_prob

for cls, name in [(SOSPF, "sospf"), (BPF, "bpf")]:
    flow = cls(6, transforms=3, key=key)
    x = jax.random.normal(jax.random.PRNGKey(1), (4096, 6))
    t0 = time.perf_counter()
    lp_k = jax.jit(lambda x, f=flow: fused_nsf_log_prob(f, x))(x)
    lp_k.block_until_ready()
    print(f"{name} kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    with jax.default_matmul_precision("highest"):
        lp_x = xla(lambda f=flow: jax.jit(lambda x: f(None).log_prob(x))(x))
    print(f"{name} kernel vs XLA(highest) |max|:",
          float(jnp.abs(lp_k - lp_x).max()), flush=True)

# ---- 4) GF rolled-bisection sampling kernel ---------------------------------
import jax.tree_util as jtu

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import GF
from zuko_tpu.ops.gf_fused import fused_gf_log_prob, fused_gf_sample

gf = GF(6, transforms=3, key=key)
p, st = partition(gf)
gf = combine(jtu.tree_map(lambda a: a * 0.3, p), st)
t0 = time.perf_counter()
g_k, g_lq = jax.jit(
    lambda k: fused_gf_sample(gf, k, (4096,), want_log_prob=True)
)(ks)
g_k.block_until_ready()
print(f"gf rolled sample kernel compile+run: {time.perf_counter()-t0:.1f}s",
      flush=True)
g_x = xla(lambda: jax.jit(lambda k: gf(None).sample(k, (4096,)))(ks))
e = jnp.abs(g_k - g_x)
print("gf rolled sample vs XLA median:", float(jnp.median(e)),
      "q95:", float(jnp.quantile(e, 0.95)), flush=True)
es = jnp.abs(g_lq - fused_gf_log_prob(gf, g_k))
print("gf logq self-consistency median:", float(jnp.median(es)), flush=True)
bench(scan_samples(lambda k: fused_gf_sample(gf, k, (4096,))),
      "gf fused samples", 4096 * 8)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
bench(scan_samples(lambda k: gf(None).sample(k, (4096,))),
      "gf XLA samples", 4096 * 8)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

print("DONE", flush=True)
