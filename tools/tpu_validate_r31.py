r"""On-hardware validation batch 31: (a) the non-NSF kernel zoo at
non-flagship feature counts vs CPU references — NAF sampling D=21, GF
density D=21, CNF density D=11 (all kernels were tuned/validated at
D<=6-8; the r16-r29 story shows shape coverage matters); (b) wide
conditioner (hidden 512x2) precision A/B — 1-pass vs split3-cat at
D=8: does the accuracy default still cost <~15% when MXU passes
dominate? (ROADMAP item 5, bf16 at scale)."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

cpu = jax.devices("cpu")[0]
ks = jax.random.PRNGKey(7)

# ---- (a) kernel zoo at odd shapes -----------------------------------
from zuko_tpu.flows import NAF, GF, CNF
from zuko_tpu.ops.naf_fused import fused_naf_sample

naf = NAF(21, transforms=2, signal=12, key=jax.random.PRNGKey(0))
with jax.default_matmul_precision("highest"):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    naf_ref = jax.jit(lambda k: naf(None).sample(k, (1024,)))(ks)
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
s = jax.jit(lambda k: fused_naf_sample(naf, k, (1024,)))(ks)
print(f"(a) NAF D=21 sample vs XLA-highest: max"
      f" {float(jnp.abs(s - naf_ref).max()):.3e}", flush=True)

gf = GF(21, transforms=2, key=jax.random.PRNGKey(1))
x = jax.random.normal(jax.random.PRNGKey(2), (2048, 21))
lp_t = np.asarray(jax.jit(lambda v: gf(None).log_prob(v))(x))
with jax.default_device(cpu):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    lp_c = np.asarray(gf(None).log_prob(jax.device_put(x, cpu)))
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
d = np.abs(lp_t - lp_c)
print(f"(a) GF D=21 density vs CPU: max {d.max():.3e} median"
      f" {np.median(d):.3e}", flush=True)

cnf = CNF(11, key=jax.random.PRNGKey(3))
xc = jax.random.normal(jax.random.PRNGKey(4), (512, 11))
lp_t = np.asarray(jax.jit(lambda v: cnf(None).log_prob(v))(xc))
with jax.default_device(cpu):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    lp_c = np.asarray(cnf(None).log_prob(jax.device_put(xc, cpu)))
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
d = np.abs(lp_t - lp_c)
print(f"(a) CNF D=11 density vs CPU: max {d.max():.3e} median"
      f" {np.median(d):.3e}", flush=True)

# ---- (b) hidden 512x2 precision A/B ---------------------------------
from zuko_tpu.flows import NSF
from zuko_tpu.ops import nsf_fused as nf

flow = NSF(8, transforms=3, hidden_features=(512, 512),
           key=jax.random.PRNGKey(5))
xw = jax.random.normal(jax.random.PRNGKey(6), (65536, 8))
with jax.default_device(cpu):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    lp_cw = np.asarray(
        flow(None).log_prob(jax.device_put(xw[:2048], cpu)))
    del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

for prec in ["split3", None]:
    nf._DENSITY_HYPER_PREC = prec
    try:
        lp = np.asarray(jax.jit(
            lambda v: nf.fused_nsf_log_prob(flow, v))(xw), np.float64)
        d = np.abs(lp[:2048] - lp_cw)

        def loop(v):
            def body(c, _):
                return c + jnp.sum(
                    nf.fused_nsf_log_prob(flow, v + 1e-9 * c)), None
            return jax.lax.scan(body, 0.0, None, length=8)[0]

        j = jax.jit(loop)
        j(xw).block_until_ready()
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(3):
                out = j(xw)
            out.block_until_ready()
            best = max(best, 3 * 8 * 65536 / (time.perf_counter() - t0))
        print(f"(b) h=512 prec={prec}: {best:,.0f} evals/s  vs CPU max"
              f" {d.max():.3e} median {np.median(d):.3e}", flush=True)
    finally:
        nf._DENSITY_HYPER_PREC = "split3"

print("DONE", flush=True)
