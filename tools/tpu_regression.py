r"""One-shot hardware regression: every fused family's density /
sampling / log q against the CPU reference at the CURRENT code state.

Run after any kernel change (background; compiles take minutes):
    nohup python -u tools/tpu_regression.py > /tmp/tpu_regression.log &

Interpretation guide (PERF.md has the full contracts):
- densities/log q: max ~1e-4-class, median ~1e-5-class
- spline sampling: p99 ~1e-3 (1-pass solver sweeps); NCSF may flip rare
  circular-seam branches (dev == 2*pi exactly)
- NAF/UNAF sampling: ~1e-5 vs the XLA-highest reference
- SOSPF/BPF sampling: solver tolerance (~5e-6); SOSPF log q carries rare
  bracket-pegged far-tail outliers
- GF: quantile contract (saturated tails peg at +-bound on both paths)
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import (
    BPF, CNF, GF, MAF, NAF, NCSF, NICE, NSF, SOSPF, UNAF,
)

cpu = jax.devices("cpu")[0]
ks = jax.random.PRNGKey(7)
kx = jax.random.PRNGKey(1)


def cpu_ref(fn, *args):
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    try:
        with jax.default_device(cpu):
            return np.asarray(fn(*[jax.device_put(a, cpu) for a in args]))
    finally:
        del os.environ["ZUKO_TPU_FUSED_DISPATCH"]


def row(name, fl, B=4096, sample=True, logq=True, xscale=1.0):
    try:
        D = fl.base.args[0].shape[-1] if hasattr(fl.base, "args") else None
    except Exception:
        D = None
    x = xscale * jax.random.normal(kx, (B, 5))
    try:
        lp_t = np.asarray(jax.jit(lambda v: fl(None).log_prob(v))(x))
        lp_c = cpu_ref(lambda v: fl(None).log_prob(v), x)
        d = np.abs(lp_t - lp_c)
        msg = f"density max {d.max():.1e} med {np.median(d):.1e}"
    except Exception as e:
        msg = f"density FAIL {str(e)[:80]}"
    smsg = ""
    if sample:
        try:
            s_t = np.asarray(jax.jit(lambda k: fl(None).sample(k, (B,)))(ks))
            s_c = cpu_ref(lambda k: fl(None).sample(k, (B,)), ks)
            ds = np.abs(s_t - s_c)
            smsg = f"; sample p99 {np.quantile(ds, 0.99):.1e}"
        except Exception as e:
            smsg = f"; sample FAIL {str(e)[:60]}"
    qmsg = ""
    if logq:
        try:
            xs, lq = jax.jit(
                lambda k: fl(None).sample_and_log_prob(k, (B,)))(ks)
            lp = jax.jit(lambda v: fl(None).log_prob(v))(xs)
            e = np.abs(np.asarray(lq, np.float64) - np.asarray(lp, np.float64))
            qmsg = f"; logq med {np.median(e):.1e}"
        except Exception as e:
            qmsg = f"; logq FAIL {str(e)[:60]}"
    print(f"{name:8s}: {msg}{smsg}{qmsg}", flush=True)


key = jax.random.PRNGKey(0)
row("NSF", NSF(5, transforms=2, key=key))

# args-form density (params as jit ARGUMENTS — the production calling
# convention): must match the closure form; XLA's excess-precision
# elision once zeroed the presplit low part here (r48)
_f = NSF(5, transforms=2, key=key)
_p, _s = partition(_f)
_x = jax.random.normal(kx, (4096, 5))
from zuko_tpu.ops.nsf_fused import fused_nsf_log_prob as _fnlp
_la = np.asarray(jax.jit(
    lambda p, v: _fnlp(combine(p, _s), v))(_p, _x))
_lc = np.asarray(jax.jit(lambda v: _fnlp(_f, v))(_x))
_d = np.abs(_la - _lc)
print(f"NSF-args: vs closure max {_d.max():.1e} (expect ~0)", flush=True)
row("MAF", MAF(5, transforms=2, key=key))
row("NCSF", NCSF(5, transforms=2, key=key), xscale=0.5)
row("NICE", NICE(5, transforms=2, key=key))
row("SOSPF", SOSPF(5, transforms=2, key=key))
row("BPF", BPF(5, transforms=2, key=key))

gf = GF(5, transforms=2, key=key)
pg, sg = partition(gf)
row("GF", combine(jtu.tree_map(lambda a: a * 0.3, pg), sg))

row("CNF", CNF(5, key=key), B=512, logq=False)

for cls, name in [(NAF, "NAF"), (UNAF, "UNAF")]:
    fl = cls(5, transforms=2, signal=12, key=key)
    try:
        with jax.default_matmul_precision("highest"):
            os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
            ref = jax.jit(lambda k: fl(None).sample(k, (1024,)))(ks)
            del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
        s = jax.jit(lambda k: fl(None).sample(k, (1024,)))(ks)
        print(f"{name:8s}: sample vs XLA-highest max"
              f" {float(jnp.abs(s - ref).max()):.1e}", flush=True)
    except Exception as e:
        print(f"{name:8s}: FAIL {str(e)[:80]}", flush=True)

print("DONE", flush=True)
