r"""Follow-up: GF fused density vs the XLA path at f32-exact matmul
precision — isolates whether the observed default-precision gap (~4e-2) is
the XLA path's own bf16 rotation-matmul noise (the kernel runs rotations at
HIGHEST)."""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from zuko_tpu.core import combine, partition
from zuko_tpu.flows import GF
from zuko_tpu.ops.gf_fused import fused_gf_log_prob

print("backend:", jax.default_backend(), flush=True)
key = jax.random.PRNGKey(0)
gf = GF(6, transforms=3, key=key)
p, st = partition(gf)
gf = combine(jtu.tree_map(lambda a: a * 0.3, p), st)
x = jax.random.normal(jax.random.PRNGKey(1), (4096, 6))

lp_k = jax.jit(lambda x: fused_gf_log_prob(gf, x))(x)

os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
lp_xd = jax.jit(lambda x: gf(None).log_prob(x))(x)
with jax.default_matmul_precision("highest"):
    lp_xh = jax.jit(lambda x: gf(None).log_prob(x))(x)
del os.environ["ZUKO_TPU_FUSED_DISPATCH"]

print("gf density kernel vs XLA(default) |max|:",
      float(jnp.abs(lp_k - lp_xd).max()), flush=True)
print("gf density kernel vs XLA(highest) |max|:",
      float(jnp.abs(lp_k - lp_xh).max()), flush=True)
print("XLA default vs XLA highest        |max|:",
      float(jnp.abs(lp_xd - lp_xh).max()), flush=True)
print("DONE", flush=True)
