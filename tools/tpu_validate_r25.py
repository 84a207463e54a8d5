r"""On-hardware validation batch 25: candidate mitigations for the
composed-density miscompile at (16384, 43) (r24: every layer correct
standalone; r23: per-layer barriers don't help).
(1) matmul precision HIGHEST (different dot emitter),
(2) masked-linear einsum rewritten to x @ (m*W).T (different dot_general
    dimension ordering),
(3) jax.checkpoint around each layer (remat isolation)."""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF
import zuko_tpu.ops.masked_linear as ml
import zuko_tpu.transforms as trmod

D, B = 43, 16384
cpu = jax.devices("cpu")[0]
x = jax.random.normal(jax.random.PRNGKey(3), (B, D))
flow = NSF(D, transforms=3, hidden_features=(64, 64),
           key=jax.random.PRNGKey(0))
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"

with jax.default_device(cpu):
    lp_c = np.asarray(flow(None).log_prob(jax.device_put(x[:2048], cpu)))


def report(tag, lp_t):
    d = np.abs(np.asarray(lp_t)[:2048] - lp_c)
    print(f"{tag}: max {d.max():.3e} median {np.median(d):.3e}"
          f" frac>1 {float((d > 1).mean()):.3f}", flush=True)


# baseline (current code)
report("baseline        ", jax.jit(lambda v: flow(None).log_prob(v))(x))

# (1) matmul precision highest
with jax.default_matmul_precision("highest"):
    report("matmul-highest  ",
           jax.jit(lambda v: flow(None).log_prob(v))(x))

# (2) x @ (m*W).T form
orig_ml = ml.masked_linear


def ml_dotT(x_, weight, mask, bias=None):
    y = x_ @ (mask * weight).T
    return y if bias is None else y + bias


ml.masked_linear = ml_dotT
import zuko_tpu.nn as nnmod  # nn imports inside method, picks up module attr
report("x@(mW).T        ", jax.jit(lambda v: flow(None).log_prob(v))(x))
ml.masked_linear = orig_ml

# (3) jax.checkpoint per layer
orig_cl = trmod.ComposedTransform.call_and_ladj


def ckpt_call_and_ladj(self, x_):
    event_dim = self.domain_dim
    acc = 0.0
    for t in self.transforms:
        x_, ladj = jax.checkpoint(lambda v, tt=t: tt.call_and_ladj(v))(x_)
        acc = acc + trmod._sum_rightmost(ladj, event_dim - t.domain_dim)
        event_dim += t.codomain_dim - t.domain_dim
    return x_, acc


trmod.ComposedTransform.call_and_ladj = ckpt_call_and_ladj
report("remat-per-layer ", jax.jit(lambda v: flow(None).log_prob(v))(x))
trmod.ComposedTransform.call_and_ladj = orig_cl

del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
print("DONE", flush=True)
