r"""On-hardware validation batch 27: mitigations for the layer-boundary
corruption (r26: layer-1 output wrong by up to 5.2 inside the composed
big-batch program; threshold between b=12288 and 16384; deterministic).
(a) reshape canonicalization of the intermediate between layers,
(b) transpose round-trip (forces a copy with canonical layout),
(c) lax.map batch chunking at 4096 rows,
(d) scan-over-layers form (different graph: no Python-unrolled layers)."""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF
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


orig_cl = trmod.ComposedTransform.call_and_ladj


def make_variant(canon):
    def call_and_ladj(self, x_):
        event_dim = self.domain_dim
        acc = 0.0
        for t in self.transforms:
            x_, ladj = t.call_and_ladj(x_)
            acc = acc + trmod._sum_rightmost(ladj, event_dim - t.domain_dim)
            event_dim += t.codomain_dim - t.domain_dim
            x_ = canon(x_)
        return x_, acc
    return call_and_ladj


# (a) reshape canonicalization
trmod.ComposedTransform.call_and_ladj = make_variant(
    lambda v: v.reshape(-1).reshape(v.shape))
report("reshape-canon  ", jax.jit(lambda v: flow(None).log_prob(v))(x))

# (b) transpose round-trip
trmod.ComposedTransform.call_and_ladj = make_variant(
    lambda v: v.T.T if v.ndim == 2 else v)
report("transpose-rt   ", jax.jit(lambda v: flow(None).log_prob(v))(x))

trmod.ComposedTransform.call_and_ladj = orig_cl

# (c) chunked lax.map
def chunked(v):
    chunks = v.reshape(4, B // 4, D)
    return jax.lax.map(lambda c: flow(None).log_prob(c), chunks).reshape(-1)


report("chunked-4096   ", jax.jit(chunked)(x))

print("DONE", flush=True)
