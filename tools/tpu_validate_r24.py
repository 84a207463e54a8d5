r"""On-hardware validation batch 24: per-layer + per-order isolation of
the XLA miscompile at (16384, 43) (r23: per-layer barriers did NOT fix
the composed density and worsened t=2 — so a single layer is likely
broken standalone; r22 only cleared layer 0, the ascending-order one)."""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF
from zuko_tpu.flows.autoregressive import MaskedAutoregressiveTransform
from zuko_tpu.transforms import MonotonicRQSTransform
from zuko_tpu.flows.spline import _RQS_SHAPES
from functools import partial

D, B = 43, 16384
cpu = jax.devices("cpu")[0]
x = jax.random.normal(jax.random.PRNGKey(3), (B, D))

flow = NSF(D, transforms=3, hidden_features=(64, 64),
           key=jax.random.PRNGKey(0))

for i in range(3):
    tr = flow.transform.transforms[i](None)
    l_t = np.asarray(jax.jit(lambda v: tr.call_and_ladj(v)[1])(x))[:2048]
    with jax.default_device(cpu):
        l_c = np.asarray(tr.call_and_ladj(jax.device_put(x[:2048], cpu))[1])
    d = np.abs(l_t - l_c)
    print(f"layer{i} standalone ladj: max {d.max():.3e} median"
          f" {np.median(d):.3e}", flush=True)

# fresh single MATs, ascending vs descending order
rqs = partial(MonotonicRQSTransform, slope=1e-3)
for name, order in [("asc", np.arange(D)), ("desc", np.arange(D)[::-1])]:
    mat = MaskedAutoregressiveTransform(
        features=D, order=order, univariate=rqs, shapes=_RQS_SHAPES(8),
        hidden_features=(64, 64), key=jax.random.PRNGKey(5),
    )
    tr = mat(None)
    l_t = np.asarray(jax.jit(lambda v: tr.call_and_ladj(v)[1])(x))[:2048]
    with jax.default_device(cpu):
        l_c = np.asarray(tr.call_and_ladj(jax.device_put(x[:2048], cpu))[1])
    d = np.abs(l_t - l_c)
    print(f"fresh MAT {name}: max {d.max():.3e} median {np.median(d):.3e}",
          flush=True)

print("DONE", flush=True)
