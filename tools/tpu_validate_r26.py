r"""On-hardware validation batch 26: dissect the big-batch composed
density INSIDE one jitted program at (16384, 43) — per-layer x and ladj
vs CPU (r25: error median 21.76 identical across barriers/remat/
precision/einsum variants — deterministic structure-stable wrongness,
suspect one layer's contribution). Plus batch threshold sweep and
double-run determinism."""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.flows import NSF

D, B = 43, 16384
cpu = jax.devices("cpu")[0]
x = jax.random.normal(jax.random.PRNGKey(3), (B, D))
flow = NSF(D, transforms=3, hidden_features=(64, 64),
           key=jax.random.PRNGKey(0))
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"

trs = [lt(None) for lt in flow.transform.transforms]


def breakdown(v):
    outs = []
    for t in trs:
        v, ladj = t.call_and_ladj(v)
        outs.append((v, ladj))  # ladj already reduced to (B,)
    return outs


out_t = jax.jit(breakdown)(x)
with jax.default_device(cpu):
    out_c = breakdown(jax.device_put(x, cpu))

for i, ((xt, lt), (xc, lc)) in enumerate(zip(out_t, out_c)):
    dx = np.abs(np.asarray(xt)[:2048] - np.asarray(xc)[:2048]).max()
    dl = np.abs(np.asarray(lt)[:2048] - np.asarray(lc)[:2048])
    print(f"layer{i} in-program: x max {dx:.3e}  ladj max {dl.max():.3e}"
          f" median {np.median(dl):.3e}", flush=True)

# determinism: same jit twice
lp1 = np.asarray(jax.jit(lambda v: flow(None).log_prob(v))(x))
lp2 = np.asarray(jax.jit(lambda v: flow(None).log_prob(v))(x + 0.0))
print(f"determinism (two runs): max {np.abs(lp1 - lp2).max():.3e}",
      flush=True)

# batch threshold sweep
with jax.default_device(cpu):
    lp_c = np.asarray(flow(None).log_prob(jax.device_put(x[:2048], cpu)))
for b in [2048, 4096, 8192, 12288, 16384]:
    lp_b = np.asarray(jax.jit(lambda v: flow(None).log_prob(v))(x[:b]))[:2048]
    d = np.abs(lp_b - lp_c)
    print(f"b={b:5d}: max {d.max():.3e} median {np.median(d):.3e}",
          flush=True)

del os.environ["ZUKO_TPU_FUSED_DISPATCH"]
print("DONE", flush=True)
