r"""Batch 65: end-to-end VI TRAINING QUALITY through the fused IFT tier on
hardware — the reverse-KL tutorial protocol (inverted NSF on the ring
energy, reference anchor: final-epoch loss ~= -1.5888 +- 0.018,
docs/tutorials/reverse_kl.ipynb cell 9). Gradient parity is pinned
elsewhere; this checks the thing users care about: training CONVERGES to
the same place through the fused solve + IFT backward."""
import os, sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
from zuko_tpu.core import combine, partition
from zuko_tpu.data import ring_energy
from zuko_tpu.flows import NSF, Flow
from zuko_tpu.ops.dispatch import FusedAutoregressiveFlow
from zuko_tpu.parallel import make_reverse_kl_step

key = jax.random.PRNGKey(0)
flow = NSF(2, 0, transforms=3, key=key)
inv = Flow(flow.transform.inv, flow.base)
params, static = partition(inv)
d = combine(params, static)(None)
print("dispatched:", type(d).__name__,
      "(fused IFT rsample)" if isinstance(d, FusedAutoregressiveFlow)
      else "(XLA)", flush=True)

init_fn, step_fn = make_reverse_kl_step(static, ring_energy,
                                        n_samples=256, lr=1e-3)
state = init_fn(params)
steps_per_epoch, epochs = 256, 8

@jax.jit
def epoch_fn(state, key):
    keys = jax.random.split(key, steps_per_epoch)
    def body(st, k):
        st, loss = step_fn(st, k)
        return st, loss
    return jax.lax.scan(body, state, keys)

t0 = time.perf_counter()
for e in range(epochs):
    state, losses = epoch_fn(state, jax.random.fold_in(key, e))
losses = np.asarray(losses)
print(f"final-epoch loss {losses.mean():.4f} +- {losses.std():.3f}  "
      f"(reference anchor -1.5888 +- 0.018)  wall {time.perf_counter()-t0:.1f}s",
      flush=True)
assert abs(losses.mean() - (-1.5888)) < 0.1, losses.mean()
print("done", flush=True)
