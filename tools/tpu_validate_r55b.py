r"""On-hardware batch 55b: UNAF sampling rate at the FINAL hybrid rule
(GL-4 coarse / GL-8 solve Newton x3 / GL-16 fine final step) — the r55
winner amended to land on the GL-16 root after the f64 parity driver
showed the pure-GL-8 root carries a 2.3e-5 gap vs the XLA GL-32 path."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
from zuko_tpu.flows import UNAF
from zuko_tpu.ops import naf_fused as nafm

uflow = UNAF(6, 0, transforms=3, signal=8, key=jax.random.PRNGKey(2))
NS = 16384
j = jax.jit(lambda k: nafm.fused_naf_sample(uflow, k, (NS,)))
xs0 = j(jax.random.PRNGKey(9)); xs0.block_until_ready()
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    outs = [j(jax.random.PRNGKey(i)) for i in range(3)]
    outs[-1].block_until_ready()
    best = max(best, NS * 3 / (time.perf_counter() - t0))
lp = jax.jit(lambda v: nafm.fused_naf_log_prob(uflow, v))(xs0)
print(f"hybrid 4c/8n*3+16n/4N: {best/1e3:.1f}K samples/s  density finite "
      f"{bool(jnp.all(jnp.isfinite(lp)))}", flush=True)
print("done", flush=True)
