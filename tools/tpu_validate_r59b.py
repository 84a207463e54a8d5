r"""On-hardware batch 59b: diagnose the r59 NAF/UNAF f32 gradient
deviation. Three gradients of the same reverse-KL loss: (a) TPU f32 via
the fused IFT tier, (b) CPU f32 via the XLA scan-inverse path, (c) CPU
f64 via the XLA path (ground truth). If (a) and (b) sit at comparable
distance from (c), the r59 number is inherent f32 solver noise shared by
both paths, not an IFT defect."""
import os, sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"
from zuko_tpu.core import combine, partition
from zuko_tpu.flows import NAF, UNAF

cpu = jax.devices("cpu")[0]

def ring(v):
    r = jnp.linalg.norm(v, axis=-1)
    return -((r - 2.0) ** 2) / 0.5

def grads(name, flow, batch):
    params, static = partition(flow)

    def loss_fn(p, key):
        d = combine(p, static)(None)
        xs, lq = d.rsample_and_log_prob(key, (batch,))
        return jnp.mean(lq) - jnp.mean(ring(xs))

    k0 = jax.random.PRNGKey(3)
    g_tpu = jax.tree_util.tree_map(
        np.asarray, jax.jit(jax.grad(loss_fn))(params, k0))

    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "0"
    with jax.default_device(cpu):
        p_cpu = jax.tree_util.tree_map(lambda a: jax.device_put(a, cpu),
                                       params)
        g_f32 = jax.tree_util.tree_map(
            np.asarray, jax.grad(loss_fn)(p_cpu, jax.device_put(k0, cpu)))
        import jax.numpy as jnp2
        jax.config.update("jax_enable_x64", True)
        p64 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, p_cpu)
        g_f64 = jax.tree_util.tree_map(
            np.asarray, jax.grad(loss_fn)(p64, jax.device_put(k0, cpu)))
        jax.config.update("jax_enable_x64", False)
    os.environ["ZUKO_TPU_FUSED_DISPATCH"] = "1"

    for lbl, g in [("TPU-f32-IFT", g_tpu), ("CPU-f32-XLA", g_f32)]:
        worst_rel, worst_abs = 0.0, 0.0
        gnorm_num, gnorm_den = 0.0, 0.0
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(g_f64)):
            a = np.asarray(a, np.float64); b = np.asarray(b, np.float64)
            worst_abs = max(worst_abs, np.abs(a - b).max())
            worst_rel = max(worst_rel,
                            np.abs(a - b).max() / (np.abs(b).max() + 1e-12))
            gnorm_num += float(((a - b) ** 2).sum())
            gnorm_den += float((b ** 2).sum())
        print(f"{name} {lbl} vs CPU-f64: worst-leaf rel {worst_rel:.3e}  "
              f"worst abs {worst_abs:.3e}  global rel-L2 "
              f"{(gnorm_num / max(gnorm_den, 1e-30)) ** 0.5:.3e}", flush=True)

grads("NAF", NAF(6, 0, transforms=3, key=jax.random.PRNGKey(0)), 16384)
grads("UNAF", UNAF(6, 0, transforms=3, signal=8,
                   key=jax.random.PRNGKey(1)), 4096)
print("done", flush=True)
