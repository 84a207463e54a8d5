r"""On-hardware validation batch 36: is `solve_triangular` itself broken
on this TPU stack? (r35: full-cov GMM wrong by ~1e6 at ALL batch sizes
through BOTH the batched-solve and inverse-then-matmul formulations;
both route through lax.linalg.triangular_solve; diagonal GMM, which
avoids it, is exact.) Probe the op on the GMM's actual factors, and an
explicit forward-substitution inverse as the replacement."""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.mixtures import GMM

cpu = jax.devices("cpu")[0]
gmm = GMM(43, components=10, covariance_type="full",
          key=jax.random.PRNGKey(0))
dist = gmm(None)
# Mixture of MultivariateNormal: pull the component scale_tril
base = dist.base if hasattr(dist, "base") else dist
L = np.asarray(base.base.scale_tril if hasattr(base, "base")
               else base.scale_tril)
print("L shape:", L.shape, flush=True)
Lj = jnp.asarray(L)

eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=Lj.dtype), Lj.shape)
inv_tpu = np.asarray(jax.jit(
    lambda a, b: jax.scipy.linalg.solve_triangular(a, b, lower=True)
)(Lj, eye))
with jax.default_device(cpu):
    inv_cpu = np.asarray(jax.scipy.linalg.solve_triangular(
        jax.device_put(Lj, cpu), jax.device_put(eye, cpu), lower=True))
d = np.abs(inv_tpu - inv_cpu)
print(f"solve_triangular(L, I) TPU vs CPU: max {d.max():.3e} median"
      f" {np.median(d):.3e}", flush=True)

# residual check against exact: L @ inv should be I
res_tpu = np.abs(np.einsum("kij,kjl->kil", L, inv_tpu)
                 - np.eye(L.shape[-1])).max()
res_cpu = np.abs(np.einsum("kij,kjl->kil", L, inv_cpu)
                 - np.eye(L.shape[-1])).max()
print(f"residual |L@inv - I|: tpu {res_tpu:.3e} cpu {res_cpu:.3e}",
      flush=True)
print("diag range:", np.abs(np.diagonal(L, axis1=-2, axis2=-1)).min(),
      np.abs(np.diagonal(L, axis1=-2, axis2=-1)).max(), flush=True)


# forward-substitution inverse (pure mul/add, no linalg custom call)
def tri_inv_lower(L):
    D = L.shape[-1]
    rows = []
    for i in range(D):
        e = jnp.zeros(L.shape[:-2] + (D,), L.dtype).at[..., i].set(1.0)
        acc = e
        for j in range(i):
            acc = acc - L[..., i, j : j + 1] * rows[j]
        rows.append(acc / L[..., i, i : i + 1])
    return jnp.stack(rows, axis=-2)


inv_fs = np.asarray(jax.jit(tri_inv_lower)(Lj))
d = np.abs(inv_fs - inv_cpu)
res_fs = np.abs(np.einsum("kij,kjl->kil", L, inv_fs)
                - np.eye(L.shape[-1])).max()
print(f"fwd-subst inverse TPU vs CPU: max {d.max():.3e}  residual"
      f" {res_fs:.3e}", flush=True)

print("DONE", flush=True)
