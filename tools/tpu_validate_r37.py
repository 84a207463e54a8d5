r"""On-hardware validation batch 37: full-covariance GMM on a
WELL-conditioned model (r36 showed the r34/r35 'errors' were f32
garbage-vs-garbage on an ill-conditioned random-init L — cond ~1e8 at
D=43; no miscompile). Compare the inverse-then-matmul formulation on TPU
against f64 numpy ground truth at b=65536, plus the conditioning of a
REAL moment-matched init (digits kmeans)."""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import combine, partition, named_parameters
from zuko_tpu.mixtures import GMM

D, K, B = 43, 10, 65536
rng = np.random.RandomState(0)
L_np = np.stack([
    np.eye(D) + 0.1 * np.tril(rng.randn(D, D), k=-1)
    + np.diag(0.2 * rng.rand(D))
    for _ in range(K)
]).astype(np.float32)
loc_np = rng.randn(K, D).astype(np.float32) * 0.5
logits_np = rng.randn(K).astype(np.float32)

from zuko_tpu.distributions import Mixture, MultivariateNormal

dist = Mixture(
    MultivariateNormal(jnp.asarray(loc_np), scale_tril=jnp.asarray(L_np)),
    jnp.asarray(logits_np),
)
x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
lp_t = np.asarray(jax.jit(dist.log_prob)(x), np.float64)

# f64 numpy ground truth
x64 = np.asarray(x, np.float64)
L64 = L_np.astype(np.float64)
comp = []
for k in range(K):
    diff = x64 - loc_np[k].astype(np.float64)
    z = np.linalg.solve(L64[k], diff.T).T
    hld = np.sum(np.log(np.abs(np.diag(L64[k]))))
    comp.append(-0.5 * np.sum(z**2, -1) - hld
                - 0.5 * D * np.log(2 * np.pi))
comp = np.stack(comp, -1) + (
    logits_np.astype(np.float64)
    - np.log(np.sum(np.exp(logits_np.astype(np.float64))))
)
m = comp.max(-1, keepdims=True)
lp64 = (m + np.log(np.sum(np.exp(comp - m), -1, keepdims=True)))[:, 0]

d = np.abs(lp_t - lp64)
print(f"well-conditioned full-cov Mixture b={B} vs f64 truth: max"
      f" {d.max():.3e} median {np.median(d):.3e}", flush=True)

# conditioning of a REAL kmeans init on digits (first 20 dims)
from zuko_tpu.data import digits_dataset

train, _, _ = digits_dataset()
g = GMM(20, components=10, covariance_type="full",
        key=jax.random.PRNGKey(0))
g = g.initialize(train[:, :20], strategy="kmeans",
                 key=jax.random.PRNGKey(2))
dd = g(None)
Lr = np.asarray(dd.base.scale_tril, np.float64)
conds = [np.linalg.cond(Lr[k]) for k in range(Lr.shape[0])]
print(f"digits kmeans-init L cond: min {min(conds):.1e} max"
      f" {max(conds):.1e}", flush=True)
xd = jnp.asarray(np.tile(train[:, :20], (46, 1))[:B])
lp_t = np.asarray(jax.jit(dd.log_prob)(xd), np.float64)[:2048]
x64 = np.asarray(xd[:2048], np.float64)
loc64 = np.asarray(dd.base.loc, np.float64)
lg64 = np.asarray(dd.logits, np.float64)
comp = []
for k in range(Lr.shape[0]):
    diff = x64 - loc64[k]
    z = np.linalg.solve(Lr[k], diff.T).T
    hld = np.sum(np.log(np.abs(np.diag(Lr[k]))))
    comp.append(-0.5 * np.sum(z**2, -1) - hld
                - 0.5 * 20 * np.log(2 * np.pi))
comp = np.stack(comp, -1) + (lg64 - np.log(np.exp(lg64).sum()))
m = comp.max(-1, keepdims=True)
lp64 = (m + np.log(np.sum(np.exp(comp - m), -1, keepdims=True)))[:, 0]
d = np.abs(lp_t - lp64)
print(f"digits kmeans full-cov GMM b={B} vs f64 truth: max {d.max():.3e}"
      f" median {np.median(d):.3e}", flush=True)

print("DONE", flush=True)
