r"""The "basics" tour — every building block the reference's intro
tutorial walks through (docs/tutorials/basics.ipynb), in TPU-native form:
distributions, transforms, NormalizingFlow, writing a custom lazy
(conditional) model, assembling autoregressive transforms by hand,
inspecting triangular Jacobians, and composing a custom flow recipe.

Run: python examples/basics.py
"""

import sys

sys.path.insert(0, ".")

import jax

# honor an explicit JAX_PLATFORMS request: this environment pre-imports
# jax from sitecustomize, which freezes platform selection before the env
# var can act — re-assert it so `JAX_PLATFORMS=cpu python examples/...`
# (the documented invocation) actually runs on CPU
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import optax

from zuko_tpu.core import combine, partition
from zuko_tpu.distributions import BoxUniform, Normal, NormalizingFlow
from zuko_tpu.flows import MAF, GeneralCouplingTransform, MaskedAutoregressiveTransform
from zuko_tpu.lazy import (
    Flow,
    LazyDistribution,
    UnconditionalDistribution,
    UnconditionalTransform,
)
from zuko_tpu.nn import MLP
from zuko_tpu.transforms import (
    AffineTransform,
    MonotonicAffineTransform,
    MonotonicRQSTransform,
    RotationTransform,
    SigmoidTransform,
)

key = jax.random.PRNGKey(0)

# ---- distributions & transforms (basics.ipynb cells 3-7) ------------
distribution = Normal(jnp.asarray(0.0), jnp.asarray(1.0))
x = distribution.sample(key)
print("x ~ N(0,1):", float(x), " log p:", float(distribution.log_prob(x)))

transform = MonotonicAffineTransform(jnp.asarray(3.0), jnp.asarray(2.0))
y = transform(x)
print("affine fwd/inv round-trip:", float(x), "->", float(y), "->",
      float(transform.inverse(y)))

flow = NormalizingFlow(transform, distribution)
xs = flow.sample(jax.random.PRNGKey(1))
print("pushforward sample:", float(xs), " log p:",
      float(flow.log_prob(xs)))


# ---- a custom conditional (lazy) model (cells 13-19) ----------------
class GaussianModel(LazyDistribution):
    def __init__(self, key):
        self.hyper = MLP(3, 2, (64, 64), key=key)

    def forward(self, c):
        mu, log_sigma = jnp.split(self.hyper(c), 2, axis=-1)
        return Normal(mu[..., 0], jnp.exp(log_sigma[..., 0]))


kx, kc, km = jax.random.split(key, 3)
xd = jax.random.normal(kx, (1024,))
cd = xd[:, None] + jax.random.normal(kc, (1024, 3))

model = GaussianModel(km)
params, static = partition(model)
opt = optax.adam(1e-3)
state = opt.init(params)


@jax.jit
def step(params, state):
    def loss_fn(p):
        return -jnp.mean(combine(p, static)(cd).log_prob(xd))

    loss, g = jax.value_and_grad(loss_fn)(params)
    up, state = opt.update(g, state, params)
    return optax.apply_updates(params, up), state, loss


for i in range(64):
    params, state, loss = step(params, state)
print(f"custom conditional model trained: NLL {float(loss):.3f}")

# ---- assembling an autoregressive transform by hand (cells 21-23) ---
mat = MaskedAutoregressiveTransform(
    features=5,
    context=0,
    univariate=MonotonicRQSTransform,
    shapes=([8], [8], [7]),  # 8-bin spline parameters
    hidden_features=(64, 128, 256),
    key=jax.random.PRNGKey(2),
)
f = mat(None)
x5 = jax.random.normal(jax.random.PRNGKey(3), (5,))
print("MAT inverse round-trip max err:",
      float(jnp.abs(f.inverse(f(x5)) - x5).max()))
J = jax.jacobian(f)(x5)
print("Jacobian strictly triangular above diag:",
      bool(jnp.allclose(jnp.triu(J, 1), 0.0)))

# ---- the flow zoo and a custom recipe (cells 26-28) -----------------
maf = MAF(features=5, context=8, transforms=3, key=jax.random.PRNGKey(4))
c8 = jax.random.normal(jax.random.PRNGKey(5), (8,))
print("MAF(5|8) sample:", maf(c8).sample(jax.random.PRNGKey(6)).shape)

custom = Flow(
    [
        UnconditionalTransform(
            AffineTransform, jnp.asarray(1 / 512), jnp.asarray(1 / 256),
            buffer=True,
        ),  # [0, 255] -> ]0, 1[
        UnconditionalTransform(lambda: SigmoidTransform().inv),  # logit
        MaskedAutoregressiveTransform(
            features=5, context=8, passes=5, key=jax.random.PRNGKey(7)
        ),
        UnconditionalTransform(
            RotationTransform, jax.random.normal(jax.random.PRNGKey(8), (5, 5))
        ),
        GeneralCouplingTransform(
            features=5, context=8, key=jax.random.PRNGKey(9)
        ),
    ],
    base=UnconditionalDistribution(
        BoxUniform, -jnp.ones(5), jnp.ones(5), buffer=True
    ),
)
d = custom(c8)
xq = d.sample(jax.random.PRNGKey(10), (4,))
print("custom recipe: samples", xq.shape, " log p:",
      d.log_prob(xq).shape, " finite:",
      bool(jnp.isfinite(d.log_prob(xq)).all()))
