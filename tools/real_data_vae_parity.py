r"""REAL-data VAE head-to-head: reference zuko (torch CPU) vs zuko_tpu on
binarized UCI digits — the reference tutorial's MNIST VAE protocol
(docs/tutorials/vae.ipynb: Gaussian encoder, Bernoulli decoder, MAF
prior, Adam 1e-3, batch 256, 64 epochs, -ELBO anchor ~65.8) transplanted
to the one real image dataset available offline. Architectures are
identical on both sides: encoder 64 -> 512 -> 512 -> 2*16, decoder
16 -> 512 -> 512 -> 64, MAF(16, transforms=3, hidden (256, 256)).

Usage: python tools/real_data_vae_parity.py [--epochs 64] [--cpu]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--epochs", type=int, default=64)
p.add_argument("--skip-reference", action="store_true")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from zuko_tpu.data import digits_binary

train, val, test = digits_binary()
PIXELS, LATENT, HID = train.shape[1], 16, 512
BATCH, LR = 256, 1e-3
N_EVAL = 16  # MC draws for the test ELBO
print(f"binary digits: train {train.shape} test {test.shape}", flush=True)

# ---- reference side (torch CPU, tutorial code shapes) ----------------
if not args.skip_reference:
    sys.path.insert(0, "/root/reference")
    import torch
    import torch.nn as nn
    from torch.distributions import Bernoulli, Independent, Normal
    import zuko

    torch.manual_seed(0)

    class GaussianModel(zuko.lazy.LazyDistribution):
        def __init__(self, features, context):
            super().__init__()
            self.hyper = nn.Sequential(
                nn.Linear(context, HID), nn.ReLU(),
                nn.Linear(HID, HID), nn.ReLU(),
                nn.Linear(HID, 2 * features),
            )

        def forward(self, c):
            mu, log_sigma = self.hyper(c).chunk(2, dim=-1)
            return Independent(Normal(mu, log_sigma.exp()), 1)

    class BernoulliModel(zuko.lazy.LazyDistribution):
        def __init__(self, features, context):
            super().__init__()
            self.hyper = nn.Sequential(
                nn.Linear(context, HID), nn.ReLU(),
                nn.Linear(HID, HID), nn.ReLU(),
                nn.Linear(HID, features),
            )

        def forward(self, c):
            return Independent(Bernoulli(torch.sigmoid(self.hyper(c))), 1)

    encoder = GaussianModel(LATENT, PIXELS)
    decoder = BernoulliModel(PIXELS, LATENT)
    prior = zuko.flows.MAF(LATENT, transforms=3,
                           hidden_features=(256, 256))

    def elbo_t(x):
        q = encoder(x)
        z = q.rsample()
        return decoder(z).log_prob(x) + prior().log_prob(z) - q.log_prob(z)

    params = (list(encoder.parameters()) + list(decoder.parameters())
              + list(prior.parameters()))
    opt = torch.optim.Adam(params, lr=LR)
    tr = torch.as_tensor(train)
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        perm = torch.randperm(tr.shape[0])
        for i in range(0, tr.shape[0] - BATCH + 1, BATCH):
            loss = -elbo_t(tr[perm[i : i + BATCH]]).mean()
            opt.zero_grad()
            loss.backward()
            opt.step()
    rt = time.perf_counter() - t0
    with torch.no_grad():
        te = torch.as_tensor(test)
        r_elbo = torch.stack(
            [elbo_t(te).mean() for _ in range(N_EVAL)]).mean().item()
    print(f"reference VAE (torch CPU):  test -ELBO {-r_elbo:.3f}"
          f"  ({rt:.0f}s train)", flush=True)

# ---- zuko_tpu side ---------------------------------------------------
import jax
import jax.numpy as jnp
import optax

print("zuko_tpu backend:", jax.default_backend(), flush=True)

from zuko_tpu.core import Module, combine, partition
from zuko_tpu.distributions import Bernoulli as JBernoulli
from zuko_tpu.distributions import DiagNormal, Independent as JIndependent
from zuko_tpu.flows import MAF
from zuko_tpu.nn import MLP


class VAE(Module):
    def __init__(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        self.encoder = MLP(PIXELS, 2 * LATENT, (HID, HID), key=k1)
        self.decoder = MLP(LATENT, PIXELS, (HID, HID), key=k2)
        self.prior = MAF(LATENT, 0, transforms=3,
                         hidden_features=(256, 256), key=k3)

    def elbo(self, x, key):
        mu, log_sigma = jnp.split(self.encoder(x), 2, axis=-1)
        q = DiagNormal(mu, jnp.exp(log_sigma))
        z, log_q = q.rsample_and_log_prob(key)
        log_p = JIndependent(JBernoulli(logits=self.decoder(z)), 1).log_prob(x)
        return log_p + self.prior(None).log_prob(z) - log_q


key = jax.random.PRNGKey(0)
vae = VAE(key)
params, static = partition(vae)
opt = optax.adam(LR)
opt_state = opt.init(params)

xs = jnp.asarray(train)
n = xs.shape[0]
n_steps = (n - BATCH + 1 + BATCH - 1) // BATCH
n_batches = n // BATCH


@jax.jit
def epoch_step(params, opt_state, k):
    kp, ke = jax.random.split(k)
    perm = jax.random.permutation(kp, n)
    batches = xs[perm[: n_batches * BATCH]].reshape(n_batches, BATCH, PIXELS)

    def body(carry, inp):
        params, opt_state = carry
        xb, kb = inp

        def loss_fn(p):
            return -jnp.mean(combine(p, static).elbo(xb, kb))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    keys = jax.random.split(ke, n_batches)
    (params, opt_state), losses = jax.lax.scan(
        body, (params, opt_state), (batches, keys))
    return params, opt_state, jnp.mean(losses)


t0 = time.perf_counter()
k = jax.random.PRNGKey(1)
for epoch in range(args.epochs):
    k, sub = jax.random.split(k)
    params, opt_state, loss = epoch_step(params, opt_state, sub)
jt = time.perf_counter() - t0

vae = combine(params, static)
te = jnp.asarray(test)
keys = jax.random.split(jax.random.PRNGKey(2), N_EVAL)
z_elbo = float(jnp.mean(jnp.stack(
    [vae.elbo(te, kk).mean() for kk in keys])))
print(f"zuko_tpu VAE ({jax.default_backend()}):  test -ELBO {-z_elbo:.3f}"
      f"  ({jt:.0f}s train, final epoch loss {float(loss):.3f})",
      flush=True)
print("DONE", flush=True)
