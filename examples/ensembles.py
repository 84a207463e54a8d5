r"""Deep flow ensembles via ``jax.vmap`` over stacked parameters.

Modules are pytrees, so an E-member ensemble of flows evaluates (and
trains) in ONE compiled program — no torch equivalent; the reference
would loop Python-side over E separate modules. Ensemble disagreement
(the per-point std of member log-densities) is the classic epistemic
uncertainty signal for density models.

Run: python examples/ensembles.py [--members 8] [--epochs 10]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import optax

from zuko_tpu.core import combine, partition
from zuko_tpu.data import two_moons
from zuko_tpu.flows import NSF


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--members", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--samples", type=int, default=4096)
    args = parser.parse_args()

    key = jax.random.PRNGKey(0)
    kf, ke = jax.random.split(key)
    x, _ = two_moons(args.samples)
    x = jnp.asarray(x, jnp.float32)

    # E independently-initialized members, stacked into one params pytree
    members = [
        NSF(2, 0, transforms=3, hidden_features=(32, 32), key=k)
        for k in jax.random.split(kf, args.members)
    ]
    static = partition(members[0])[1]
    stacked = jax.tree_util.tree_map(
        lambda *a: jnp.stack(a), *[partition(m)[0] for m in members]
    )

    # one optimizer over the whole ensemble; vmapped loss — E gradients,
    # E Adam states, one XLA program
    opt = optax.adam(1e-3)
    opt_state = opt.init(stacked)

    def member_loss(p, xb):
        return -jnp.mean(combine(p, static)(None).log_prob(xb))

    @jax.jit
    def epoch(stacked, opt_state, x):
        def mean_loss(stacked):
            return jnp.mean(jax.vmap(member_loss, in_axes=(0, None))(
                stacked, x))

        loss, g = jax.value_and_grad(mean_loss)(stacked)
        updates, opt_state = opt.update(g, opt_state, stacked)
        return optax.apply_updates(stacked, updates), opt_state, loss

    for e in range(args.epochs):
        stacked, opt_state, loss = epoch(stacked, opt_state, x)
        if e % max(1, args.epochs // 5) == 0 or e == args.epochs - 1:
            print(f"epoch {e}: ensemble mean NLL {float(loss):.4f}")

    # epistemic uncertainty: member disagreement on- vs off-manifold
    @jax.jit
    def member_lps(stacked, pts):
        return jax.vmap(
            lambda p: combine(p, static)(None).log_prob(pts))(stacked)

    on_manifold = x[:256]
    off_manifold = jax.random.uniform(
        ke, (256, 2), minval=-4.0, maxval=4.0)
    lp_on = member_lps(stacked, on_manifold)     # (E, 256)
    lp_off = member_lps(stacked, off_manifold)
    dis_on = float(jnp.mean(jnp.std(lp_on, axis=0)))
    dis_off = float(jnp.mean(jnp.std(lp_off, axis=0)))
    print(f"ensemble disagreement (std of member log p): "
          f"on-manifold {dis_on:.3f}  off-manifold {dis_off:.3f}")
    assert dis_off > dis_on, "off-manifold disagreement should dominate"
    print("ok: epistemic signal separates on/off manifold")


if __name__ == "__main__":
    main()
