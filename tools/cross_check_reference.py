r"""Cross-implementation equivalence: load the PyTorch reference's NSF weights
into zuko-tpu's NSF and compare log_prob / sampling transforms numerically.

This is the strongest correctness artifact: identical parameters must produce
identical densities (up to float32 roundoff). Run on CPU:

    JAX_PLATFORMS=cpu python tools/cross_check_reference.py
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "/root/reference")

import numpy as np


def main():
    import torch

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)

    from zuko.flows import NSF as TorchNSF  # reference

    from zuko_tpu.core import update_parameters
    from zuko_tpu.flows import NSF

    features, context, transforms = 5, 3, 3

    torch.manual_seed(0)
    ref = TorchNSF(features, context, transforms=transforms)
    ref.eval()

    mine = NSF(features, context, transforms=transforms, key=jax.random.PRNGKey(0))

    # --- port weights: reference MaskedMLP layer i -> mine hyper.layers ------
    updates = {}
    for t in range(transforms):
        ref_hyper = ref.transform.transforms[t].hyper
        ref_linears = [m for m in ref_hyper if hasattr(m, "weight")]
        base = f"transform.transforms.{t}.hyper.layers"
        n_linear = 0
        my_layers = mine.transform.transforms[t].hyper.layers
        for j, layer in enumerate(my_layers):
            if not hasattr(layer, "weight"):
                continue
            rl = ref_linears[n_linear]
            n_linear += 1
            updates[f"{base}.{j}.weight"] = jnp.asarray(
                rl.weight.detach().numpy()
            )
            updates[f"{base}.{j}.bias"] = jnp.asarray(rl.bias.detach().numpy())
            # masks must agree exactly
            mask_ref = rl.mask.detach().numpy()
            mask_mine = np.asarray(layer.mask)
            assert np.array_equal(mask_ref.astype(bool), mask_mine.astype(bool)), (
                f"mask mismatch at transform {t} layer {j}"
            )
        assert n_linear == len(ref_linears)

    mine = update_parameters(mine, updates)

    # --- compare -------------------------------------------------------------
    rng = np.random.RandomState(42)
    x = rng.randn(256, features).astype(np.float32)
    c = rng.randn(256, context).astype(np.float32)

    with torch.no_grad():
        lp_ref = ref(torch.from_numpy(c)).log_prob(torch.from_numpy(x)).numpy()
    lp_mine = np.asarray(mine(jnp.asarray(c)).log_prob(jnp.asarray(x)))

    err = np.abs(lp_ref - lp_mine)
    rel = err / np.maximum(np.abs(lp_ref), 1.0)
    print(f"log_prob  max abs err: {err.max():.3e}   max rel err: {rel.max():.3e}")

    # forward transform equivalence
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(c)).transform(torch.from_numpy(x)).numpy()
    y_mine = np.asarray(mine(jnp.asarray(c)).transform(jnp.asarray(x)))
    terr = np.abs(y_ref - y_mine).max()
    print(f"transform max abs err: {terr:.3e}")

    # inverse equivalence
    with torch.no_grad():
        z_ref = ref(torch.from_numpy(c)).transform.inv(torch.from_numpy(y_ref)).numpy()
    z_mine = np.asarray(
        mine(jnp.asarray(c)).transform.inv(jnp.asarray(y_mine))
    )
    ierr = np.abs(z_ref - z_mine).max()
    print(f"inverse   max abs err: {ierr:.3e}")

    ok = err.max() < 5e-4 and terr < 5e-4 and ierr < 5e-4
    print("EQUIVALENT" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
