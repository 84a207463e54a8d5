r"""REAL-data conditional-CNF head-to-head: label-conditional continuous
flow on UCI digits (one-hot context), reference zuko (torch CPU) vs
zuko_tpu through the round-5 batched-context fused CNF kernels.

End-to-end anchor for the batched-context CNF path: training runs the
density custom-VJP with the per-row folded first bias streamed through the
kernel (on TPU, the whole adaptive dopri45 per batch tile).

Same protocol as tools/real_data_parity_gf_cond.py; 15 epochs by default
(the reference CNF step is seconds of CPU autograd + odeint, the r3
convention for this family).

Usage: python tools/real_data_parity_cnf_cond.py [--epochs 15]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

p = argparse.ArgumentParser()
p.add_argument("--epochs", type=int, default=15)
p.add_argument("--skip-reference", action="store_true")
p.add_argument("--skip-ours", action="store_true")
p.add_argument("--cpu", action="store_true")
p.add_argument("--ref-seed", type=int, default=0)
args = p.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from zuko_tpu.data import digits_conditional

(xtr, ytr), (xva, yva), (xte, yte) = digits_conditional()
D, C = xtr.shape[1], ytr.shape[1]
print(f"digits-conditional: train {xtr.shape} ctx {C}", flush=True)

BATCH, LR = 256, 1e-3

# ---- reference side (torch CPU) -------------------------------------
if not args.skip_reference:
    sys.path.insert(0, "/root/reference")
    import torch
    import zuko

    torch.manual_seed(args.ref_seed)
    rflow = zuko.flows.CNF(D, C)
    opt = torch.optim.Adam(rflow.parameters(), lr=LR)
    tx, ty = torch.as_tensor(xtr), torch.as_tensor(ytr)
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        perm = torch.randperm(tx.shape[0])
        for i in range(0, tx.shape[0] - BATCH + 1, BATCH):
            sel = perm[i : i + BATCH]
            loss = -rflow(ty[sel]).log_prob(tx[sel]).mean()
            opt.zero_grad()
            loss.backward()
            opt.step()
    rt = time.perf_counter() - t0
    with torch.no_grad():
        r_val = -rflow(torch.as_tensor(yva)).log_prob(
            torch.as_tensor(xva)).mean().item()
        r_test = -rflow(torch.as_tensor(yte)).log_prob(
            torch.as_tensor(xte)).mean().item()
    print(f"reference (torch CPU):  val NLL {r_val:.3f}  test NLL"
          f" {r_test:.3f}  ({rt:.0f}s train)", flush=True)

# ---- zuko_tpu side --------------------------------------------------
if args.skip_ours:
    raise SystemExit(0)
import jax
import jax.numpy as jnp

print("zuko_tpu backend:", jax.default_backend(), flush=True)
from zuko_tpu.flows import CNF
from zuko_tpu.parallel import train_mle

flow = CNF(D, C, key=jax.random.PRNGKey(1))
t0 = time.perf_counter()
flow, losses = train_mle(
    flow, xtr, context=ytr, epochs=args.epochs, batch_size=BATCH, lr=LR,
    key=jax.random.PRNGKey(2), verbose=True,
)
zt = time.perf_counter() - t0


def nll(x, y):
    return -float(jnp.mean(flow(jnp.asarray(y)).log_prob(jnp.asarray(x))))


print(f"zuko_tpu ({jax.default_backend()}):  val NLL {nll(xva, yva):.3f}  "
      f"test NLL {nll(xte, yte):.3f}  ({zt:.0f}s train)", flush=True)
