r"""REAL-data NLL head-to-head: reference zuko (torch CPU) vs zuko_tpu
(this framework, TPU) on the UCI handwritten-digits dataset — the only
real density-benchmark data available offline (shipped inside sklearn;
the environment has zero egress, so POWER/GAS/... cannot be fetched).

Identical protocol on both sides: same preprocessed splits
(`zuko_tpu.data.digits_dataset`: dequantized, z-scored, 1438/160/180),
same architecture (NSF: 3 transforms, 8 bins, hidden (64, 64)), same
optimizer (Adam 1e-3), same batch 256 and epoch count. The reference side
follows the tutorial recipe exactly (docs/tutorials/forward_kl.ipynb cell
9). Matching test NLL through entirely different code paths is the
correctness-at-scale anchor (VERDICT round-1, item 2, adapted to the
zero-egress environment).

Usage: python tools/real_data_parity.py [--epochs 30]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

p = argparse.ArgumentParser()
p.add_argument("--epochs", type=int, default=30)
p.add_argument("--skip-reference", action="store_true")
p.add_argument("--gmm", action="store_true",
               help="also run the GMM (K=10, full cov) head-to-head")
p.add_argument("--conditional", action="store_true",
               help="also run the label-conditional NSF head-to-head")
p.add_argument("--cpu", action="store_true",
               help="run the zuko_tpu side on CPU (leave the TPU free)")
args = p.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from zuko_tpu.data import digits_dataset

train, val, test = digits_dataset()
D = train.shape[1]
print(f"digits: train {train.shape} val {val.shape} test {test.shape}",
      flush=True)

CFG = dict(transforms=3, hidden_features=(64, 64))
BATCH, LR = 256, 1e-3

# ---- reference side (torch CPU) -------------------------------------
if not args.skip_reference:
    sys.path.insert(0, "/root/reference")
    import torch
    import zuko

    torch.manual_seed(0)
    rflow = zuko.flows.NSF(D, **CFG)
    opt = torch.optim.Adam(rflow.parameters(), lr=LR)
    tr = torch.as_tensor(train)
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        perm = torch.randperm(tr.shape[0])
        for i in range(0, tr.shape[0] - BATCH + 1, BATCH):
            x = tr[perm[i : i + BATCH]]
            loss = -rflow().log_prob(x).mean()
            opt.zero_grad()
            loss.backward()
            opt.step()
    rt = time.perf_counter() - t0
    with torch.no_grad():
        r_val = -rflow().log_prob(torch.as_tensor(val)).mean().item()
        r_test = -rflow().log_prob(torch.as_tensor(test)).mean().item()
    print(f"reference (torch CPU):  val NLL {r_val:.3f}  test NLL"
          f" {r_test:.3f}  ({rt:.0f}s train)", flush=True)

# ---- zuko_tpu side --------------------------------------------------
import jax

print("zuko_tpu backend:", jax.default_backend(), flush=True)
from zuko_tpu.flows import NSF
from zuko_tpu.parallel.train import train_mle

flow = NSF(D, **CFG, key=jax.random.PRNGKey(0))
t0 = time.perf_counter()
trained, losses = train_mle(
    flow, train, epochs=args.epochs, batch_size=BATCH, lr=LR,
    key=jax.random.PRNGKey(1),
)
jt = time.perf_counter() - t0
z_val = float(-jax.jit(lambda v: trained(None).log_prob(v).mean())(val))
z_test = float(-jax.jit(lambda v: trained(None).log_prob(v).mean())(test))
print(f"zuko_tpu ({jax.default_backend()}):  val NLL {z_val:.3f}"
      f"  test NLL {z_test:.3f}  ({jt:.0f}s train,"
      f" final epoch loss {float(losses[-1]):.3f})", flush=True)

# ---- GMM head-to-head (second model family) -------------------------
if args.gmm:
    K = 10  # ten digit classes

    if not args.skip_reference:
        torch.manual_seed(0)
        # diagonal covariances on both sides: with 1457 points in 64-d a
        # full-covariance mixture is ill-posed — the reference's own
        # moment-matched init fails cholesky (kmeans AND random
        # strategies), and MLE training collapses components to
        # unbounded likelihood
        rg = zuko.mixtures.GMM(D, components=K, covariance_type="diagonal")
        rg.initialize(torch.as_tensor(train), strategy="kmeans")
        opt = torch.optim.Adam(rg.parameters(), lr=LR)
        t0 = time.perf_counter()
        for epoch in range(args.epochs):
            perm = torch.randperm(tr.shape[0])
            for i in range(0, tr.shape[0] - BATCH + 1, BATCH):
                loss = -rg().log_prob(tr[perm[i : i + BATCH]]).mean()
                opt.zero_grad()
                loss.backward()
                opt.step()
        rt = time.perf_counter() - t0
        with torch.no_grad():
            rg_test = -rg().log_prob(torch.as_tensor(test)).mean().item()
        print(f"reference GMM (torch CPU):  test NLL {rg_test:.3f}"
              f"  ({rt:.0f}s train)", flush=True)

    from zuko_tpu.mixtures import GMM

    g = GMM(D, components=K, covariance_type="diagonal",
            key=jax.random.PRNGKey(0))
    g = g.initialize(train, strategy="kmeans", key=jax.random.PRNGKey(2))
    t0 = time.perf_counter()
    g_tr, _ = train_mle(g, train, epochs=args.epochs, batch_size=BATCH,
                        lr=LR, key=jax.random.PRNGKey(1))
    gt = time.perf_counter() - t0
    zg_test = float(-jax.jit(lambda v: g_tr(None).log_prob(v).mean())(test))
    print(f"zuko_tpu GMM ({jax.default_backend()}):  test NLL {zg_test:.3f}"
          f"  ({gt:.0f}s train)", flush=True)

# ---- label-conditional NSF head-to-head -----------------------------
if args.conditional:
    from zuko_tpu.data import digits_conditional

    (ctr, ytr), (cva, yva), (cte, yte) = digits_conditional()
    print(f"conditional digits: train {ctr.shape} labels {ytr.shape}",
          flush=True)

    if not args.skip_reference:
        torch.manual_seed(0)
        rcf = zuko.flows.NSF(D, context=10, **CFG)
        opt = torch.optim.Adam(rcf.parameters(), lr=LR)
        trc = torch.as_tensor(ctr)
        tyc = torch.as_tensor(ytr)
        t0 = time.perf_counter()
        for epoch in range(args.epochs):
            perm = torch.randperm(trc.shape[0])
            for i in range(0, trc.shape[0] - BATCH + 1, BATCH):
                idx = perm[i : i + BATCH]
                loss = -rcf(tyc[idx]).log_prob(trc[idx]).mean()
                opt.zero_grad()
                loss.backward()
                opt.step()
        rt = time.perf_counter() - t0
        with torch.no_grad():
            rc_test = -rcf(torch.as_tensor(yte)).log_prob(
                torch.as_tensor(cte)).mean().item()
        print(f"reference conditional NSF (torch CPU):  test NLL"
              f" {rc_test:.3f}  ({rt:.0f}s train)", flush=True)

    cflow = NSF(D, context=10, **CFG, key=jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    c_tr, closs = train_mle(
        cflow, ctr, context=ytr, epochs=args.epochs, batch_size=BATCH,
        lr=LR, key=jax.random.PRNGKey(1),
    )
    ct = time.perf_counter() - t0
    zc_test = float(-jax.jit(
        lambda v, y: c_tr(y).log_prob(v).mean())(cte, yte))
    print(f"zuko_tpu conditional NSF ({jax.default_backend()}):  test NLL"
          f" {zc_test:.3f}  ({ct:.0f}s train)", flush=True)

print("DONE", flush=True)
