r"""Pod-slice scaling-efficiency measurement (the >=80% north star).

Runs the two production training paths end-to-end over growing device
counts and reports throughput + scaling efficiency:

* **data-parallel MLE** — batch sharded over the ``data`` axis, grad psum
  over ICI (``make_mle_step`` + ``shard_batch``);
* **sample-sharded reverse-KL VI** — the fused rsample tier with the sample
  axis sharded (``make_reverse_kl_step(mesh=...)``).

Single-host (or the 8-device virtual CPU mesh) it sweeps device subsets
1, 2, 4, ..., N and prints an efficiency table; on a real multi-host pod
slice every process must see the same global mesh, so it measures the full
slice only and efficiency is reported against a supplied single-device
baseline (``--baseline-json`` from a prior 1-chip run).

Virtual-mesh validation (no TPU needed):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/pod_scaling.py --steps 30

Multi-host pod-slice launch (one command per host; on Cloud TPU the
coordinator/process args are auto-detected from the metadata server):

    python tools/pod_scaling.py --distributed --steps 100 \
        --baseline-json PODSCALE_1chip.json

Writes ``PODSCALE.json`` with rows
``{path, devices, throughput, unit, efficiency}``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

# honor an explicit JAX_PLATFORMS request (sitecustomize pre-imports jax,
# freezing platform selection before the env var can act)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp


def _build_flow(features, key):
    from zuko_tpu.flows import NSF

    return NSF(features, 0, transforms=3, hidden_features=(64, 64), key=key)


def _time_steps(step_fn, state, args_fn, steps):
    """Wall-time ``steps`` calls; pipelined (block only at the end), after a
    2-step warmup. Returns (state, seconds)."""
    for i in range(2):
        state, loss = step_fn(state, *args_fn(i))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = step_fn(state, *args_fn(i + 2))
    jax.block_until_ready(loss)
    return state, time.perf_counter() - t0


def measure_mle(mesh, features, batch, steps, key):
    from zuko_tpu import partition
    from zuko_tpu.parallel import shard_batch
    from zuko_tpu.parallel.train import make_mle_step

    kf, kd = jax.random.split(key)
    flow = _build_flow(features, kf)
    params, static = partition(flow)
    init_fn, step_fn = make_mle_step(static, conditional=False)
    x = shard_batch(mesh, jax.random.normal(kd, (batch, features)))

    with mesh:
        state, dt = _time_steps(step_fn, init_fn(params), lambda i: (x,), steps)
    return batch * steps / dt  # examples/s


def measure_vi(mesh, features, n_samples, steps, key):
    from zuko_tpu import partition
    from zuko_tpu.parallel.train import make_reverse_kl_step

    kf, kk = jax.random.split(key)
    flow = _build_flow(features, kf)
    params, static = partition(flow)

    def log_energy(x):
        r = jnp.linalg.norm(x, axis=-1)
        return -((r - 2.0) ** 2) / 0.5

    init_fn, step_fn = make_reverse_kl_step(
        static, log_energy, n_samples=n_samples, mesh=mesh
    )

    with mesh:
        state, dt = _time_steps(
            step_fn, init_fn(params),
            lambda i: (jax.random.fold_in(kk, i),), steps,
        )
    return n_samples * steps / dt  # samples/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--n-samples", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize first")
    ap.add_argument("--baseline-json", default=None,
                    help="1-chip PODSCALE.json for multi-host efficiency")
    ap.add_argument("--out", default="PODSCALE.json")
    args = ap.parse_args()

    if args.distributed:
        from zuko_tpu.parallel import distributed_init

        info = distributed_init()
        print(f"process {info['process_id']}/{info['process_count']}, "
              f"{info['global_devices']} global devices")

    from zuko_tpu.parallel import make_mesh

    n = len(jax.devices())
    multihost = jax.process_count() > 1
    if multihost:
        counts = [n]  # every process must join the same global mesh
    else:
        counts = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= n]
        if counts[-1] != n:
            counts.append(n)

    key = jax.random.PRNGKey(0)
    rows = []
    base = {"mle": None, "vi": None}
    if args.baseline_json:
        with open(args.baseline_json) as f:
            for row in json.load(f):
                if row["devices"] == 1:
                    base[row["path"]] = row["throughput"]

    for d in counts:
        mesh = make_mesh(model=1, data=d, devices=jax.devices()[:d])
        thr_mle = measure_mle(mesh, args.features, args.batch, args.steps, key)
        thr_vi = measure_vi(mesh, args.features, args.n_samples, args.steps, key)
        for path, thr in (("mle", thr_mle), ("vi", thr_vi)):
            if base[path] is None and d == counts[0] and counts[0] == 1:
                base[path] = thr
            eff = thr / (d * base[path]) if base[path] else None
            rows.append({
                "path": path, "devices": d, "throughput": thr,
                "unit": "examples/s" if path == "mle" else "samples/s",
                "efficiency": eff,
            })

    if jax.process_index() == 0:
        print(f"\n{'path':>5} {'dev':>4} {'throughput':>14} {'efficiency':>10}")
        for r in rows:
            eff = f"{r['efficiency']:.1%}" if r["efficiency"] is not None else "n/a"
            print(f"{r['path']:>5} {r['devices']:>4} "
                  f"{r['throughput']:>14,.0f} {eff:>10}")
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"\nwrote {args.out}")
        ok = [r for r in rows if r["efficiency"] is not None and r["devices"] > 1]
        if ok:
            worst = min(r["efficiency"] for r in ok)
            virtual = (jax.devices()[0].platform == "cpu"
                       and jax.process_count() == 1)
            if virtual:
                print(f"worst scaling efficiency: {worst:.1%} — NOT a "
                      "scaling measurement: all virtual CPU devices share "
                      "ONE physical host, so total compute is fixed and "
                      "per-device efficiency must fall. This run validates "
                      "the protocol end-to-end; the 80% north-star verdict "
                      "requires real chips (see docs/pod_launch.md).")
            else:
                print(f"worst scaling efficiency: {worst:.1%} "
                      f"({'PASS' if worst >= 0.8 else 'BELOW'} the 80% "
                      "north star)")


if __name__ == "__main__":
    main()
