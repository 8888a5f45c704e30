"""Scaling-efficiency benchmark over a device mesh (BASELINE.json config 5).

Measures the sharded compress step (forward + per-item absmax, and the
global-histogram variant) at mesh sizes 1..N and reports efficiency
relative to linear scaling.  On this rig only one real TPU chip is
reachable, so by default the run uses the virtual CPU mesh
(``--platform cpu --devices 8``) to validate the *sharding structure*; on a
real pod slice the same script measures ICI scaling.

Usage:
    python scripts/scaling_bench.py [--devices 8] [--platform cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--per-device-boxes", type=int, default=8)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="bench_results/scaling.json")
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import numpy as np
    import jax

    if args.platform == "cpu":
        # the axon sitecustomize may have imported jax before this script
        # body ran; env vars alone are then too late (cf. tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    from wavelet_tpu.runtime import distributed, mesh as mesh_lib

    devices = jax.devices()
    d = args.dim
    rng = np.random.default_rng(0)
    results = {"platform": devices[0].platform, "dim": d,
               "per_device_boxes": args.per_device_boxes, "meshes": {}}
    if devices[0].platform == "cpu":
        results["note"] = (
            "virtual CPU devices share the host's physical cores, so "
            "absolute efficiency here is NOT meaningful — this mode "
            "validates the sharded program's structure; run on a real "
            "pod slice for ICI scaling numbers")

    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= len(devices)]
    base_rate = None
    for s in sizes:
        mesh = mesh_lib.data_mesh(devices[:s])
        n = args.per_device_boxes * s
        batch = rng.standard_normal((n, d, d, d)).astype(np.float32)
        sharded = mesh_lib.shard_batch(batch, mesh)
        step = distributed.make_parity_compress_step(mesh)
        out = step(sharded)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(sharded)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        rate = batch.nbytes / 1e9 / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * s)
        results["meshes"][str(s)] = {
            "gbps_total": round(rate, 3),
            "gbps_per_device": round(rate / s, 3),
            "scaling_efficiency": round(eff, 3),
        }
        print(f"mesh={s:2d}: {rate:8.2f} GB/s total, "
              f"{rate/s:7.2f} GB/s/dev, efficiency {eff:5.1%}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
