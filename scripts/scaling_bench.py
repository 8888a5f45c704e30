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

    # speed of light per device (v5e HBM ~819 GB/s; stage traffic ~2x input)
    sol_input_gbps = 819.0 / 2.0

    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= len(devices)]
    base_rate = None
    for s in sizes:
        mesh = mesh_lib.data_mesh(devices[:s])
        n = args.per_device_boxes * s
        step = distributed.make_parity_compress_step(mesh)

        # cache-proof methodology (CLAUDE.md: the axon layer can serve
        # repeated identical executions from a cache): every timed call gets
        # a FRESH input, all inputs are sharded + synced before the clock
        # starts, and the reported rate is the median of 3 reps
        def one_rep(seed):
            xs = [mesh_lib.shard_batch(
                np.random.default_rng(seed + i)
                .standard_normal((n, d, d, d)).astype(np.float32), mesh)
                for i in range(args.iters)]
            jax.block_until_ready(xs)
            t0 = time.perf_counter()
            outs = [step(x) for x in xs]
            jax.block_until_ready(outs)
            return (time.perf_counter() - t0) / args.iters

        nbytes = n * d * d * d * 4
        rates = []
        for rep in range(3):
            dt = one_rep(1000 * rep)
            rate = nbytes / 1e9 / dt
            if (devices[0].platform != "cpu"
                    and rate / s > sol_input_gbps):
                continue  # faster than HBM: cache-contaminated rep
            rates.append(rate)
        rate = float(np.median(rates)) if rates else float("nan")
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * s)
        results["meshes"][str(s)] = {
            "gbps_total": round(rate, 3),
            "gbps_per_device": round(rate / s, 3),
            "scaling_efficiency": round(eff, 3),
            "reps_used": len(rates),
        }
        print(f"mesh={s:2d}: {rate:8.2f} GB/s total, "
              f"{rate/s:7.2f} GB/s/dev, efficiency {eff:5.1%}")

    # Quantitative ICI expectation (why >= 85% scaling efficiency is the
    # structurally expected outcome on a real pod, even though virtual CPU
    # devices cannot demonstrate it): parity mode is embarrassingly
    # parallel — the compiled program contains NO cross-device collectives
    # (per-item thresholds; XLA inserts nothing but the initial shard
    # placement).  Global mode all-reduces one fixed 4096-bin histogram
    # (16 KiB as two int32 limb vectors = 32 KiB) + two scalars per
    # compiled step, INDEPENDENT of data volume.
    n_ref = args.per_device_boxes * 8
    step_bytes = n_ref * d * d * d * 4
    coll_bytes = 2 * 4096 * 4 + 8
    results["ici_analysis"] = {
        "parity_mode_collective_bytes_per_step": 0,
        "global_mode_collective_bytes_per_step": coll_bytes,
        "data_bytes_per_step_8dev_example": step_bytes,
        "global_mode_collective_fraction": round(coll_bytes / step_bytes, 8),
        "note": ("collective volume is O(1) in data size; at 1 GiB/step the "
                 "all-reduce is ~3e-5 of the data moved, so ICI time is "
                 "negligible and scaling is bounded by per-chip HBM rate, "
                 "not communication"),
    }

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
