"""Ragged-shape realism benchmark (round-4 verdict item 2).

Every e2e dataset so far was shape-uniform (64^3 x 1024, 128^3 x 64, one
512^3), but real regridded AMR output is dozens of distinct ragged shapes
with skewed box counts — and in this design every distinct (shape, pack)
is its own jit (30-50 s remote compile on this rig, seconds on a real
host), its own lane-pack geometry, and its own padding quantum
(batching.plan_batches + cap_pack).  This builds a >= 1 GiB dataset with
>= 40 distinct shapes (Zipf-ish counts, odd and non-Pallas dims, 2
levels, 2 timesteps), runs CLI compress + decompress COLD (fresh
compilation cache — every shape pays its compile) and WARM (persistent
cache hit — the steady state of any production run), and records:

- per-shape jit compile count + total compile seconds (parsed from
  JAX_LOG_COMPILES output), cold vs warm;
- padding-waste fraction (padded slots / real slots, and padded bytes),
  computed from the real plan_batches/cap_pack geometry;
- e2e walls and GB/s next to the uniform-shape rows of
  e2e_compress.json.

Usage: nohup /opt/venv/bin/python scripts/bench_ragged.py &
Writes bench_results/ragged_e2e.json.
"""

import json
import os
import re
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHM = "/dev/shm/wtc_ragged"
OUT = "bench_results/ragged_e2e.json"
PY = sys.executable

DIM_CHOICES = [8, 9, 12, 16, 17, 20, 24, 32, 33, 40, 48, 64, 80, 96, 128]


def build_shapes(n_shapes=44, target_bytes_per_t=550 << 20, seed=7):
    """[(dims, count, level)] — Zipf-ish counts over randomly drawn ragged
    shapes (odd dims included), the largest shapes topped up so one
    timestep carries ~target bytes."""
    rng = np.random.default_rng(seed)
    shapes = []
    seen = set()
    while len(shapes) < n_shapes:
        d = tuple(int(v) for v in rng.choice(DIM_CHOICES, 3))
        if d not in seen:
            seen.add(d)
            shapes.append(d)
    counts = [max(1, round(120 / (r + 1))) for r in range(n_shapes)]
    rng.shuffle(counts)                      # counts not correlated to size
    vols = [int(np.prod(s)) for s in shapes]
    total = sum(c * v * 4 for c, v in zip(counts, vols))
    # top up with the largest shapes until the byte target is met
    order = np.argsort(vols)[::-1]
    i = 0
    while total < target_bytes_per_t:
        j = int(order[i % 4])
        counts[j] += 1
        total += vols[j] * 4
        i += 1
    return [(shapes[i], counts[i], i % 2) for i in range(n_shapes)], total


def spiky(shape, n, rng):
    """~1%-kept boxes, vectorized per shape bucket."""
    a = (rng.standard_normal((n,) + shape).astype(np.float32)) * 1e-3
    mask = rng.random((n,) + shape) < 0.0125
    a[mask] = np.abs(rng.standard_normal(int(mask.sum()))
                     ).astype(np.float32) * 100
    return a


def write_dataset(root, shapes, n_times=2, seed=100):
    from wavelet_tpu.io import plotfile as pf

    for t in range(n_times):
        rng = np.random.default_rng(seed + t)
        per_level = {0: ([], [], []), 1: ([], [], [])}
        xoff = {0: 0, 1: 0}
        for dims, count, lev in shapes:
            boxes = spiky(dims, count, rng)
            bl, ll, dl = per_level[lev]
            for b in range(count):
                bl.append(boxes[b][None])          # 1 component
                ll.append((xoff[lev], 0, 0))
                dl.append(dims)
                xoff[lev] += dims[0]
        # level-1 domain is base*2, so base x must cover both layouts
        dom_x = max(1, xoff[0], -(-xoff[1] // 2))
        pf.write_plotfile(
            os.path.join(root, f"plt{800 + t:05d}"),
            [per_level[0][0], per_level[1][0]],
            [per_level[0][1], per_level[1][1]],
            [per_level[0][2], per_level[1][2]],
            ["f"], 0.1 * t, [0., 0., 0.], [1., 1., 1.], (2, 2, 2),
            (dom_x, 128, 128), [t, 2 * t])


def padding_stats(shapes):
    """Padding-waste of the REAL batch plan: slots and bytes added by
    cap_pack lane packing (no mesh here, pad_multiple=1 — single chip)."""
    from wavelet_tpu.kernels import haar_pallas
    from wavelet_tpu.runtime import batching

    real_slots = 0
    padded_slots = 0
    real_bytes = 0
    padded_bytes = 0
    per_shape = {}
    for dims, count, _lev in shapes:
        pack = haar_pallas.lane_pack_factor(dims)
        pack = batching.cap_pack(pack, count, dims[-1])
        n_pad = batching.pad_to_multiple(count, pack) if pack > 1 else count
        vol = int(np.prod(dims)) * 4
        real_slots += count
        padded_slots += n_pad
        real_bytes += count * vol
        padded_bytes += n_pad * vol
        per_shape[str(dims)] = {"count": count, "pack": pack,
                                "padded_to": n_pad}
    return {"real_slots": real_slots, "padded_slots": padded_slots,
            "slot_waste_fraction": round(padded_slots / real_slots - 1, 4),
            "real_bytes": real_bytes, "padded_bytes": padded_bytes,
            "byte_waste_fraction": round(padded_bytes / real_bytes - 1, 4),
            "per_shape": per_shape}


_COMPILE_RE = re.compile(
    r"Finished XLA compilation of jit\(([^)]*)\) in ([0-9.eE+-]+) sec")


def run_cli(args, cache_dir, log_path):
    env = dict(os.environ, WAVELET_TPU_CACHE=cache_dir,
               JAX_LOG_COMPILES="1")
    t0 = time.perf_counter()
    r = subprocess.run([PY, "-m", "wavelet_tpu.cli", *args],
                       cwd="/root/repo", env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    wall = time.perf_counter() - t0
    out = r.stdout.decode(errors="replace")
    with open(log_path, "w") as f:
        f.write(out)
    if r.returncode != 0:
        raise RuntimeError(f"CLI failed ({args[:2]}...): {out[-2000:]}")
    compiles = _COMPILE_RE.findall(out)
    return {"wall_seconds": round(wall, 2),
            "jit_compiles": len(compiles),
            "compile_seconds": round(sum(float(s) for _n, s in compiles),
                                     2)}


def main():
    shapes, bytes_per_t = build_shapes()
    n_times = 2
    input_bytes = bytes_per_t * n_times
    out = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
           "n_shapes": len(shapes), "timesteps": n_times,
           "input_bytes": input_bytes,
           "note": ("cold = fresh compilation cache (every distinct "
                    "(shape, pack) jit pays its remote compile: 30-50 s "
                    "each through the axon tunnel on this rig, seconds "
                    "on a real host); warm = persistent-cache hit, the "
                    "steady state of any production run")}
    out["padding"] = padding_stats(shapes)
    print("padding:", json.dumps({k: v for k, v in out["padding"].items()
                                  if k != "per_shape"}), flush=True)

    shutil.rmtree(SHM, ignore_errors=True)
    os.makedirs(SHM)
    t0 = time.perf_counter()
    write_dataset(SHM, shapes, n_times)
    out["dataset_write_seconds"] = round(time.perf_counter() - t0, 1)
    print("dataset written", out["dataset_write_seconds"], "s", flush=True)

    cache = os.path.join(SHM, "jaxcache")
    cargs = [f"datadir={SHM}", "minfile=plt00800",
             f"maxfile=plt{800 + n_times - 1:05d}", "minlevel=0",
             "maxlevel=1", "components=f", "keep=0.999", "codec=raw",
             "archive=bundle", "prefetch=1",
             f"compresseddir={SHM}/arch/", "-c"]
    dargs = [f"compresseddir={SHM}/arch/", f"out={SHM}/regen/",
             "prefetch=1", "outprec=f32", "-d"]
    for phase in ("cold", "warm"):
        if phase == "warm":
            shutil.rmtree(f"{SHM}/arch", ignore_errors=True)
        row = run_cli(cargs, cache, f"/tmp/ragged_c_{phase}.log")
        row["e2e_gbps"] = round(input_bytes / 1e9 / row["wall_seconds"], 4)
        out[f"compress_{phase}"] = row
        print(f"compress {phase}:", json.dumps(row), flush=True)
    for phase in ("cold", "warm"):
        if phase == "warm":
            shutil.rmtree(f"{SHM}/regen", ignore_errors=True)
        row = run_cli(dargs, cache, f"/tmp/ragged_d_{phase}.log")
        row["e2e_gbps"] = round(input_bytes / 1e9 / row["wall_seconds"], 4)
        out[f"decompress_{phase}"] = row
        print(f"decompress {phase}:", json.dumps(row), flush=True)

    os.makedirs("bench_results", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "padding"},
                     indent=2))
    shutil.rmtree(SHM, ignore_errors=True)


if __name__ == "__main__":
    main()
