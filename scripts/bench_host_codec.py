"""Standalone benchmark of the host pack/unpack stage (native/wtc_codec.cpp).

The end-to-end compress rate is ``min(device_rate, host_pack_rate)`` once
the two stages overlap (pipeline/compress.py overlaps them with a pack
thread), and the host stage — threshold + RLE + xz encode + file write,
the reference's hot loop #2 (compressor.cpp:260-290) — is the actual
bottleneck on any machine with a real TPU attached.  This script measures
it in isolation:

- input-GB/s per thread count at realistic kept fractions (real AMR data
  keeps ~1-5% of coefficients at keep=0.999),
- xz preset sensitivity (the interop format pins preset 6; cheaper presets
  are an extension trade-off),
- the implied core count needed to keep up with the measured device rate.

Writes bench_results/host_codec.json and prints a summary.  CPU-only: run
anywhere (no TPU needed).
"""

from __future__ import annotations

import json
import lzma
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wavelet_tpu import native                      # noqa: E402
from wavelet_tpu.io import archive                  # noqa: E402
from wavelet_tpu.core import rle                    # noqa: E402


def make_coeffs(n_items: int, m: int, kept_frac: float, seed: int = 0):
    """Wavelet-like coefficients: mostly zeros after thresholding, kept
    values lognormal (heavy-tailed like real detail coefficients)."""
    rng = np.random.default_rng(seed)
    flat = np.zeros((n_items, m), np.float32)
    k = max(1, int(m * kept_frac))
    for i in range(n_items):
        idx = np.sort(rng.choice(m, size=k, replace=False))
        flat[i, idx] = (rng.lognormal(0, 2, k).astype(np.float32)
                        * rng.choice([-1, 1], k).astype(np.float32))
    # threshold 0 keeps exactly the nonzeros
    t32 = np.zeros(n_items, np.float32)
    return flat, t32


def bench_native_pack(flat, t32, dims, threads, out_dir):
    n, m = flat.shape
    paths = [os.path.join(out_dir, f"pk-{i}.xz") for i in range(n)]
    t0 = time.perf_counter()
    total = native.pack_batch(flat, t32, dims, paths, n_threads=threads)
    dt = time.perf_counter() - t0
    return flat.nbytes / dt / 1e9, total, paths


def bench_native_unpack(paths, m, threads):
    t0 = time.perf_counter()
    out, _shapes = native.unpack_batch(paths, m, n_threads=threads)
    dt = time.perf_counter() - t0
    return out.nbytes / dt / 1e9


def bench_python_pack(flat, t32, dims, out_dir):
    """The fallback path: NumPy RLE + stdlib lzma, single-threaded."""
    n, m = flat.shape
    t0 = time.perf_counter()
    total = 0
    for i in range(n):
        mask = np.abs(flat[i]) > t32[i]
        runs, vals = rle.rle_encode_mask(mask, flat[i])
        blob = archive.xz_compress(archive.serialize_payload(dims, runs, vals))
        with open(os.path.join(out_dir, f"py-{i}.xz"), "wb") as f:
            f.write(blob)
        total += len(blob)
    dt = time.perf_counter() - t0
    return flat.nbytes / dt / 1e9, total


def bench_preset_sensitivity(flat, t32, dims):
    """Pure-encode rate and size per xz preset (no file I/O, one payload
    stream): what preset 6 costs vs cheaper settings."""
    payloads = []
    for i in range(len(flat)):
        mask = np.abs(flat[i]) > t32[i]
        runs, vals = rle.rle_encode_mask(mask, flat[i])
        payloads.append(archive.serialize_payload(dims, runs, vals))
    raw_in = flat.nbytes
    rows = {}
    for preset in (0, 1, 3, 6, 9):
        filt = [{"id": lzma.FILTER_LZMA2, "preset": preset}]
        t0 = time.perf_counter()
        sizes = [len(lzma.compress(p, format=lzma.FORMAT_XZ,
                                   check=lzma.CHECK_CRC64, filters=filt))
                 for p in payloads]
        dt = time.perf_counter() - t0
        rows[str(preset)] = {
            "encode_gbps_input": round(raw_in / dt / 1e9, 4),
            "compressed_bytes": int(sum(sizes)),
            "payload_bytes": int(sum(len(p) for p in payloads)),
        }
    return rows


def main():
    if not native.available():
        print(json.dumps({"error": "native codec unavailable"}))
        return 1
    ncpu = os.cpu_count() or 1
    dims = (64, 64, 64)
    m = int(np.prod(dims))
    n_items = 64                      # 64 MiB of coefficients per config
    thread_counts = sorted({1, 2, ncpu})
    results = {"cpu_count": ncpu, "dims": list(dims), "n_items": n_items,
               "item_bytes": m * 4, "pack": {}, "unpack": {},
               "python_pack": {}, "preset_sensitivity": {}}
    for kept in (0.01, 0.05):
        flat, t32 = make_coeffs(n_items, m, kept)
        key = f"kept={kept}"
        results["pack"][key] = {}
        results["unpack"][key] = {}
        with tempfile.TemporaryDirectory() as d:
            for nt in thread_counts:
                gbps, out_bytes, paths = bench_native_pack(
                    flat, t32, dims, nt, d)
                # best of 2 (first run pays page-cache warmup)
                gbps2, _, _ = bench_native_pack(flat, t32, dims, nt, d)
                gbps = max(gbps, gbps2)
                results["pack"][key][f"threads={nt}"] = {
                    "input_gbps": round(gbps, 4),
                    "output_bytes": int(out_bytes),
                    "ratio_pct": round(100.0 * out_bytes / flat.nbytes, 3),
                }
                ug = bench_native_unpack(paths, m, nt)
                ug = max(ug, bench_native_unpack(paths, m, nt))
                results["unpack"][key][f"threads={nt}"] = {
                    "output_gbps": round(ug, 4)}
            pg, _ = bench_python_pack(flat[:16], t32[:16], dims, d)
            results["python_pack"][key] = {"input_gbps_1thread": round(pg, 4)}
        if kept == 0.01:
            results["preset_sensitivity"] = bench_preset_sensitivity(
                flat[:16], t32[:16], dims)

    # implied scaling analysis against the measured device rate
    dev_rate = 95.0  # GB/s/chip, BASELINE.md device codec (conservative end)
    pack1 = results["pack"]["kept=0.01"]["threads=1"]["input_gbps"]
    packN = results["pack"]["kept=0.01"][f"threads={ncpu}"]["input_gbps"]
    per_core = packN / ncpu
    results["analysis"] = {
        "device_compress_gbps_chip": dev_rate,
        "pack_gbps_per_core_kept1pct": round(per_core, 4),
        "cores_to_match_device_rate": round(dev_rate / per_core, 1),
        "cores_for_10gbps_north_star": round(10.0 / per_core, 1),
        "e2e_gbps_with_this_host": round(min(dev_rate, packN), 4),
        "note": ("end-to-end compress = min(device, host pack) once "
                 "overlapped; pack scales ~linearly in cores (independent "
                 "items, no shared state)"),
        "pack1_gbps": pack1,
    }
    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/host_codec.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["analysis"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
