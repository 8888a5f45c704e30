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


def bench_native_pack(flat, t32, dims, threads, out_dir, codec="xz",
                      preset=6):
    n, m = flat.shape
    paths = [os.path.join(out_dir, f"pk-{i}.xz") for i in range(n)]
    offsets = np.arange(n, dtype=np.int64) * m
    t0 = time.perf_counter()
    total = native.pack_strided(flat, t32, dims, paths, 1, m, m, offsets,
                                n_threads=threads, codec=codec, preset=preset)
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


def _plotfile_write_gbps() -> float:
    """The measured f32-outprec plotfile write rate (plotfile_io.json),
    the decompress chain's final host stage; inf when unmeasured so the
    min() simply omits it."""
    try:
        with open("bench_results/plotfile_io.json") as f:
            d = json.load(f)
        return min(c["write_f32"]["src_gbps"] for c in d["cases"].values())
    except Exception:  # noqa: BLE001
        return float("inf")


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
    # scratch on tmpfs when available: the measured quantity is the CODEC
    # rate (threshold+RLE+encode); disk small-file latency is a property of
    # the rig's filesystem, reported separately below as fs_overhead
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    for kept in (0.01, 0.05):
        flat, t32 = make_coeffs(n_items, m, kept)
        key = f"kept={kept}"
        results["pack"][key] = {}
        results["unpack"][key] = {}
        with tempfile.TemporaryDirectory(dir=shm) as d:
            for nt in thread_counts:
                gbps, out_bytes, paths = bench_native_pack(
                    flat, t32, dims, nt, d)
                # best of 3 (first run pays page-cache warmup)
                for _ in range(2):
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
            # --- raw-codec unpack, warm vs cold destination buffers ---
            # The round-3 artifact's "2 GB/s/core unpack" conflated xz
            # decode and page-fault costs.  Honest split: warm buffers
            # (production with the BufferArena) vs cold np.empty pages,
            # plus the zero-fill roofline the stage is bound by.
            rawpaths = [os.path.join(d, f"r{i}.wtc")
                        for i in range(n_items)]
            offsets = np.arange(n_items, dtype=np.int64) * m
            native.pack_strided(flat, t32, dims, rawpaths, 1, m, m,
                                offsets, codec="raw")
            results["unpack_raw"] = results.get("unpack_raw", {})
            results["unpack_raw"][key] = {}
            out = np.empty((n_items, m), np.float32)
            for nt in thread_counts:
                warm = 0.0
                for _ in range(4):
                    t0 = time.perf_counter()
                    native.unpack_strided(rawpaths, out, 1, m, m, offsets,
                                          n_threads=nt, codec="raw")
                    warm = max(warm,
                               out.nbytes / (time.perf_counter() - t0) / 1e9)
                cold = 0.0
                for _ in range(3):
                    o2 = np.empty((n_items, m), np.float32)
                    t0 = time.perf_counter()
                    native.unpack_strided(rawpaths, o2, 1, m, m, offsets,
                                          n_threads=nt, codec="raw")
                    cold = max(cold,
                               o2.nbytes / (time.perf_counter() - t0) / 1e9)
                results["unpack_raw"][key][f"threads={nt}"] = {
                    "warm_gbps": round(warm, 3), "cold_gbps": round(cold, 3)}
            if key == "kept=0.01":
                buf = np.empty(n_items * m, np.float32)
                best = 0.0
                for _ in range(3):
                    t0 = time.perf_counter()
                    buf.fill(0)
                    best = max(best, buf.nbytes /
                               (time.perf_counter() - t0) / 1e9)
                results["unpack_raw"]["fill_roofline_1core_gbps"] = round(
                    best, 3)
            pg, _ = bench_python_pack(flat[:16], t32[:16], dims, d)
            results["python_pack"][key] = {"input_gbps_1thread": round(pg, 4)}
            # extension codecs: raw (no entropy stage) and xz preset 1
            for codec, preset, label in (("raw", 6, "raw"), ("xz", 1, "xz1")):
                g1, ob, _ = bench_native_pack(flat, t32, dims, ncpu, d,
                                              codec=codec, preset=preset)
                for _ in range(2):
                    g2, _, _ = bench_native_pack(flat, t32, dims, ncpu, d,
                                                 codec=codec, preset=preset)
                    g1 = max(g1, g2)
                results["pack"][key][f"codec={label},threads={ncpu}"] = {
                    "input_gbps": round(g1, 4),
                    "output_bytes": int(ob),
                    "ratio_pct": round(100.0 * ob / flat.nbytes, 3),
                }
        if shm and kept == 0.01:
            # same fastest config on the real filesystem: the delta is
            # pure small-file overhead (open+write+rename per item), the
            # cost the bundle archive mode exists to remove
            with tempfile.TemporaryDirectory() as ddisk:
                g1, _, _ = bench_native_pack(flat, t32, dims, ncpu, ddisk,
                                             codec="raw")
                g2, _, _ = bench_native_pack(flat, t32, dims, ncpu, ddisk,
                                             codec="raw")
                results["fs_overhead"] = {
                    "raw_pack_gbps_on_disk": round(max(g1, g2), 4),
                    "raw_pack_gbps_on_tmpfs": results["pack"][key][
                        f"codec=raw,threads={ncpu}"]["input_gbps"],
                    "files": n_items,
                }
        if kept == 0.01:
            results["preset_sensitivity"] = bench_preset_sensitivity(
                flat[:16], t32[:16], dims)

    # implied scaling analysis against the measured device rate
    dev_rate = 95.0  # GB/s/chip, BASELINE.md device codec (conservative end)
    pack1 = results["pack"]["kept=0.01"]["threads=1"]["input_gbps"]
    packN = results["pack"]["kept=0.01"][f"threads={ncpu}"]["input_gbps"]
    per_core = packN / ncpu
    raw_rate = results["pack"]["kept=0.01"][
        f"codec=raw,threads={ncpu}"]["input_gbps"]
    raw_per_core = raw_rate / ncpu
    results["analysis"] = {
        "device_compress_gbps_chip": dev_rate,
        "pack_gbps_per_core_kept1pct": round(per_core, 4),
        "cores_to_match_device_rate": round(dev_rate / per_core, 1),
        "cores_for_10gbps_north_star": round(10.0 / per_core, 1),
        "raw_codec_gbps_per_core": round(raw_per_core, 4),
        "raw_codec_cores_for_10gbps": round(10.0 / raw_per_core, 1),
        "e2e_gbps_with_this_host": round(min(dev_rate, packN), 4),
        "decompress_colocated_projection_gbps": round(min(
            30.8,                                     # device scatter stage
            results["unpack_raw"]["kept=0.01"][
                f"threads={ncpu}"]["warm_gbps"],      # arena keeps it warm
            _plotfile_write_gbps(),                   # measured, f32 outprec
        ), 3),
        "decompress_note": ("decompress e2e = min(device inverse, raw "
                            "unpack, plotfile write, link); the plotfile "
                            "writer is the binding host stage on this "
                            "4-core box — see plotfile_io.json and the "
                            "BASELINE.md e2e section"),
        "note": ("end-to-end compress = min(device, host pack) once "
                 "overlapped; pack scales ~linearly in cores (independent "
                 "items, no shared state).  With the AVX2 keep-scan the "
                 "codec=raw extension packs ~3 GB/s/core at realistic kept "
                 "fractions — ~3 cores/chip reach the 10 GB/s north star, "
                 "and a real v5e host (~14 vCPU/chip on v5e-8) is device-"
                 "bound, not host-bound.  The reference-compatible xz "
                 "preset 6 stays LZMA-bound (~0.15 GB/s/core, ~70 cores "
                 "for 10 GB/s) — entropy coding, not the scan, is its "
                 "cost."),
        "pack1_gbps": pack1,
    }
    results["bundle_vs_files"] = bench_bundle_vs_files()
    results["pipeline_e2e"] = bench_overlapped_pipeline()
    results["xz_delta"] = bench_xz_delta()

    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/host_codec.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["analysis"]))
    print(json.dumps(results["pipeline_e2e"]))
    return 0


def bench_xz_delta():
    """xz6 vs xz6+delta8 size/rate on SMOOTH-field coefficients (where the
    delta filter's win lives: correlated float bit patterns) and on random
    values (its documented worst case)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tempfile

    from wavelet_tpu.io import archive
    from wavelet_tpu.runtime import engine as eng_mod

    d = 64
    n = 8
    boxes = np.empty((n, d, d, d), np.float32)
    for b in range(n):
        boxes[b] = np.fromfunction(
            lambda i, j, k: np.sin(0.1 * i + 0.02 * b) * np.cos(0.07 * j)
            + 0.01 * k, (d, d, d)).astype(np.float32)
    eng = eng_mod.CodecEngine()
    flat, t32 = eng.compress_batch_raw(boxes, 0.9)
    m = flat.shape[1]
    rand_flat, rand_t32 = make_coeffs(n, m, 0.05, seed=9)
    out = {}
    for label, (fl, t3) in (("smooth", (flat, t32)),
                            ("random", (rand_flat, rand_t32))):
        row = {}
        shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
        for dname, delta in (("xz6", 0), ("xz6_delta8", 8)):
            preset = archive.pack_preset(6, delta)
            with tempfile.TemporaryDirectory(dir=shm) as dd:
                g, ob, _ = bench_native_pack(
                    fl.reshape(n, -1), t3, (d, d, d),
                    os.cpu_count(), dd, codec="xz", preset=preset)
                row[dname] = {"input_gbps": round(g, 4),
                              "output_bytes": int(ob)}
        row["delta_size_ratio"] = round(
            row["xz6_delta8"]["output_bytes"] / row["xz6"]["output_bytes"],
            4)
        out[label] = row
    return out


def bench_bundle_vs_files():
    """archive=bundle vs per-file layout in the many-small-boxes regime
    (real AMR levels hold thousands of small boxes): same member bytes, one
    container per timestep instead of one file per item.  Measured ON DISK
    deliberately — the per-file open/write/rename cost is what the bundle
    removes."""
    from wavelet_tpu.runtime import batching, engine as eng_mod

    n_items, dims = 2048, (16, 16, 16)
    m = int(np.prod(dims))
    flat, t32 = make_coeffs(n_items, m, 0.01, seed=3)
    items = [batching.WorkItem(t=0, level=0, comp_idx=0, box=b)
             for b in range(n_items)]
    batch = batching.ShapeBatch(items=items, shape=dims,
                                data=flat.reshape((n_items,) + dims),
                                n_valid=n_items)
    out = {"items": n_items, "dims": list(dims),
           "input_bytes": int(flat.nbytes)}
    for fmt in ("files", "bundle"):
        best = 0.0
        for _ in range(3):
            with tempfile.TemporaryDirectory() as d:
                packer = eng_mod.HostPacker(codec="raw", archive_format=fmt)
                t0 = time.perf_counter()
                packer.pack(d, batch, t32)
                packer.close_bundles()
                dt = time.perf_counter() - t0
                best = max(best, flat.nbytes / dt / 1e9)
        out[fmt + "_gbps"] = round(best, 4)
    out["speedup"] = round(out["bundle_gbps"] / out["files_gbps"], 2)
    return out


def bench_overlapped_pipeline():
    """The REAL overlapped device-codec + host-pack loop
    (pipeline/compress.py _pack_dense_or_sparse) end to end on this host,
    with the device stage on CPU: demonstrates the overlap machinery and
    puts a measured number on 'e2e = min(device, host-pack)'.  Smooth data
    (realistic coefficient decay) so keep=0.999 keeps a few percent."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tempfile

    from wavelet_tpu.pipeline import compress as cmod
    from wavelet_tpu.runtime import batching, engine as eng_mod

    n, d = 48, 64
    boxes = np.empty((n, d, d, d), np.float32)
    for b in range(n):
        boxes[b] = np.fromfunction(
            lambda i, j, k: np.sin(0.1 * i + 0.03 * b) * np.cos(0.07 * j)
            + 0.01 * k, (d, d, d)).astype(np.float32)
    eng = eng_mod.CodecEngine()
    # pick the keep whose kept fraction lands nearest the realistic 1-5%
    # regime for this data (the per-box rule's kept fraction is data-
    # dependent; real AMR fields at keep=0.999 keep a few percent)
    keep = 0.999
    kept = 1.0
    for cand in (0.999, 0.99, 0.97, 0.9, 0.8):
        _flat, mask = eng.compress_batch(boxes[:4], cand)
        kf = float(mask.mean())
        keep, kept = cand, kf
        if kf <= 0.05:
            break
    out = {"keep": keep, "kept_fraction": round(kept, 5),
           "boxes": n, "dims": [d, d, d], "input_bytes": int(boxes.nbytes)}
    for codec in ("xz", "raw"):
        packer = eng_mod.HostPacker(codec=codec)
        items = [(batching.WorkItem(t=0, level=0, comp_idx=0, box=b),
                  boxes[b]) for b in range(n)]
        with tempfile.TemporaryDirectory() as tdir:
            batches = batching.plan_batches(items, pack_fn=eng.pack_factor,
                                            max_batch_bytes=16 << 20)
            t0 = time.perf_counter()
            _nf, ib, ob, _d2h = cmod._pack_dense_or_sparse(
                batches, eng, packer, tdir, keep, "dense")
            dt = time.perf_counter() - t0
        out[f"codec={codec}"] = {
            "e2e_input_gbps": round(ib / dt / 1e9, 4),
            "output_ratio_pct": round(100.0 * ob / ib, 3)}
    return out


if __name__ == "__main__":
    sys.exit(main())
