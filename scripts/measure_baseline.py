"""Measure the BASELINE.json configs and record results.

Usage: python scripts/measure_baseline.py [--out bench_results/measured.json]

Covers:
  1. plt00074, level 0, all components, keep=0.999, estimate mode
  2. plt00074->plt00075, levels 0-1, full compress+decompress round trip
     (byte-identity checked against the fixtures)
  3. keep sweep {0.99, 0.999, 0.9999} on fixture + synthetic data
  4. synthetic large AMR set (1000 boxes), box + global threshold modes

The C++ reference cannot be built in this environment (its dependency
bootstrapper downloads sources; the sandbox has no egress), so reference
quality numbers are established structurally instead: the transform,
threshold and payload bytes are bit-identical by construction (tested), and
the fixture round trip regenerates byte-identical plotfiles — i.e. RMSE
parity is exact and size parity is within xz-encoder-version noise.
"""

import argparse
import filecmp
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wavelet_tpu.io import plotfile as pf
from wavelet_tpu.core import metrics
from wavelet_tpu.pipeline import Config, compress_run, decompress_run, estimate_run
from wavelet_tpu.runtime import debug

debug.apply_platform_env()
debug.enable_compilation_cache()

FIXTURES = "/root/reference/tests"


def dirs_identical(p1, p2):
    for root, _d, names in os.walk(p1):
        rel = os.path.relpath(root, p1)
        for n in names:
            b = os.path.join(p2, rel, n)
            if not os.path.exists(b) or not filecmp.cmp(
                    os.path.join(root, n), b, shallow=False):
                return False
    return True


def config1(results):
    cfg = Config(data_dir=FIXTURES, min_time="plt00074", max_time="plt00074",
                 min_level=0, max_level=0, components=["temp", "pressure"],
                 keep=0.999)
    t0 = time.perf_counter()
    r = estimate_run(cfg)
    r["seconds"] = time.perf_counter() - t0
    results["config1_estimate"] = r


def config2(results, tmp):
    comp = os.path.join(tmp, "comp") + os.sep
    out = os.path.join(tmp, "out") + os.sep
    cfg = Config(data_dir=FIXTURES, min_time="plt00074", max_time="plt00075",
                 min_level=0, max_level=1, components=["temp", "pressure"],
                 keep=0.999, compressed_dir=comp)
    c = compress_run(cfg)
    d = decompress_run(Config(compressed_dir=comp, out_dir=out))
    ident = all(dirs_identical(os.path.join(FIXTURES, p),
                               os.path.join(out, p))
                for p in ("plt00074", "plt00075"))
    results["config2_roundtrip"] = {
        "compress": c, "decompress": d,
        "byte_identical_regeneration": ident,
        "archive_bytes": metrics.dir_size(comp),
        "raw_bytes": sum(metrics.dir_size(os.path.join(FIXTURES, p))
                         for p in ("plt00074", "plt00075")),
    }


def synthetic_plotfile(tmp, n_boxes=27, dim=16, ncomp=2, name="plt00020",
                       offset=0.0):
    """``offset`` shifts the field positive (like physical density/temp
    fields).  Matters for realistic kept fractions: the reference's signed
    absmax threshold rule degenerates to keep-everything on boxes whose
    largest-|.| coefficient is negative (SURVEY.md §5.2), which zero-mean
    synthetic fields hit on ~half their boxes."""
    rng = np.random.default_rng(0)
    boxes, locs, dims = [], [], []
    side = round(n_boxes ** (1 / 3)) or 1
    count = 0
    for i in range(side):
        for j in range(side):
            for k in range(side):
                x, y, z = np.meshgrid(
                    np.linspace(i, i + 1, dim), np.linspace(j, j + 1, dim),
                    np.linspace(k, k + 1, dim), indexing="ij")
                smooth = (np.sin(2 * x) * np.cos(3 * y) * np.exp(-z / 4)
                          + offset)
                noisy = smooth * 50 + rng.standard_normal(smooth.shape)
                comps = [smooth.astype(np.float32), noisy.astype(np.float32)][:ncomp]
                boxes.append(np.stack(comps))
                locs.append((i * dim, j * dim, k * dim))
                dims.append((dim, dim, dim))
                count += 1
    src = os.path.join(tmp, "synth", name)
    pf.write_plotfile(src, [boxes], [locs], [dims],
                      ["smooth", "noisy"][:ncomp], 0.25, [0., 0., 0.],
                      [1., 1., 1.], (2, 2, 2),
                      (side * dim, side * dim, side * dim), [20])
    return os.path.join(tmp, "synth"), count


def config3(results, tmp):
    data_dir, _ = synthetic_plotfile(tmp)
    sweep = {}
    for keep in (0.99, 0.999, 0.9999):
        cfg = Config(data_dir=data_dir, min_time="plt00020",
                     max_time="plt00020", min_level=0, max_level=0,
                     components=["smooth", "noisy"], keep=keep)
        sweep[str(keep)] = estimate_run(cfg)
    results["config3_keep_sweep_synthetic"] = sweep


def config4(results, tmp):
    data_dir, n_boxes = synthetic_plotfile(tmp, n_boxes=1000, dim=16,
                                           name="plt00030")
    out = {}
    for mode, extra in (("box", {"keep": 0.999}),
                        ("box_sparse", {"keep": 0.999, "transfer": "sparse"}),
                        ("global", {"keep_fraction": 0.02})):
        comp = os.path.join(tmp, f"comp4_{mode}") + os.sep
        cfg = Config(data_dir=data_dir, min_time="plt00030",
                     max_time="plt00030", min_level=0, max_level=0,
                     components=["smooth", "noisy"], compressed_dir=comp,
                     threshold_mode=mode.split("_")[0], **extra)
        t0 = time.perf_counter()
        stats = compress_run(cfg)
        stats["wall_seconds"] = time.perf_counter() - t0
        stats["boxes"] = n_boxes
        stats["compress_gbps_e2e"] = (
            stats["input_bytes"] / 1e9 / stats["compress_seconds"])
        out[mode] = stats
    results["config4_large_synthetic"] = out


def config5(results, tmp):
    """Realistic-regime END-TO-END rows on the live backend: 64 boxes of
    64^3 smooth data (keep=0.999 keeps a few percent — the regime real AMR
    fields sit in), full CLI-equivalent compress + decompress, comparing
    the parity configuration against the fast-path extensions.  The e2e
    figure includes device transform, device->host transfer, host pack and
    file writes (overlapped as the pipeline runs them)."""
    data_dir, n_boxes = synthetic_plotfile(tmp, n_boxes=64, dim=64, ncomp=1,
                                           name="plt00050", offset=3.0)
    # pick the keep whose kept fraction lands in the realistic 1-5% band
    # for this data (the per-box rule's kept fraction is data-dependent;
    # real AMR fields at keep=0.999 keep a few percent)
    os.makedirs(os.path.join(tmp, "c5data"), exist_ok=True)
    from wavelet_tpu.runtime import engine as eng_mod
    from wavelet_tpu.io import plotfile as pf_mod

    probe = pf_mod.read_level(os.path.join(data_dir, "plt00050"), 0, [0])
    probe_boxes = np.stack(probe.boxes[:4])[:, 0]
    eng = eng_mod.CodecEngine()
    keep, kept = 0.999, 1.0
    for cand in (0.999, 0.99, 0.97, 0.9, 0.8, 0.5, 0.2):
        _flat, mask = eng.compress_batch(probe_boxes.copy(), cand)
        keep, kept = cand, float(mask.mean())
        if kept <= 0.05:
            break
    out = {"keep": keep, "kept_fraction": round(kept, 5)}
    for mode_i, (mode, extra) in enumerate((
            ("parity_xz_files", {}),
            ("raw_files", {"codec": "raw"}),
            ("raw_bundle", {"codec": "raw", "archive": "bundle"}),
            ("raw_sparse_bundle", {"codec": "raw", "archive": "bundle",
                                   "transfer": "sparse"}))):
        # each mode gets its own (imperceptibly perturbed) dataset: the
        # axon layer can serve repeated identical (executable, input)
        # device executions from a cache, which would fake the later
        # modes' device-transform time (CLAUDE.md benchmarking rule)
        mode_tmp = os.path.join(tmp, "c5data", mode)
        data_dir, _ = synthetic_plotfile(mode_tmp, n_boxes=64, dim=64,
                                         ncomp=1, name="plt00050",
                                         offset=3.0 + 1e-3 * mode_i)
        # flush the previous mode's dirty pages so no mode is timed against
        # write-back pressure its predecessor created (observed 1.8x swings
        # on this rig's disk otherwise)
        os.sync()
        comp = os.path.join(tmp, f"comp5_{mode}") + os.sep
        regen = os.path.join(tmp, f"out5_{mode}") + os.sep
        cfg = Config(data_dir=data_dir, min_time="plt00050",
                     max_time="plt00050", min_level=0, max_level=0,
                     components=["smooth"], compressed_dir=comp,
                     keep=keep, **extra)
        stats = compress_run(cfg)
        stats["boxes"] = n_boxes
        stats["compress_gbps_e2e"] = (
            stats["input_bytes"] / 1e9 / stats["compress_seconds"])
        os.sync()
        # sparse transport is symmetric: the sparse row decompresses with
        # -d transfer=sparse so the measurement covers the new h2d path
        d = decompress_run(Config(compressed_dir=comp, out_dir=regen,
                                  transfer=extra.get("transfer", "dense")))
        stats["decompress_seconds"] = d["decompress_seconds"]
        stats["host_to_device_bytes"] = d.get("host_to_device_bytes")
        stats["decompress_gbps_e2e"] = (
            stats["input_bytes"] / 1e9 / d["decompress_seconds"])
        out[mode] = stats
    results["config5_e2e_realistic"] = out


def spiky_plotfile(tmp, n_boxes=64, dim=64, name="plt00060", seed=7):
    """Shock/flame-like field: smooth low-amplitude background with sparse
    high-magnitude features (~1% of cells), the regime sparse transport is
    designed for — the per-box threshold rides the large spikes, so only a
    few percent of coefficients survive.  Every box gets one strongly
    positive spike so the signed-absmax rule never degenerates
    (SURVEY.md §5.2)."""
    rng = np.random.default_rng(seed)
    boxes, locs, dims = [], [], []
    for b in range(n_boxes):
        a = rng.standard_normal((dim, dim, dim)).astype(np.float32) * 1e-3
        # each point spike spreads into ~8 single-scale Haar coefficients,
        # so 0.125% spike density lands near 1% kept coefficients
        mask = rng.random((dim, dim, dim)) < 0.00125
        a[mask] = np.abs(rng.standard_normal(mask.sum())
                         ).astype(np.float32) * 100
        a.flat[0] = 1000.0
        boxes.append(a[None])
        locs.append((b * dim, 0, 0))
        dims.append((dim, dim, dim))
    src = os.path.join(tmp, "spiky", name)
    pf.write_plotfile(src, [boxes], [locs], [dims], ["f"], 0.25,
                      [0., 0., 0.], [1., 1., 1.], (2, 2, 2),
                      (n_boxes * dim, dim, dim), [60])
    return os.path.join(tmp, "spiky"), n_boxes


def config6(results, tmp):
    """Sparse-regime END-TO-END rows: same shape/volume as config5 but on
    spiky ~1%-kept data (config5's smooth fields keep ~5-8%, above the
    point where (index, value) pairs at 8 B each beat 4 B dense rows).
    Dense vs sparse transport, both directions, on the raw/bundle fast
    path so the transport difference isn't buried under xz time."""
    out = {}
    for mode_i, transfer in enumerate(("dense", "sparse")):
        mode_tmp = os.path.join(tmp, "c6data", transfer)
        # per-mode data (distinct seed): the axon layer can serve repeated
        # identical (executable, input) device executions from a cache,
        # which would fake the second mode's device time (CLAUDE.md rule)
        data_dir, n_boxes = spiky_plotfile(mode_tmp, n_boxes=64, dim=64,
                                           name=f"plt0006{mode_i}",
                                           seed=7 + mode_i)
        os.sync()
        comp = os.path.join(tmp, f"comp6_{transfer}") + os.sep
        regen = os.path.join(tmp, f"out6_{transfer}") + os.sep
        name = f"plt0006{mode_i}"
        cfg = Config(data_dir=data_dir, min_time=name, max_time=name,
                     min_level=0, max_level=0, components=["f"],
                     compressed_dir=comp, keep=0.999, codec="raw",
                     archive="bundle", transfer=transfer)
        stats = compress_run(cfg)
        stats["boxes"] = n_boxes
        stats["compress_gbps_e2e"] = (
            stats["input_bytes"] / 1e9 / stats["compress_seconds"])
        os.sync()
        d = decompress_run(Config(compressed_dir=comp, out_dir=regen,
                                  transfer=transfer))
        stats["decompress_seconds"] = d["decompress_seconds"]
        stats["host_to_device_bytes"] = d.get("host_to_device_bytes")
        stats["decompress_gbps_e2e"] = (
            stats["input_bytes"] / 1e9 / d["decompress_seconds"])
        out[transfer] = stats
    results["config6_e2e_sparse_regime"] = out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_results/measured.json")
    ap.add_argument("--skip4", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated config numbers to run, e.g. 5")
    args = ap.parse_args()

    import tempfile

    results = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
               "platform": None}
    import jax
    results["platform"] = jax.devices()[0].platform

    only = (set(int(x) for x in args.only.split(","))
            if args.only else {1, 2, 3, 4, 5, 6})
    with tempfile.TemporaryDirectory() as tmp:
        if 1 in only:
            config1(results)
        if 2 in only:
            config2(results, tmp)
        if 3 in only:
            config3(results, tmp)
        if 4 in only and not args.skip4:
            config4(results, tmp)
        if 5 in only:
            config5(results, tmp)
        if 6 in only:
            config6(results, tmp)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
