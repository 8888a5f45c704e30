"""Decompression pipeline (reference: ``decompress(Config)``, modes.cpp:115-204).

Stages:
  1. host: read sidecars (runinfo/boxcounts/locations/dimensions/amrexinfo)
  2. host: parallel read + xz decode + RLE scatter into flat coefficient rows
  3. device: shape-bucketed inverse Haar batches
  4. host: regenerate plotfiles byte-identically (io/plotfile.write_plotfile)
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np

from wavelet_tpu.io import archive, plotfile
from wavelet_tpu.pipeline import common
from wavelet_tpu.runtime import batching, engine

log = logging.getLogger("wavelet_tpu")

__all__ = ["decompress_run"]


def decompress_run(cfg: common.Config, mesh=None) -> dict:
    info = archive.read_runinfo(cfg.compressed_dir)
    levels = common.format_levels(info.min_level, info.max_level)
    num_times = len(info.files)
    num_levels = len(levels)
    log.info("Decompressing data between timestep %s and %s, level %s and %s, "
             "for %s components", info.files[0], info.files[-1],
             info.min_level, info.max_level, len(info.components))

    t0 = time.perf_counter()
    counts = archive.read_boxcounts(cfg.compressed_dir, num_times, num_levels)
    locations = archive.read_locdim(cfg.compressed_dir, "locations.raw", counts)
    dimensions = archive.read_locdim(cfg.compressed_dir, "dimensions.raw", counts)
    amrex = archive.read_amrexinfo(cfg.compressed_dir)

    # one work item per (t, lev, comp, box), bucketed by box shape
    buckets = {}
    for t in range(num_times):
        for li in range(num_levels):
            for b in range(counts[t][li]):
                dims = tuple(dimensions[t][li][b])
                for comp_idx in info.comp_idxs:
                    buckets.setdefault(dims, []).append(
                        batching.WorkItem(t=t, level=li, comp_idx=comp_idx,
                                          box=b))

    meta = archive.read_meta(cfg.compressed_dir)
    packer = engine.HostPacker(payload=meta.get("payload", "f32"))
    eng = engine.CodecEngine(mesh=mesh, scales=meta.get("scales", 1))
    pad = mesh.size if mesh is not None else 1

    comp_pos = {c: k for k, c in enumerate(info.comp_idxs)}
    ncomp = len(info.comp_idxs)
    # regenerated boxes: [t][lev][box] -> (C, X, Y, Z)
    regen = [[[None] * counts[t][li] for li in range(num_levels)]
             for t in range(num_times)]
    for dims, bucket_items in buckets.items():
        batch = batching.empty_batch(bucket_items, dims,
                                     pack=eng.pack_factor(dims),
                                     pad_multiple=pad)
        packer.unpack_into(cfg.compressed_dir, batch)
        out = eng.decompress_shapebatch(batch)
        for i, it in enumerate(bucket_items):
            if regen[it.t][it.level][it.box] is None:
                regen[it.t][it.level][it.box] = np.zeros(
                    (ncomp,) + dims, dtype=np.float32)
            regen[it.t][it.level][it.box][comp_pos[it.comp_idx]] = \
                out.item_view(i)
    t1 = time.perf_counter()
    log.info("Decompression completed in %s seconds.", t1 - t0)

    # --- write plotfiles (writeplotfile.cpp:118-231) ---
    os.makedirs(cfg.out_dir, exist_ok=True)
    for t in range(num_times):
        name = os.path.join(cfg.out_dir, os.path.basename(info.files[t]))
        log.info("%s", name)
        geom = amrex.geomcellinfo[t]
        plotfile.write_plotfile(
            name,
            [regen[t][li] for li in range(num_levels)],
            [locations[t][li] for li in range(num_levels)],
            [dimensions[t][li] for li in range(num_levels)],
            info.components,
            float(amrex.true_times[t]),
            geom[0:3], geom[3:6],
            amrex.ref_ratios,
            (amrex.x_dim, amrex.y_dim, amrex.z_dim),
            amrex.level_steps[t],
        )
    log.info("Sucessfully wrote plotfiles.")
    return {"decompress_seconds": t1 - t0, "times": num_times,
            "levels": num_levels, "boxes": sum(sum(c) for c in counts)}
