"""Compression pipeline (reference: ``compress(Config)``, modes.cpp:24-112).

Stages:
  1. host: discover files, parse headers, read FAB boxes (io/plotfile)
  2. host: write the five sidecar files first — the archive is then
     resumable state, every later output is an independent file
     (SURVEY.md §7 checkpoint/resume property)
  3. device: shape-bucketed batches -> fused Haar + absmax -> exact
     thresholds -> masks (runtime/engine)
  4. host: RLE + serialize + xz in a thread pool

Multi-host: each process takes its slice of the batch list and writes its
own shard of ``.xz`` files (runtime/mesh.process_local_slice).
"""

from __future__ import annotations

import concurrent.futures as cf
import logging
import os
import time

import numpy as np

from wavelet_tpu.io import archive
from wavelet_tpu.pipeline import common
from wavelet_tpu.runtime import batching, engine, mesh as mesh_lib

log = logging.getLogger("wavelet_tpu")

__all__ = ["compress_run", "compress_collected"]


def _iter_workitems(run: common.RunData):
    """Flatten the (t, lev, comp, box) space into codec work items."""
    for t, per_lev in enumerate(run.levels_data):
        for li, lv in enumerate(per_lev):
            for b, arr in enumerate(lv.boxes):
                for c, comp_idx in enumerate(run.comp_idxs):
                    yield (batching.WorkItem(t=t, level=li, comp_idx=comp_idx,
                                             box=b), arr[c])


def write_sidecars(run: common.RunData, min_level, max_level,
                   out_dir: str):
    """The five metadata files of modes.cpp:71-89, byte-compatible.
    Component names are recorded in Header order (matching comp_idxs)."""
    info = archive.RunInfo(run.files, min_level, max_level,
                           list(run.components), run.comp_idxs)
    archive.write_runinfo(info, out_dir)
    archive.write_meta(out_dir)  # defaults; compress_run overwrites
    locations = [[lv.locations for lv in per_lev] for per_lev in run.levels_data]
    dimensions = [[lv.dimensions for lv in per_lev] for per_lev in run.levels_data]
    counts = [[len(lv.boxes) for lv in per_lev] for per_lev in run.levels_data]
    archive.write_locdim(locations, out_dir, "locations.raw")
    archive.write_locdim(dimensions, out_dir, "dimensions.raw")
    archive.write_boxcounts(counts, out_dir)
    archive.write_amrexinfo(run.amrexinfo, out_dir)


def compress_collected(run: common.RunData, keep: float, out_dir: str,
                       mesh=None, packer=None,
                       threshold_mode: str = "box",
                       keep_fraction: float | None = None,
                       resume: bool = False,
                       scales: int = 1,
                       payload: str = "f32",
                       transfer: str = "dense") -> dict:
    """Device codec + host pack for already-collected data. Returns stats.

    ``threshold_mode``:
    - ``"box"`` (reference parity): per-(box, component) signed-absmax rule,
      ``thresh = max_val * (1 - keep)`` (compressor.cpp:212-216).
    - ``"global"`` (new TPU-native capability, BASELINE.json configs 4-5):
      one magnitude threshold for the whole run, the quantile keeping
      ``keep_fraction`` of all coefficients, computed from summed
      fixed-bin histograms (all-reduce-friendly).  The archive format is
      unchanged, so either mode decompresses identically.
    """
    eng = engine.CodecEngine(mesh=mesh, scales=scales)
    packer = packer or engine.HostPacker(payload=payload)
    pad = mesh.size if mesh is not None else 1
    # multi-host fan-out: each process owns a contiguous slice of the work
    # items and writes its own shard of .xz files (the archive is a flat
    # directory, so shards compose); sidecars are written by process 0 only
    # (write_sidecars is called by compress_run on every host with identical
    # content — last-writer-wins is benign, but slicing items avoids
    # duplicate codec work).
    items = list(_iter_workitems(run))
    import jax

    if jax.process_count() > 1:
        items = items[mesh_lib.process_local_slice(len(items))]
    skipped = 0

    def _exists(item):
        return os.path.exists(os.path.join(
            out_dir, archive.payload_filename(item.t, item.level,
                                              item.comp_idx, item.box)))

    if resume and threshold_mode != "global":
        # every (t, lev, comp, box) output is an independent file written
        # after the sidecars, so a killed run restarts by skipping existing
        # outputs — the same idempotence the reference's archive layout
        # provides implicitly (SURVEY.md §7 checkpoint/resume).  In global
        # mode items are NOT filtered here: the histogram (and therefore the
        # threshold) must cover every item or a resumed archive would mix
        # two thresholds — only the pack stage skips existing files.
        kept_items = [p for p in items if not _exists(p[0])]
        skipped = len(items) - len(kept_items)
        if skipped:
            log.info("Resume: skipping %d already-compressed items", skipped)
        items = kept_items
    batches = batching.plan_batches(items, pad_multiple=pad,
                                    pack_fn=eng.pack_factor)
    n_files = 0
    in_bytes = 0
    out_bytes = 0
    if threshold_mode == "global":
        if keep_fraction is None:
            raise ValueError("global threshold mode requires keep_fraction")
        from wavelet_tpu.core import threshold as thr

        hist = np.zeros(thr.EXP_HIST_BINS, np.int64)
        coeff_batches = []
        for batch in batches:
            cb, h = eng.forward_hist_shapebatch(batch)
            coeff_batches.append(cb)
            hist += h
        if jax.process_count() > 1:
            # all-reduce the histogram over DCN so every host derives the
            # same global threshold
            import jax.numpy as jnp
            from jax.experimental import multihost_utils

            gathered = multihost_utils.process_allgather(jnp.asarray(hist))
            hist = np.asarray(gathered).reshape(jax.process_count(), -1).sum(0)
        t = thr.threshold_from_histogram(hist, keep_fraction)
        log.info("Global magnitude threshold (keep_fraction=%s): %s",
                 keep_fraction, t)
        for cb in coeff_batches:
            t32 = np.full(len(cb.items), t, np.float32)
            subset = None
            if resume:
                subset = [i for i, it in enumerate(cb.items)
                          if not _exists(it)]
                skipped += len(cb.items) - len(subset)
            out_bytes += packer.pack(out_dir, cb, t32, subset=subset)
            n_files += len(subset) if subset is not None else len(cb.items)
            in_bytes += cb.n_valid * int(np.prod(cb.shape)) * 4
        return {"files": n_files, "input_bytes": in_bytes,
                "output_bytes": out_bytes, "global_threshold": float(t),
                "skipped": skipped}

    # overlap: the device transforms batch i+1 while a pack thread runs the
    # host RLE+xz+write of batch i
    with cf.ThreadPoolExecutor(1) as pack_pool:
        pending = None
        for batch in batches:
            if transfer == "sparse" and scales == 1:
                # sparsification on device: only kept (index, value) pairs
                # cross the device->host link
                sparse, t32 = eng.compress_shapebatch_sparse(batch, keep)
                job = (packer.pack_sparse, out_dir, sparse, t32)
            else:
                coeffs, t32 = eng.compress_shapebatch(batch, keep)
                job = (packer.pack, out_dir, coeffs, t32)
            if pending is not None:
                out_bytes += pending.result()
            pending = pack_pool.submit(*job)
            n_files += len(batch.items)
            in_bytes += batch.n_valid * int(np.prod(batch.shape)) * 4
        if pending is not None:
            out_bytes += pending.result()
    return {"files": n_files, "input_bytes": in_bytes,
            "output_bytes": out_bytes, "skipped": skipped}


def compress_run(cfg: common.Config, mesh=None) -> dict:
    """Full compression mode (modes.cpp:24-112)."""
    files = common.format_files(cfg.data_dir, cfg.min_time, cfg.max_time)
    levels = common.format_levels(cfg.min_level, cfg.max_level)
    log.info("This run involves the following files:")
    for f in files:
        log.info("%s", f)

    log.info("Processing data...")
    t0 = time.perf_counter()
    run = common.collect_run(files, cfg.components, levels)
    os.makedirs(cfg.compressed_dir, exist_ok=True)
    write_sidecars(run, cfg.min_level, cfg.max_level, cfg.compressed_dir)
    archive.write_meta(cfg.compressed_dir, threshold_mode=cfg.threshold_mode,
                       keep=cfg.keep, keep_fraction=cfg.keep_fraction,
                       scales=cfg.scales, payload=cfg.payload)
    t1 = time.perf_counter()
    log.info("Successfully processed data in %s seconds. "
             "Beginning compression...", t1 - t0)

    stats = compress_collected(run, cfg.keep, cfg.compressed_dir, mesh=mesh,
                               threshold_mode=cfg.threshold_mode,
                               keep_fraction=cfg.keep_fraction,
                               resume=cfg.resume, scales=cfg.scales,
                               payload=cfg.payload, transfer=cfg.transfer)
    t2 = time.perf_counter()
    log.info("Compression completed in %s seconds.", t2 - t1)
    stats["preprocess_seconds"] = t1 - t0
    stats["compress_seconds"] = t2 - t1
    return stats
