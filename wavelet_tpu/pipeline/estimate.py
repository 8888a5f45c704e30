"""Estimate pipeline (reference: ``estimate(Config)``, modes.cpp:209-328).

One timestep (minfile), one level (minlevel), all selected components:
compress into a scratch dir, decompress, report per-component mean RMSE
(unweighted over boxes, the reference's estimator), adjusted loss
(RMSE / range over the estimated subset) and compressed size as a
percentage of the (component-adjusted) raw level size.
"""

from __future__ import annotations

import logging
import os
import tempfile

import numpy as np

from wavelet_tpu.core import metrics
from wavelet_tpu.io import archive, plotfile
from wavelet_tpu.pipeline import common, compress
from wavelet_tpu.runtime import batching, engine

log = logging.getLogger("wavelet_tpu")

__all__ = ["estimate_run"]


def estimate_run(cfg: common.Config, mesh=None) -> dict:
    files = common.format_files(cfg.data_dir, cfg.min_time, cfg.min_time)
    levels = [cfg.min_level]
    ncomp = len(cfg.components)

    run = common.collect_run(files, cfg.components, levels)

    with tempfile.TemporaryDirectory() as scratch:
        packer = engine.HostPacker(payload=cfg.payload, codec=cfg.codec,
                                   xz_preset=cfg.xz_preset)
        compress.compress_collected(run, cfg.keep, scratch, mesh=mesh,
                                    packer=packer,
                                    threshold_mode=cfg.threshold_mode,
                                    keep_fraction=cfg.keep_fraction,
                                    scales=cfg.scales, payload=cfg.payload)
        log.info("Compression complete.")
        eng = engine.CodecEngine(mesh=mesh, scales=cfg.scales)
        lv = run.levels_data[0][0]
        buckets = {}
        for b in range(len(lv.boxes)):
            dims = tuple(lv.dimensions[b])
            for comp_idx in run.comp_idxs:
                buckets.setdefault(dims, []).append(
                    batching.WorkItem(t=0, level=0, comp_idx=comp_idx, box=b))
        comp_pos = {c: k for k, c in enumerate(run.comp_idxs)}
        regen = [np.zeros_like(box) for box in lv.boxes]
        pad = mesh.size if mesh is not None else 1
        for dims, items in buckets.items():
            batch = batching.empty_batch(items, dims,
                                         pack=eng.pack_factor(dims),
                                         pad_multiple=pad,
                                         layout=eng.coeff_layout(dims))
            packer.unpack_into(scratch, batch)
            out = eng.decompress_shapebatch(batch)
            for i, it in enumerate(items):
                regen[it.box][comp_pos[it.comp_idx]] = out.item_view(i)
        log.info("Decompression complete.")

        # per-box RMSE, unweighted mean per component (modes.cpp:269-291);
        # devicemetrics=1 computes it on device (f32 fast path), the default
        # host path matches the reference's double accumulation exactly
        if cfg.device_metrics:
            per_box = [eng.rmse_batch(a, p)
                       for a, p in zip(lv.boxes, regen)]
        else:
            per_box = [metrics.rmse_per_box(a, p)
                       for a, p in zip(lv.boxes, regen)]
        mean_rmse = metrics.mean_rmse(per_box)
        result = {"components": {}, "keep": cfg.keep}
        for c, name in enumerate(run.components):
            loss = metrics.adjusted_loss(
                mean_rmse[c],
                float(run.max_values[c]) - float(run.min_values[c]))
            log.info("Predicted RMSE, %s = %s", name, mean_rmse[c])
            log.info("Predicted Adjusted loss, %s = %s", name, loss)
            result["components"][name] = {
                "rmse": float(mean_rmse[c]), "adjusted_loss": float(loss)}

        # size estimate (modes.cpp:294-324): raw Level dir size scaled by the
        # fraction of components compressed
        h = plotfile.read_header(files[0])
        raw_path = os.path.join(files[0], f"Level_{levels[0]}")
        raw_size = metrics.dir_size(raw_path) / h.n_comp * ncomp
        comp_size = metrics.dir_size(scratch)
        pct = comp_size / raw_size * 100.0
        log.info("Predicted compressed size: %s%%", pct)
        result["compressed_size_pct"] = pct
    return result
