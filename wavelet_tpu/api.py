"""Programmatic API: the CLI modes as plain Python calls.

The reference tool is CLI-only (main.cpp dispatches modes.cpp); this
framework additionally exposes each mode as a function so the codec can be
embedded — notebooks, schedulers, in-situ pipelines — without shelling out::

    import wavelet_tpu

    stats = wavelet_tpu.compress(
        "/data", "/archive", min_time="plt00074", max_time="plt00075",
        min_level=0, max_level=1, components=["temp", "pressure"],
        keep=0.999)
    wavelet_tpu.decompress("/archive", "/regen")

Every extension knob is a keyword argument named after its
:class:`~wavelet_tpu.pipeline.common.Config` field (``threshold_mode``,
``keep_fraction``, ``scales``, ``payload``, ``codec``, ``xz_preset``,
``xz_delta``, ``archive``, ``transfer``, ``prefetch``, ``resume``,
``fast_estimate``, ``preview``, ``levels_upto``, ...); unknown names raise
``TypeError`` up front.  All functions return the same stats dict the
pipeline records for the CLI.  Pass ``mesh=`` (a ``jax.sharding.Mesh``
from :func:`wavelet_tpu.runtime.mesh.data_mesh`) to shard the batch axis
across devices, exactly like the CLI's ``devices=N`` key.
"""

from __future__ import annotations

from dataclasses import fields as _dc_fields

from wavelet_tpu.pipeline import common as _common
from wavelet_tpu.pipeline.check import check_run as _check_run
from wavelet_tpu.pipeline.check import info_run as _info_run
from wavelet_tpu.pipeline.compress import compress_run as _compress_run
from wavelet_tpu.pipeline.decompress import decompress_run as _decompress_run
from wavelet_tpu.pipeline.estimate import estimate_run as _estimate_run

__all__ = ["compress", "decompress", "estimate", "check", "info"]

_CFG_FIELDS = {f.name for f in _dc_fields(_common.Config)}


def _build_config(base: dict, options: dict) -> _common.Config:
    cfg = _common.Config()
    for k, v in {**base, **options}.items():
        if k not in _CFG_FIELDS:
            raise TypeError(
                f"unknown option {k!r}; valid Config fields: "
                f"{sorted(_CFG_FIELDS)}")
        setattr(cfg, k, v)
    return cfg


def compress(data_dir: str, compressed_dir: str, *, min_time: str,
             max_time: str, components: list, min_level: int = 0,
             max_level: int = 0, keep: float = 0.999, mesh=None,
             **options) -> dict:
    """Compress plotfiles ``min_time..max_time`` into an archive (CLI -c)."""
    cfg = _build_config(dict(
        data_dir=data_dir, compressed_dir=compressed_dir, min_time=min_time,
        max_time=max_time, components=list(components), min_level=min_level,
        max_level=max_level, keep=keep), options)
    return _compress_run(cfg, mesh=mesh)


def decompress(compressed_dir: str, out_dir: str, *, mesh=None,
               **options) -> dict:
    """Regenerate plotfiles from an archive (CLI -d).

    Partial retrieval / preview via keywords: ``min_time=``/``max_time=``
    (timestep window), ``components=[...]``, ``levels_upto=L``,
    ``preview=p`` (low band at 1/2**p resolution per axis).
    """
    cfg = _build_config(dict(compressed_dir=compressed_dir,
                             out_dir=out_dir), options)
    return _decompress_run(cfg, mesh=mesh)


def estimate(data_dir: str, *, min_time: str, components: list,
             max_time: str | None = None, min_level: int = 0,
             max_level: int | None = None, keep: float = 0.999, mesh=None,
             **options) -> dict:
    """Quality/size estimate without keeping an archive (CLI -estimate).

    Sweeps: pass ``keep_sweep=[k1, k2, ...]`` (box mode) or
    ``keep_fraction_sweep=[f1, ...]`` with ``threshold_mode="global"`` to
    evaluate several operating points in one run.
    """
    cfg = _build_config(dict(
        data_dir=data_dir, min_time=min_time,
        max_time=min_time if max_time is None else max_time,
        components=list(components), min_level=min_level,
        max_level=min_level if max_level is None else max_level,
        keep=keep), options)
    return _estimate_run(cfg, mesh=mesh)


def check(compressed_dir: str) -> dict:
    """Validate archive integrity without decompressing (CLI -check)."""
    return _check_run(_common.Config(compressed_dir=compressed_dir))


def info(compressed_dir: str) -> dict:
    """Summarize an archive from sidecar metadata alone (CLI -info)."""
    return _info_run(_common.Config(compressed_dir=compressed_dir))
