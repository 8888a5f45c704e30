"""Global-threshold mode: exponent-bin histograms, quantile selection, and
the end-to-end compress path (new TPU-native capability; no reference
analogue — SURVEY.md §2 item 2 and BASELINE.json configs 4-5)."""

import numpy as np
import pytest

import jax.numpy as jnp

from wavelet_tpu.core import threshold as thr
from wavelet_tpu.pipeline import Config, common, compress, decompress
from wavelet_tpu.io import plotfile as pf
from wavelet_tpu.runtime import engine


def test_exponent_histogram_counts_and_merge():
    rng = np.random.default_rng(0)
    a = (rng.standard_normal(4096) * 100).astype(np.float32)
    b = (rng.standard_normal(4096) * 0.01).astype(np.float32)
    ha = np.asarray(thr.abs_exponent_histogram(jnp.asarray(a)), np.int64)
    hb = np.asarray(thr.abs_exponent_histogram(jnp.asarray(b)), np.int64)
    hab = np.asarray(thr.abs_exponent_histogram(
        jnp.asarray(np.concatenate([a, b]))), np.int64)
    assert ha.sum() == 4096 and hb.sum() == 4096
    np.testing.assert_array_equal(ha + hb, hab)   # mergeable by addition


@pytest.mark.parametrize("frac", [0.5, 0.1, 0.01])
def test_threshold_from_histogram_quantile(frac):
    rng = np.random.default_rng(1)
    mags = (rng.lognormal(0, 3, 1 << 16)).astype(np.float32)
    hist = np.asarray(thr.abs_exponent_histogram(jnp.asarray(mags)), np.int64)
    t = thr.threshold_from_histogram(hist, frac)
    kept = np.mean(np.abs(mags) > t)
    # quantile resolution is one bin (~6% relative in count terms)
    assert kept <= frac * 1.001
    assert kept >= frac * 0.75


def test_threshold_keep_all_fraction():
    mags = np.array([1.0, 2.0, 0.0], np.float32)
    hist = np.asarray(thr.abs_exponent_histogram(jnp.asarray(mags)), np.int64)
    t = thr.threshold_from_histogram(hist, 1.0)
    assert np.mean(np.abs(mags) > t) >= 2 / 3   # all nonzero kept


def _write_synthetic(tmp_path, name="plt00010"):
    rng = np.random.default_rng(0)
    x, y, z = np.meshgrid(np.linspace(0, 4, 32), np.linspace(0, 3, 16),
                          np.linspace(0, 2, 8), indexing="ij")
    smooth = (np.sin(3 * x) * np.cos(2 * y) + z).astype(np.float32)
    noisy = (10 * smooth + rng.standard_normal(smooth.shape)).astype(np.float32)
    src = tmp_path / "data" / name
    pf.write_plotfile(str(src), [[np.stack([smooth, noisy])]],
                      [[(0, 0, 0)]], [[(32, 16, 8)]],
                      ["a", "b"], 0.5, [0., 0., 0.], [1., 1., 1.],
                      (2, 2, 2), (32, 16, 8), [10])
    return str(tmp_path / "data")


def test_global_mode_end_to_end(tmp_path):
    data_dir = _write_synthetic(tmp_path)
    comp_dir = str(tmp_path / "comp") + "/"
    out_dir = str(tmp_path / "out") + "/"
    cfg = Config(data_dir=data_dir, min_time="plt00010", max_time="plt00010",
                 min_level=0, max_level=0, components=["a", "b"],
                 threshold_mode="global", keep_fraction=0.1,
                 compressed_dir=comp_dir)
    stats = compress.compress_run(cfg)
    assert stats["files"] == 2
    assert stats["global_threshold"] > 0

    # the archive decompresses with the unchanged pipeline
    dcfg = Config(compressed_dir=comp_dir, out_dir=out_dir)
    decompress.decompress_run(dcfg)
    again = pf.read_level(out_dir + "plt00010", 0, [0, 1])
    orig = pf.read_level(data_dir + "/plt00010", 0, [0, 1])
    # ~10% of coefficients kept -> rough reconstruction, finite error
    err = np.abs(again.boxes[0].astype(np.float64) -
                 orig.boxes[0].astype(np.float64))
    rng_b = orig.boxes[0][1].max() - orig.boxes[0][1].min()
    assert err.mean() < 0.2 * rng_b


def test_global_mode_requires_fraction():
    empty = common.RunData(levels_data=[], comp_idxs=[], components=[],
                           min_values=None, max_values=None, amrexinfo=None,
                           files=[], levels=[])
    with pytest.raises(ValueError):
        compress.compress_collected(empty, 0.999, "/tmp",
                                    threshold_mode="global")


def test_cli_global_keys():
    from wavelet_tpu import cli
    mode, cfg = cli.parse_argv([
        'datadir=/d', 'minfile=a1', 'maxfile=a1', 'minlevel=0', 'maxlevel=0',
        'components=x', 'thresholdmode=global', 'keepfraction=0.05', '-c',
        'compresseddir=/o'])
    assert cfg.threshold_mode == "global" and cfg.keep_fraction == 0.05
