"""Edge cases: odd dims, deeper AMR levels, sparse component selection,
all-negative data (the reference's signed-threshold quirk), error paths."""

import numpy as np
import pytest

from wavelet_tpu.core import oracle
from wavelet_tpu.io import plotfile as pf
from wavelet_tpu.pipeline import Config, common, compress_run, decompress_run


def _write(tmp_path, name, level_boxes, level_locs, level_dims, comps,
           base_dims, steps):
    src = tmp_path / "data" / name
    pf.write_plotfile(str(src), level_boxes, level_locs, level_dims, comps,
                      0.125, [0., 0., 0.], [1., 1., 1.], (2, 2, 2),
                      base_dims, steps)
    return str(tmp_path / "data")


def test_three_level_plotfile_roundtrip(tmp_path):
    """3 refinement levels with different box layouts per level."""
    rng = np.random.default_rng(0)
    mk = lambda d: (rng.standard_normal((1,) + d) * 7).astype(np.float32)
    lv_boxes = [[mk((8, 8, 8))],
                [mk((8, 8, 8)), mk((4, 4, 4))],
                [mk((16, 16, 16))]]
    lv_locs = [[(0, 0, 0)], [(0, 0, 0), (8, 8, 8)], [(4, 4, 4)]]
    lv_dims = [[(8, 8, 8)], [(8, 8, 8), (4, 4, 4)], [(16, 16, 16)]]
    data_dir = _write(tmp_path, "plt00100", lv_boxes, lv_locs, lv_dims,
                      ["u"], (8, 8, 8), [100, 110, 120])

    # reader reproduces what we wrote
    h = pf.read_header(data_dir + "/plt00100")
    assert h.n_levels == 3
    assert h.domain_dims(2) == (32, 32, 32)
    assert h.level_steps == [100, 110, 120]

    comp = str(tmp_path / "c") + "/"
    out = str(tmp_path / "o") + "/"
    compress_run(Config(data_dir=data_dir, min_time="plt00100",
                        max_time="plt00100", min_level=0, max_level=2,
                        components=["u"], keep=0.9999, compressed_dir=comp))
    decompress_run(Config(compressed_dir=comp, out_dir=out))
    h2 = pf.read_header(out + "plt00100")
    assert h2.domain_dims(2) == (32, 32, 32)
    for lev in range(3):
        orig = pf.read_level(data_dir + "/plt00100", lev, [0])
        regen = pf.read_level(out + "plt00100", lev, [0])
        for a, b in zip(orig.boxes, regen.boxes):
            np.testing.assert_allclose(b, a, atol=2e-3 * np.abs(a).max())


def test_sparse_component_selection(tmp_path):
    """Select components 0 and 3 of 4 — file names must carry the header
    indices (compressor.cpp:250-254 contract)."""
    import os

    rng = np.random.default_rng(1)
    box = (rng.standard_normal((4, 8, 8, 8)) * 3).astype(np.float32)
    data_dir = _write(tmp_path, "plt00200", [[box]], [[(0, 0, 0)]],
                      [[(8, 8, 8)]], ["a", "b", "c", "d"], (8, 8, 8), [200])
    comp = str(tmp_path / "c") + "/"
    out = str(tmp_path / "o") + "/"
    compress_run(Config(data_dir=data_dir, min_time="plt00200",
                        max_time="plt00200", min_level=0, max_level=0,
                        components=["a", "d"], keep=0.9999,
                        compressed_dir=comp))
    assert os.path.exists(comp + "compressed-wavelet-0-0-0-0.xz")
    assert os.path.exists(comp + "compressed-wavelet-0-0-3-0.xz")
    assert not os.path.exists(comp + "compressed-wavelet-0-0-1-0.xz")
    decompress_run(Config(compressed_dir=comp, out_dir=out))
    regen = pf.read_level(out + "plt00200", 0, [0, 1])
    np.testing.assert_allclose(regen.boxes[0][0], box[0],
                               atol=2e-3 * np.abs(box[0]).max())
    np.testing.assert_allclose(regen.boxes[0][1], box[3],
                               atol=2e-3 * np.abs(box[3]).max())


def test_all_negative_component_keeps_everything(tmp_path):
    """Reference quirk §5.2: negative signed max -> negative threshold ->
    every coefficient (zeros included) survives; round trip is lossless."""
    base = np.zeros((8, 8, 8), np.float32)
    base[0, 0, 0] = -100.0
    base[3, 3, 3] = -1.0
    data_dir = _write(tmp_path, "plt00300", [[base[None]]], [[(0, 0, 0)]],
                      [[(8, 8, 8)]], ["neg"], (8, 8, 8), [300])
    # oracle confirms the quirk fires for this data
    flat = oracle.haar_forward_oracle(base)
    mask, _, max_o, thresh = oracle.threshold_oracle(flat, 0.999)
    assert max_o < 0 and thresh < 0 and mask.all()

    comp = str(tmp_path / "c") + "/"
    out = str(tmp_path / "o") + "/"
    compress_run(Config(data_dir=data_dir, min_time="plt00300",
                        max_time="plt00300", min_level=0, max_level=0,
                        components=["neg"], keep=0.999, compressed_dir=comp))
    decompress_run(Config(compressed_dir=comp, out_dir=out))
    regen = pf.read_level(out + "plt00300", 0, [0])
    np.testing.assert_allclose(regen.boxes[0][0], base, atol=1e-5)


def test_odd_dimension_box_pipeline(tmp_path):
    """Odd dims don't round-trip in the reference (§5.1 inverse zeroes the
    tail); the pipeline must reproduce that behavior, not crash."""
    box = np.full((3, 4, 4), 2.0, np.float32)
    data_dir = _write(tmp_path, "plt00400", [[box[None]]], [[(0, 0, 0)]],
                      [[(3, 4, 4)]], ["v"], (3, 4, 4), [400])
    comp = str(tmp_path / "c") + "/"
    out = str(tmp_path / "o") + "/"
    compress_run(Config(data_dir=data_dir, min_time="plt00400",
                        max_time="plt00400", min_level=0, max_level=0,
                        components=["v"], keep=0.999, compressed_dir=comp))
    decompress_run(Config(compressed_dir=comp, out_dir=out))
    regen = pf.read_level(out + "plt00400", 0, [0])
    # matches the reference's lossy odd-dim behavior exactly
    flat = oracle.haar_forward_oracle(box)
    mask, _, _, thresh = oracle.threshold_oracle(flat, 0.999)
    want = oracle.haar_inverse_oracle(np.where(mask, flat, 0.0), 3, 4, 4)
    np.testing.assert_array_equal(regen.boxes[0][0], want)
    assert np.all(regen.boxes[0][0][2] == 0.0)   # zeroed odd tail


def test_missing_component_raises(tmp_path):
    rng = np.random.default_rng(2)
    box = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    data_dir = _write(tmp_path, "plt00500", [[box]], [[(0, 0, 0)]],
                      [[(4, 4, 4)]], ["real"], (4, 4, 4), [500])
    with pytest.raises(KeyError):
        compress_run(Config(data_dir=data_dir, min_time="plt00500",
                            max_time="plt00500", min_level=0, max_level=0,
                            components=["ghost"], keep=0.999,
                            compressed_dir=str(tmp_path / "c") + "/"))


def test_missing_archive_file_raises(tmp_path):
    import os

    rng = np.random.default_rng(3)
    box = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    data_dir = _write(tmp_path, "plt00600", [[box]], [[(0, 0, 0)]],
                      [[(4, 4, 4)]], ["w"], (4, 4, 4), [600])
    comp = str(tmp_path / "c") + "/"
    compress_run(Config(data_dir=data_dir, min_time="plt00600",
                        max_time="plt00600", min_level=0, max_level=0,
                        components=["w"], keep=0.999, compressed_dir=comp))
    os.remove(comp + "compressed-wavelet-0-0-0-0.xz")
    with pytest.raises((IOError, OSError)):
        decompress_run(Config(compressed_dir=comp,
                              out_dir=str(tmp_path / "o") + "/"))


def test_randomized_roundtrip_property():
    """Randomized shapes (even/odd, tiny/lopsided), keeps and layouts:
    compress->mask->decompress must equal the scalar-oracle pipeline
    bitwise in every case (seeded, deterministic)."""
    import numpy as np

    from wavelet_tpu.core import oracle
    from wavelet_tpu.runtime import engine as eng_mod

    rng = np.random.default_rng(2024)
    eng = eng_mod.CodecEngine()
    for trial in range(12):
        x, y, z = (int(rng.integers(1, 12)) for _ in range(3))
        n = int(rng.integers(1, 5))
        keep = float(rng.choice([0.9, 0.999, 0.9999]))
        data = (rng.standard_normal((n, x, y, z)) *
                10.0 ** int(rng.integers(-3, 4))).astype(np.float32)
        flat, mask = eng.compress_batch(data, keep)
        recon = eng.decompress_batch(np.where(mask, flat, 0.0), (x, y, z))
        for i in range(n):
            want_c = oracle.haar_forward_oracle(data[i])
            np.testing.assert_array_equal(
                flat[i].view(np.int32), want_c.view(np.int32),
                err_msg=f"trial={trial} dims={(x,y,z)}")
            want_mask, _vals, _mx, _th = oracle.threshold_oracle(
                want_c, keep)
            np.testing.assert_array_equal(mask[i], want_mask)
            want_r = oracle.haar_inverse_oracle(
                np.where(want_mask, want_c, 0.0), x, y, z)
            np.testing.assert_array_equal(
                recon[i].view(np.int32), want_r.view(np.int32))


# ---------------------------------------------------------------------------
# round-5 review regressions: clean errors + interop quirks
# ---------------------------------------------------------------------------

def test_q16_rejects_nonfinite_and_handles_all_zero():
    from wavelet_tpu.io import archive

    runs = np.zeros(2, np.int32)
    with pytest.raises(ValueError, match="non-finite"):
        archive.serialize_payload_q16(
            (2, 2, 1), runs, np.array([np.inf, 1.0], np.float32))
    with pytest.raises(ValueError, match="non-finite"):
        archive.serialize_payload_q16(
            (2, 2, 1), runs, np.array([np.nan, 1.0], np.float32))
    # all kept values exactly zero: scale 0, q all zeros, decodes to zeros
    payload = archive.serialize_payload_q16(
        (2, 2, 1), runs, np.zeros(2, np.float32))
    _shape, total, runs2, vals2 = archive.deserialize_payload_q16(payload)
    np.testing.assert_array_equal(vals2, np.zeros(2, np.float32))


def test_payload_rejects_boxes_beyond_int32_total():
    from wavelet_tpu.io import archive

    with pytest.raises(ValueError, match="int32 total"):
        archive.serialize_payload((2048, 2048, 1024), np.zeros(0, np.int32),
                                  np.zeros(0, np.float32))
    with pytest.raises(ValueError, match="int32 total"):
        archive.serialize_payload_q16((2048, 2048, 1024),
                                      np.zeros(0, np.int32),
                                      np.zeros(0, np.float32))


def test_cli_clean_errors_for_malformed_values(capsys):
    from wavelet_tpu import cli

    # malformed numerics: clean rc=1, no traceback
    rc = cli.main(["datadir=/nonexistent", "minfile=a", "maxfile=b",
                   "minlevel=abc", "maxlevel=0", "components=x", "-c"])
    assert rc == 1
    # empty component list: validated up front
    with pytest.raises(SystemExit):
        cli.parse_argv(["datadir=/d", "minfile=a", "maxfile=b",
                        "minlevel=0", "maxlevel=0", "components=", "-c"])
    # more devices than exist: clean error, not silent truncation
    rc = cli.main(["datadir=/nonexistent", "minfile=a", "maxfile=b",
                   "minlevel=0", "maxlevel=0", "components=x", "keep=0.999",
                   "compresseddir=/tmp/nonexistent-comp/",
                   "devices=4096", "-c"])
    assert rc == 1


def test_reference_ref_ratio_quirk_normalized(tmp_path):
    """A reference-written archive stores ref_ratios {r,0,0}
    (preprocess.cpp:211-221 stream-extracts three ints from a scalar
    line); decompress must normalize to {r,r,r} instead of writing a
    Header with zero y/z domain dims (ZeroDivisionError)."""
    import filecmp
    import os
    import shutil

    from wavelet_tpu.io import archive

    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "interop_matrix")
    arch = tmp_path / "arch"
    shutil.copytree(src, arch)
    am = archive.read_amrexinfo(str(arch) + os.sep)
    assert am.ref_ratios == [2, 2, 2]
    quirked = archive.AMReXInfo(am.geomcellinfo, [2, 0, 0], am.true_times,
                                am.level_steps, am.x_dim, am.y_dim,
                                am.z_dim)
    archive.write_amrexinfo(quirked, str(arch) + os.sep)

    out_ref = str(tmp_path / "out_ref") + os.sep
    decompress_run(Config(compressed_dir=src + os.sep, out_dir=out_ref))
    out_q = str(tmp_path / "out_q") + os.sep
    decompress_run(Config(compressed_dir=str(arch) + os.sep,
                          out_dir=out_q))
    for root, _d, names in os.walk(out_ref):
        rel = os.path.relpath(root, out_ref)
        for n in names:
            assert filecmp.cmp(os.path.join(root, n),
                               os.path.join(out_q, rel, n),
                               shallow=False), f"{rel}/{n}"
