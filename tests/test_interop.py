"""Decode foreign bytes: the hand-assembled reference-format archive
(tests/fixtures/interop_archive, authored byte-by-byte from
readandwrite.cpp:226-395 / compressor.cpp:55-80 layouts by
scripts/make_interop_fixture.py — NOT by wavelet_tpu's own serializers)
must decompress with the unmodified pipeline.  Plus corrupt-payload fuzz
cases for the unpack paths (truncated xz, oversized totals).
"""

import lzma
import os
import shutil
import struct

import numpy as np
import pytest

from wavelet_tpu import native
from wavelet_tpu.core import oracle
from wavelet_tpu.io import archive
from wavelet_tpu.pipeline import Config, decompress_run

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures", "interop_archive")


def test_foreign_archive_decompresses(tmp_path):
    out_dir = str(tmp_path / "out") + os.sep
    cfg = Config(compressed_dir=FIXDIR + os.sep, out_dir=out_dir)
    stats = decompress_run(cfg)
    assert stats["times"] == 1 and stats["boxes"] == 2

    from wavelet_tpu.io import plotfile as pf

    plt = os.path.join(out_dir, "plt00099")
    assert os.path.isdir(plt)
    lv = pf.read_level(plt, 0, [0])

    # box 0: payload was one pair (0, 3.25) — the low coefficient of a
    # constant box; inverse Haar reconstructs the constant exactly
    np.testing.assert_array_equal(lv.boxes[0][0],
                                  np.full((4, 4, 2), 3.25, np.float32))

    # box 1: coefficients at flat indices 0, 5, 31 — expected box via the
    # independently-validated scalar oracle of the C++ inverse
    coeffs = np.zeros(32, np.float32)
    coeffs[0], coeffs[5], coeffs[31] = 1.5, -2.0, 0.25
    expect = oracle.haar_inverse_oracle(coeffs, 4, 4, 2)
    np.testing.assert_array_equal(lv.boxes[1][0], expect)

    # header metadata carried through: time and component name
    h = pf.read_header(plt)
    assert h.component_names == ["temp"]
    assert h.time == 0.5


def test_foreign_archive_header_fields():
    """Sidecars parse to the exact hand-authored values."""
    info = archive.read_runinfo(FIXDIR)
    assert info.files == ["plt00099"]
    assert info.components == ["temp"] and info.comp_idxs == [0]
    counts = archive.read_boxcounts(FIXDIR, 1, 1)
    assert counts == [[2]]
    am = archive.read_amrexinfo(FIXDIR)
    assert float(am.true_times[0]) == 0.5
    assert (am.x_dim, am.y_dim, am.z_dim) == (8, 4, 2)
    assert am.ref_ratios == [2, 2, 2]


def _copy_fixture(tmp_path):
    d = tmp_path / "arch"
    shutil.copytree(FIXDIR, d)
    return str(d)


def test_truncated_xz_payload_clean_error(tmp_path):
    d = _copy_fixture(tmp_path)
    p = os.path.join(d, "compressed-wavelet-0-0-0-0.xz")
    blob = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(blob[: len(blob) // 2])
    cfg = Config(compressed_dir=d + os.sep,
                 out_dir=str(tmp_path / "out") + os.sep)
    with pytest.raises((ValueError, OSError, lzma.LZMAError, EOFError)):
        decompress_run(cfg)


def test_oversized_total_clean_error(tmp_path):
    """A payload claiming more coefficients than the box holds must be
    rejected (both backends), not scatter out of bounds."""
    d = _copy_fixture(tmp_path)
    p = os.path.join(d, "compressed-wavelet-0-0-0-0.xz")
    bad = struct.pack("<5i", 4, 4, 2, 1 << 20, 1) + struct.pack("<if", 0, 1.0)
    with open(p, "wb") as f:
        f.write(archive.xz_compress(bad))
    cfg = Config(compressed_dir=d + os.sep,
                 out_dir=str(tmp_path / "out") + os.sep)
    with pytest.raises((ValueError, OSError)):
        decompress_run(cfg)


def test_wrong_shape_payload_clean_error(tmp_path):
    """Payload shape disagreeing with dimensions.raw must be detected."""
    d = _copy_fixture(tmp_path)
    p = os.path.join(d, "compressed-wavelet-0-0-0-0.xz")
    bad = struct.pack("<5i", 8, 8, 8, 512, 1) + struct.pack("<if", 0, 1.0)
    with open(p, "wb") as f:
        f.write(archive.xz_compress(bad))
    cfg = Config(compressed_dir=d + os.sep,
                 out_dir=str(tmp_path / "out") + os.sep)
    with pytest.raises((ValueError, OSError)):
        decompress_run(cfg)


@pytest.mark.skipif(not native.available(), reason="native codec not built")
def test_native_unpack_rejects_oversized_total(tmp_path):
    bad = struct.pack("<5i", 4, 4, 2, 1 << 20, 1) + struct.pack("<if", 0, 1.0)
    p = str(tmp_path / "bad.xz")
    with open(p, "wb") as f:
        f.write(archive.xz_compress(bad))
    with pytest.raises(IOError):
        native.unpack_batch([p], 32)


@pytest.mark.skipif(not native.available(), reason="native codec not built")
def test_native_unpack_rejects_truncated_xz(tmp_path):
    good = archive.xz_compress(
        struct.pack("<5i", 4, 4, 2, 32, 1) + struct.pack("<if", 0, 1.0))
    p = str(tmp_path / "trunc.xz")
    with open(p, "wb") as f:
        f.write(good[: len(good) // 2])
    with pytest.raises(IOError):
        native.unpack_batch([p], 32)


# ---------------------------------------------------------------------------
# Quirk-corner interop matrix (round-4 verdict item 6): foreign bytes for
# odd dims, negative absmax, varying boxcounts, empty RLE — the strongest
# available substitute for running the unbuildable C++ binary.
# ---------------------------------------------------------------------------

MATRIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "fixtures", "interop_matrix")


def _matrix_payload_bytes(d, t, lev, cidx, box):
    with open(os.path.join(
            d, f"compressed-wavelet-{t}-{lev}-{cidx}-{box}.xz"), "rb") as f:
        return f.read()


def test_matrix_decodes_and_matches_oracle(tmp_path):
    """Every box of the matrix archive decodes with the unmodified
    pipeline to exactly the scalar oracle's inverse of the authored
    coefficients (odd-dim zeroing, negative-absmax full payloads, empty
    RLE and multi-level/timestep boxcounts all included)."""
    out_dir = str(tmp_path / "out") + os.sep
    stats = decompress_run(Config(compressed_dir=MATRIXDIR + os.sep,
                                  out_dir=out_dir))
    assert stats["times"] == 2 and stats["boxes"] == 6

    from wavelet_tpu.io import plotfile as pf

    # authored coefficient sets, keyed like the generator's payload map
    def low_block(shape, val):
        x, y, z = shape
        flat = np.zeros(x * y * z, np.float32)
        for i in range(x // 2):
            for j in range(y // 2):
                for k in range(z // 2):
                    flat[k + z * (j + y * i)] = val
        return flat

    neg_mix = np.array([-4.0, 0.5, 0.0, 1.0, -0.25, 0.0, 2.0, -1.0,
                        0.75, 0.0, 0.5, -0.5, 1.25, 0.0, -2.0, 0.25],
                       np.float32)
    odd_temp = np.zeros(24, np.float32); odd_temp[[0, 7]] = [2.0, -0.5]
    odd_vel = np.zeros(24, np.float32); odd_vel[1] = 0.75
    sp_vel = np.zeros(8, np.float32); sp_vel[[0, 5]] = [2.0, 0.5]
    sp_temp = np.zeros(64, np.float32); sp_temp[[0, 9, 63]] = [4.0, 1.0, -0.5]

    # (plt, lev, comp_pos, box) -> (shape, coeff flat)
    cases = {
        ("plt00101", 0, 0, 0): ((4, 4, 2), low_block((4, 4, 2), 3.25)),
        ("plt00101", 0, 1, 0): ((4, 4, 2), low_block((4, 4, 2), -1.25)),
        ("plt00101", 0, 0, 1): ((3, 4, 2), odd_temp),
        ("plt00101", 0, 1, 1): ((3, 4, 2), odd_vel),
        ("plt00101", 1, 0, 0): ((4, 2, 2), neg_mix),
        ("plt00101", 1, 1, 0): ((4, 2, 2), low_block((4, 2, 2), 2.5)),
        ("plt00103", 0, 0, 0): ((4, 4, 2), np.zeros(32, np.float32)),
        ("plt00103", 0, 1, 0): ((4, 4, 2), np.zeros(32, np.float32)),
        ("plt00103", 1, 0, 0): ((2, 2, 2), low_block((2, 2, 2), 1.5)),
        ("plt00103", 1, 1, 0): ((2, 2, 2), sp_vel),
        ("plt00103", 1, 0, 1): ((4, 4, 4), sp_temp),
        ("plt00103", 1, 1, 1): ((4, 4, 4), low_block((4, 4, 4), 0.75)),
    }
    levels = {}
    for (plt, lev, cpos, box), (shape, flat) in cases.items():
        key = (plt, lev)
        if key not in levels:
            levels[key] = pf.read_level(os.path.join(out_dir, plt), lev,
                                        [0, 1])
        got = levels[key].boxes[box][cpos]
        expect = oracle.haar_inverse_oracle(flat, *shape)
        np.testing.assert_array_equal(
            got, expect, err_msg=f"{plt} lev{lev} comp{cpos} box{box}")

    # times carried through the 80-bit long doubles
    assert pf.read_header(os.path.join(out_dir, "plt00101")).time == 0.25
    assert pf.read_header(os.path.join(out_dir, "plt00103")).time == 0.75


def test_matrix_reencode_fixed_points(tmp_path):
    """Decode the matrix archive, re-compress the regenerated plotfiles
    with the unmodified pipeline at keep=0.999, and byte-compare every
    fixed-point payload: constant-positive boxes, negative-absmax full
    payloads (threshold < 0 keeps everything, zeros included), empty
    payloads from zero boxes, and sparse dyadic positives.  The odd-dim
    box is exempt (inverse zeroing is lossy by design).  Component 'vel'
    sat at header index 2 in the foreign archive but index 1 in the
    regenerated plotfiles — the filename map below is that translation.
    """
    out_dir = str(tmp_path / "out") + os.sep
    decompress_run(Config(compressed_dir=MATRIXDIR + os.sep,
                          out_dir=out_dir))
    re_dir = str(tmp_path / "re") + os.sep
    from wavelet_tpu.pipeline import compress_run

    compress_run(Config(data_dir=out_dir, min_time="plt00101",
                        max_time="plt00103", min_level=0, max_level=1,
                        components=["temp", "vel"], keep=0.999,
                        compressed_dir=re_dir))
    # (t, lev, foreign_cidx, box) fixed points; foreign idx 0 -> new 0,
    # foreign 2 -> new 1
    fixed = [(0, 0, 0, 0), (0, 0, 2, 0), (0, 1, 0, 0), (0, 1, 2, 0),
             (1, 0, 0, 0), (1, 0, 2, 0), (1, 1, 0, 0), (1, 1, 2, 0),
             (1, 1, 0, 1), (1, 1, 2, 1)]
    for (t, lev, cidx, box) in fixed:
        foreign = _matrix_payload_bytes(MATRIXDIR, t, lev, cidx, box)
        ours = _matrix_payload_bytes(re_dir, t, lev, 0 if cidx == 0 else 1,
                                     box)
        assert foreign == ours, (t, lev, cidx, box)


def test_matrix_sidecar_fields():
    info = archive.read_runinfo(MATRIXDIR)
    assert info.files == ["plt00101", "plt00103"]
    assert info.components == ["temp", "vel"]
    assert info.comp_idxs == [0, 2]
    counts = archive.read_boxcounts(MATRIXDIR, 2, 2)
    assert counts == [[2, 1], [1, 2]]
    am = archive.read_amrexinfo(MATRIXDIR)
    assert [float(v) for v in am.true_times] == [0.25, 0.75]
    assert am.level_steps == [[101, 202], [103, 206]]
