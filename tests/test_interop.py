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
