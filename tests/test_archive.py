"""Round-trip tests for archive byte formats (tier-2, SURVEY.md §6):
sidecars and .xz payloads, mirroring readandwrite.cpp:398-490 and
compressor.cpp:342-366 test cases."""

import lzma
import struct

import numpy as np

from wavelet_tpu.io import archive as ar


def test_payload_serialize_layout():
    """The exact byte layout of compressor.cpp:55-80."""
    runs = np.array([0, 0, 2], dtype=np.int32)
    vals = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    blob = ar.serialize_payload((4, 8, 16), runs, vals)
    assert len(blob) == 20 + 3 * 8
    assert struct.unpack_from("<5i", blob) == (4, 8, 16, 512, 3)
    assert struct.unpack_from("<if", blob, 20) == (0, 1.0)
    assert struct.unpack_from("<if", blob, 36) == (2, 3.0)


def test_payload_roundtrip_random():
    rng = np.random.default_rng(1)
    for _ in range(5):
        shape = tuple(int(v) for v in rng.integers(1, 100, 3))
        n = int(rng.integers(0, 50))
        runs = rng.integers(0, 10, n).astype(np.int32)
        vals = rng.standard_normal(n).astype(np.float32)
        blob = ar.xz_compress(ar.serialize_payload(shape, runs, vals))
        shape2, total, runs2, vals2 = ar.deserialize_payload(ar.xz_decompress(blob))
        assert shape2 == shape and total == int(np.prod(shape))
        np.testing.assert_array_equal(runs2, runs)
        np.testing.assert_array_equal(vals2, vals)


def test_xz_container_flags():
    """CRC64 check type, as lzma_easy_encoder(6, LZMA_CHECK_CRC64) produces."""
    blob = ar.xz_compress(b"hello world")
    # xz stream header: magic (6 bytes) + stream flags; flags byte 1 & 0x0F
    # encodes the check: 4 = CRC64
    assert blob[:6] == b"\xfd7zXZ\x00"
    assert blob[7] & 0x0F == 4
    assert lzma.decompress(blob) == b"hello world"


def test_runinfo_roundtrip(tmp_path):
    """Mirror of TEST_CASE("Read/write runinfo") readandwrite.cpp:469-490."""
    info = ar.RunInfo(["../../../raw/plt00740", "../../../raw/plt07500"],
                      0, 3, ["Temp", "pressure"], [6, 25])
    ar.write_runinfo(info, str(tmp_path))
    assert ar.read_runinfo(str(tmp_path)) == info


def test_locdim_roundtrip(tmp_path):
    """Mirror of TEST_CASE("Read/write Loc/Dim data") readandwrite.cpp:398-421."""
    data = [[[(0, 14, 44)], [(0, 14, 44)]],
            [[(0, 14, 44)], [(0, 14, 44)]]]
    ar.write_locdim(data, str(tmp_path), "test.raw")
    counts = [[1, 1], [1, 1]]
    out = ar.read_locdim(str(tmp_path), "test.raw", counts)
    assert out == data


def test_boxcounts_roundtrip(tmp_path):
    counts = [[403, 404, 333], [403, 404, 333]]
    ar.write_boxcounts(counts, str(tmp_path))
    assert ar.read_boxcounts(str(tmp_path), 2, 3) == counts


def test_amrexinfo_roundtrip(tmp_path):
    """Mirror of TEST_CASE("Read/write amrexinfo") readandwrite.cpp:441-466,
    including 16-byte long double true_times."""
    info = ar.AMReXInfo(
        geomcellinfo=[[0.6, 0.5, 0.4], [0.8, 0.9, 1.0]],
        ref_ratios=[2, 2, 2],
        true_times=[np.longdouble("0.2219392"), np.longdouble("0.3874982")],
        level_steps=[[1200, 1500], [1800, 2000]],
        x_dim=256, y_dim=512, z_dim=256)
    ar.write_amrexinfo(info, str(tmp_path))
    back = ar.read_amrexinfo(str(tmp_path))
    assert back.geomcellinfo == info.geomcellinfo
    assert back.ref_ratios == info.ref_ratios
    assert all(a == b for a, b in zip(back.true_times, info.true_times))
    assert back.level_steps == info.level_steps
    assert (back.x_dim, back.y_dim, back.z_dim) == (256, 512, 256)
    # long double slots must be 16 bytes on x86-64 for C++ interop
    assert np.dtype(np.longdouble).itemsize == 16


def test_filename_contract():
    assert ar.payload_filename(0, 1, 6, 3) == "compressed-wavelet-0-1-6-3.xz"
