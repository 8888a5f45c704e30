"""Archive integrity-check mode (-check): sound archives pass, each
corruption class is diagnosed per file with a clean error (no traceback)."""

import os
import shutil
import struct

import numpy as np
import pytest

from wavelet_tpu.io import archive, plotfile as pf
from wavelet_tpu.pipeline import Config, check_run, compress_run
from wavelet_tpu import cli


@pytest.fixture
def arch(tmp_path):
    rng = np.random.default_rng(6)
    boxes = []
    for b in range(2):
        smooth = np.fromfunction(
            lambda i, j, k: np.sin(0.2 * (i + b)) + 0.1 * j, (8, 8, 8)
        ).astype(np.float32)
        boxes.append(np.stack([smooth,
                               smooth + 0.01 * rng.standard_normal((8, 8, 8))
                               .astype(np.float32)]))
    pf.write_plotfile(str(tmp_path / "data" / "plt00070"),
                      [boxes], [[(0, 0, 0), (8, 0, 0)]], [[(8, 8, 8)] * 2],
                      ["a", "b"], 0.5, [0., 0., 0.], [1., 1., 1.],
                      (2, 2, 2), (16, 8, 8), [70])
    comp = str(tmp_path / "comp") + os.sep
    compress_run(Config(data_dir=str(tmp_path / "data"), min_time="plt00070",
                        max_time="plt00070", min_level=0, max_level=0,
                        components=["a", "b"], keep=0.999,
                        compressed_dir=comp))
    return comp


def test_check_passes_on_sound_archive(arch):
    r = check_run(Config(compressed_dir=arch))
    assert r["errors"] == [] and r["files"] == 4


def test_check_cli_exit_codes(arch, tmp_path):
    assert cli.main([f"compresseddir={arch}", "-check"]) == 0
    os.remove(os.path.join(arch, "compressed-wavelet-0-0-1-1.xz"))
    assert cli.main([f"compresseddir={arch}", "-check"]) == 1


def test_check_diagnoses_each_corruption(arch):
    # missing file
    os.remove(os.path.join(arch, "compressed-wavelet-0-0-0-0.xz"))
    # truncated container
    p1 = os.path.join(arch, "compressed-wavelet-0-0-0-1.xz")
    blob = open(p1, "rb").read()
    open(p1, "wb").write(blob[: len(blob) // 2])
    # wrong shape header
    p2 = os.path.join(arch, "compressed-wavelet-0-0-1-0.xz")
    bad = struct.pack("<5i", 4, 4, 4, 64, 1) + struct.pack("<if", 0, 1.0)
    open(p2, "wb").write(archive.xz_compress(bad))
    # negative run
    p3 = os.path.join(arch, "compressed-wavelet-0-0-1-1.xz")
    bad = struct.pack("<5i", 8, 8, 8, 512, 1) + struct.pack("<if", -5, 1.0)
    open(p3, "wb").write(archive.xz_compress(bad))

    r = check_run(Config(compressed_dir=arch))
    assert len(r["errors"]) == 4
    text = "\n".join(r["errors"])
    assert "missing payload" in text
    assert "container decode failed" in text
    assert "payload shape" in text
    assert "negative RLE run" in text


def test_check_reports_sidecar_damage(arch):
    os.truncate(os.path.join(arch, "boxcounts.raw"), 0)
    r = check_run(Config(compressed_dir=arch))
    assert r["errors"] and "sidecar" in r["errors"][0]


def test_check_detects_sidecar_bit_flip(arch):
    """A single flipped byte in locations.raw parses fine (it is just a
    float) — only the recorded sidecar CRC32 catches it."""
    p = os.path.join(arch, "locations.raw")
    data = bytearray(open(p, "rb").read())
    data[len(data) // 2] ^= 0x01
    open(p, "wb").write(bytes(data))
    r = check_run(Config(compressed_dir=arch))
    assert any("locations.raw: CRC32 mismatch" in e for e in r["errors"])
