"""``-info`` mode: archive summary from sidecar metadata alone (extension;
the reference offers no way to ask an archive what it contains)."""

import os

import numpy as np
import pytest

from wavelet_tpu import cli
from wavelet_tpu.io import plotfile as pf
from wavelet_tpu.pipeline import Config, compress_run
from wavelet_tpu.pipeline.check import info_run


def _make_archive(tmp_path, **kw):
    rng = np.random.default_rng(5)
    data_dir = tmp_path / "data"
    boxes = [np.stack([rng.standard_normal((8, 8, 8)).astype(np.float32)
                       for _ in range(2)]) for _ in range(3)]
    pf.write_plotfile(str(data_dir / "plt00030"), [boxes],
                      [[(i * 8, 0, 0) for i in range(3)]],
                      [[(8, 8, 8)] * 3], ["a", "b"], 1.5, [0., 0., 0.],
                      [1., 1., 1.], (2, 2, 2), (24, 8, 8), [30])
    comp = str(tmp_path / "comp") + os.sep
    compress_run(Config(data_dir=str(data_dir), min_time="plt00030",
                        max_time="plt00030", min_level=0, max_level=0,
                        components=["a", "b"], keep=0.999,
                        compressed_dir=comp, **kw))
    return comp


@pytest.mark.parametrize("flavor", [{}, {"archive": "bundle"}])
def test_info_counts_and_sizes(tmp_path, flavor):
    comp = _make_archive(tmp_path, **flavor)
    out = info_run(Config(compressed_dir=comp))
    assert out["times"] == 1
    assert out["levels"] == [0]
    assert out["components"] == ["a", "b"]
    assert out["members"] == 6          # 3 boxes x 2 components
    assert out["missing"] == 0
    assert out["raw_bytes"] == 3 * 8 * 8 * 8 * 4 * 2
    assert out["payload_bytes"] > 0
    assert out["sidecar_bytes"] > 0
    if flavor:   # bundle container framing adds to the payload bytes
        assert out["total_bytes"] >= (out["payload_bytes"]
                                      + out["sidecar_bytes"])
    else:
        assert out["total_bytes"] == (out["payload_bytes"]
                                      + out["sidecar_bytes"])
    assert out["size_pct"] == pytest.approx(
        100.0 * out["total_bytes"] / out["raw_bytes"])
    assert out["per_time"][0]["boxes"] == 3
    assert out["flavor"]["codec"] == "xz"
    if flavor:
        assert out["flavor"]["archive"] == "bundle"


def test_info_reports_missing_members(tmp_path):
    comp = _make_archive(tmp_path)
    os.remove(os.path.join(comp, "compressed-wavelet-0-0-1-2.xz"))
    out = info_run(Config(compressed_dir=comp))
    assert out["missing"] == 1
    assert out["members"] == 5


def test_info_cli(tmp_path):
    comp = _make_archive(tmp_path)
    assert cli.main(["compresseddir=" + comp, "-info"]) == 0
    # corrupt sidecar -> clean error exit, no traceback
    with open(os.path.join(comp, "boxcounts.raw"), "wb") as f:
        f.write(b"\x00" * 2)
    assert cli.main(["compresseddir=" + comp, "-info"]) == 1


def test_help_flag():
    with pytest.raises(SystemExit):
        cli.parse_argv(["-h"])
    with pytest.raises(SystemExit):
        cli.parse_argv([])
