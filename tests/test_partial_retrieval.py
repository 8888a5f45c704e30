"""Partial retrieval on -d (extension): decompress only selected
timesteps / components / levels from an archive.  The reference always
regenerates everything (modes.cpp:115-204); selecting at retrieval time
reads only the selected payload files."""

import os

import numpy as np
import pytest

from wavelet_tpu import cli
from wavelet_tpu.io import plotfile as pf
from wavelet_tpu.pipeline import Config, compress_run, decompress_run


@pytest.fixture(scope="module")
def archive_dir(tmp_path_factory):
    """3 timesteps x 2 levels x 2 components, 2 boxes per level."""
    tmp = tmp_path_factory.mktemp("pr")
    rng = np.random.default_rng(5)
    data_dir = tmp / "data"
    for t in range(3):
        per_level = []
        locs, dims = [], []
        for lev in range(2):
            boxes = []
            for b in range(2):
                a = (rng.standard_normal((8, 8, 8)) * (t + 1)
                     ).astype(np.float32)
                bcomp = (a * 2 + 1).astype(np.float32)
                boxes.append(np.stack([a, bcomp]))
            per_level.append(boxes)
            locs.append([(0, 0, 0), (8, 0, 0)])
            dims.append([(8, 8, 8)] * 2)
        pf.write_plotfile(str(data_dir / f"plt{20 + t:05d}"), per_level,
                          locs, dims, ["a", "b"], 0.5 + t, [0., 0., 0.],
                          [1., 1., 1.], (2, 2, 2), (16, 8, 8),
                          [20 + t] * 2)
    comp = str(tmp / "comp") + os.sep
    compress_run(Config(data_dir=str(data_dir), min_time="plt00020",
                        max_time="plt00022", min_level=0, max_level=1,
                        components=["a", "b"], keep=0.999,
                        compressed_dir=comp))
    full_out = str(tmp / "full") + os.sep
    decompress_run(Config(compressed_dir=comp, out_dir=full_out))
    return comp, full_out


def test_timestep_selection(archive_dir, tmp_path):
    comp, full_out = archive_dir
    out = str(tmp_path / "o") + os.sep
    stats = decompress_run(Config(compressed_dir=comp, out_dir=out,
                                  min_time="plt00021",
                                  max_time="plt00021"))
    assert stats["times"] == 1
    assert sorted(os.listdir(out)) == ["plt00021"]
    # the selected timestep's plotfile is byte-identical to the full run's
    for root, _d, files in os.walk(os.path.join(out, "plt00021")):
        for fn in files:
            p = os.path.join(root, fn)
            q = os.path.join(full_out, os.path.relpath(p, out))
            assert open(p, "rb").read() == open(q, "rb").read(), fn


def test_component_selection(archive_dir, tmp_path):
    comp, full_out = archive_dir
    out = str(tmp_path / "o") + os.sep
    decompress_run(Config(compressed_dir=comp, out_dir=out,
                          components=["b"]))
    h = pf.read_header(os.path.join(out, "plt00020"))
    assert h.component_names == ["b"]
    lv = pf.read_level(os.path.join(out, "plt00020"), 0, [0])
    want = pf.read_level(os.path.join(full_out, "plt00020"), 0, [1])
    for got, ref in zip(lv.boxes, want.boxes):
        np.testing.assert_array_equal(got, ref)


def test_level_selection(archive_dir, tmp_path):
    comp, full_out = archive_dir
    out = str(tmp_path / "o") + os.sep
    stats = decompress_run(Config(compressed_dir=comp, out_dir=out,
                                  levels_upto=0))
    assert stats["levels"] == 1
    assert not os.path.isdir(os.path.join(out, "plt00020", "Level_1"))
    # the Header must be a CONSISTENT single-level header: exactly one
    # level-steps token (an unsliced vector would corrupt token-based
    # AMReX parsers even though our line-based reader tolerates it)
    h = pf.read_header(os.path.join(out, "plt00020"))
    assert h.level_steps == [20]
    lv = pf.read_level(os.path.join(out, "plt00020"), 0, [0, 1])
    want = pf.read_level(os.path.join(full_out, "plt00020"), 0, [0, 1])
    for got, ref in zip(lv.boxes, want.boxes):
        np.testing.assert_array_equal(got, ref)


def test_combined_selection_reads_only_selected_payloads(archive_dir,
                                                         tmp_path,
                                                         monkeypatch):
    """The point of partial retrieval: unselected payload files are never
    requested (the packer's path resolution sees only the selection)."""
    from wavelet_tpu.runtime import engine

    comp, _full = archive_dir
    out = str(tmp_path / "o") + os.sep
    opened = []
    real_paths = engine.HostPacker._paths

    def spy_paths(self, dir_, items):
        paths = real_paths(self, dir_, items)
        opened.extend(os.path.basename(p) for p in paths)
        return paths

    monkeypatch.setattr(engine.HostPacker, "_paths", spy_paths)
    decompress_run(Config(compressed_dir=comp, out_dir=out,
                          min_time="plt00022", components=["a"],
                          levels_upto=0))
    # t=2, level 0, component a (header idx 0), 2 boxes
    assert sorted(opened) == ["compressed-wavelet-2-0-0-0.xz",
                              "compressed-wavelet-2-0-0-1.xz"]


def test_selection_errors(archive_dir, tmp_path):
    comp, _full = archive_dir
    out = str(tmp_path / "o") + os.sep
    with pytest.raises(ValueError, match="components not in archive"):
        decompress_run(Config(compressed_dir=comp, out_dir=out,
                              components=["nope"]))
    with pytest.raises(ValueError, match="no archived timestep"):
        decompress_run(Config(compressed_dir=comp, out_dir=out,
                              min_time="plt99999"))
    with pytest.raises(ValueError, match="selects no archive level"):
        decompress_run(Config(compressed_dir=comp, out_dir=out,
                              levels_upto=-1))


def test_partial_retrieval_bundle_mode(tmp_path):
    """Selection works identically on bundle archives (keyed member
    lookups read only the selected blobs)."""
    rng = np.random.default_rng(6)
    data_dir = tmp_path / "data"
    for t in range(2):
        boxes = [np.stack([(rng.standard_normal((8, 8, 8)) * (t + 1)
                            ).astype(np.float32),
                           (rng.standard_normal((8, 8, 8)) + 2
                            ).astype(np.float32)])]
        pf.write_plotfile(str(data_dir / f"plt{30 + t:05d}"), [boxes],
                          [[(0, 0, 0)]], [[(8, 8, 8)]], ["a", "b"],
                          0.5 + t, [0., 0., 0.], [1., 1., 1.], (2, 2, 2),
                          (8, 8, 8), [30 + t])
    comp = str(tmp_path / "comp") + os.sep
    compress_run(Config(data_dir=str(data_dir), min_time="plt00030",
                        max_time="plt00031", min_level=0, max_level=0,
                        components=["a", "b"], keep=0.999,
                        compressed_dir=comp, codec="raw",
                        archive="bundle"))
    full = str(tmp_path / "full") + os.sep
    decompress_run(Config(compressed_dir=comp, out_dir=full))
    out = str(tmp_path / "o") + os.sep
    stats = decompress_run(Config(compressed_dir=comp, out_dir=out,
                                  min_time="plt00031", components=["b"]))
    assert stats["times"] == 1
    assert sorted(os.listdir(out)) == ["plt00031"]
    lv = pf.read_level(os.path.join(out, "plt00031"), 0, [0])
    want = pf.read_level(os.path.join(full, "plt00031"), 0, [1])
    np.testing.assert_array_equal(lv.boxes[0], want.boxes[0])


def test_compress_refuses_mixed_archive(archive_dir, tmp_path):
    """Compressing a DIFFERENT selection into a populated archive would
    clobber the sidecars while stale payloads linger — refused; rerunning
    the identical selection (resume / multi-process) stays allowed."""
    comp, _full = archive_dir
    from wavelet_tpu.io import archive as ar

    info = ar.read_runinfo(comp)
    data_dir = os.path.dirname(info.files[0])
    same = dict(data_dir=data_dir, min_time="plt00020",
                max_time="plt00022", min_level=0, max_level=1,
                components=["a", "b"], keep=0.999, compressed_dir=comp)
    # identical selection: benign (resume semantics)
    compress_run(Config(**same, resume=True))
    # different selection into the same dir: refused
    with pytest.raises(ValueError, match="different run's archive"):
        compress_run(Config(**{**same, "components": ["a"]}))


def test_cli_partial_retrieval_keys():
    mode, cfg = cli.parse_argv([
        "compresseddir=/c/", "out=/o/", "minfile=plt00021",
        "components=b", "maxlevel=0", "-d"])
    assert mode == "d"
    assert cfg.min_time == "plt00021" and cfg.max_time == ""
    assert cfg.components == ["b"]
    assert cfg.levels_upto == 0
