"""Native C++ host codec: cross-compatibility with the Python archive path.

The shared library is built on first import (g++ available in this image);
tests skip gracefully where it isn't.
"""

import os

import numpy as np
import pytest

from wavelet_tpu import native
from wavelet_tpu.core import rle
from wavelet_tpu.core import threshold
from wavelet_tpu.io import archive
from wavelet_tpu.runtime import batching, engine

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native codec not built")


def _mk(n, dims, seed=0):
    rng = np.random.default_rng(seed)
    flat = (rng.standard_normal((n, int(np.prod(dims)))) *
            rng.integers(0, 2, (n, int(np.prod(dims))))).astype(np.float32)
    maxv = np.max(np.abs(flat), axis=1) * np.where(
        np.arange(n) % 2, 1.0, -1.0).astype(np.float32)
    t32 = threshold.exact_threshold32(maxv.astype(np.float32), 0.99)
    return flat, t32


@needs_native
def test_native_pack_python_unpack(tmp_path):
    dims = (4, 8, 16)
    flat, t32 = _mk(6, dims)
    paths = [str(tmp_path / f"item{i}.xz") for i in range(6)]
    total = native.pack_batch(flat, t32, dims, paths)
    assert total == sum(os.path.getsize(p) for p in paths)
    for i, p in enumerate(paths):
        payload = archive.xz_decompress(open(p, "rb").read())
        shape, n_coeffs, runs, vals = archive.deserialize_payload(payload)
        assert shape == dims and n_coeffs == flat.shape[1]
        mask = np.abs(flat[i]) > t32[i]
        want_runs, want_vals = rle.rle_encode_mask(mask, flat[i])
        np.testing.assert_array_equal(runs, want_runs)
        np.testing.assert_array_equal(vals, want_vals)


@needs_native
def test_python_pack_native_unpack(tmp_path):
    dims = (8, 4, 2)
    flat, t32 = _mk(5, dims, seed=3)
    paths = []
    for i in range(5):
        mask = np.abs(flat[i]) > t32[i]
        runs, vals = rle.rle_encode_mask(mask, flat[i])
        blob = archive.xz_compress(archive.serialize_payload(dims, runs, vals))
        p = str(tmp_path / f"py{i}.xz")
        open(p, "wb").write(blob)
        paths.append(p)
    out, shapes = native.unpack_batch(paths, int(np.prod(dims)))
    np.testing.assert_array_equal(shapes, np.tile(dims, (5, 1)))
    for i in range(5):
        mask = np.abs(flat[i]) > t32[i]
        np.testing.assert_array_equal(out[i], np.where(mask, flat[i], 0.0))


@needs_native
def test_native_roundtrip_identity(tmp_path):
    dims = (16, 32, 64)
    flat, t32 = _mk(4, dims, seed=7)
    paths = [str(tmp_path / f"rt{i}.xz") for i in range(4)]
    native.pack_batch(flat, t32, dims, paths)
    out, _ = native.unpack_batch(paths, int(np.prod(dims)))
    for i in range(4):
        mask = np.abs(flat[i]) > t32[i]
        np.testing.assert_array_equal(out[i], np.where(mask, flat[i], 0.0))


@needs_native
def test_packer_backends_byte_identical(tmp_path):
    """HostPacker native and python backends produce identical files."""
    dims = (4, 4, 4)
    flat, t32 = _mk(3, dims, seed=11)
    items = [batching.WorkItem(0, 0, c, 0) for c in range(3)]
    cb = batching.ShapeBatch(shape=dims, data=flat.reshape((-1,) + dims),
                             items=items, n_valid=3)
    d_nat = tmp_path / "nat"; d_py = tmp_path / "py"
    d_nat.mkdir(); d_py.mkdir()
    engine.HostPacker(use_native=True).pack(str(d_nat), cb, t32)
    engine.HostPacker(use_native=False).pack(str(d_py), cb, t32)
    for it in items:
        name = archive.payload_filename(it.t, it.level, it.comp_idx, it.box)
        a = open(d_nat / name, "rb").read()
        b = open(d_py / name, "rb").read()
        # FULL container equality: since round 5 the python backend
        # re-frames stdlib lzma's stream into the exact
        # lzma_easy_buffer_encode layout the native backend (and the C++
        # reference) emits — archive bytes are backend-independent
        assert a == b, name


@needs_native
def test_packer_backends_byte_identical_xzdelta(tmp_path):
    """Backend container parity holds with the delta filter chain too
    (two filter entries in the re-framed block header)."""
    dims = (4, 4, 4)
    flat, t32 = _mk(3, dims, seed=12)
    items = [batching.WorkItem(0, 0, c, 0) for c in range(3)]
    cb = batching.ShapeBatch(shape=dims, data=flat.reshape((-1,) + dims),
                             items=items, n_valid=3)
    d_nat = tmp_path / "nat"; d_py = tmp_path / "py"
    d_nat.mkdir(); d_py.mkdir()
    engine.HostPacker(use_native=True, xz_delta=8).pack(str(d_nat), cb, t32)
    engine.HostPacker(use_native=False, xz_delta=8).pack(str(d_py), cb, t32)
    for it in items:
        name = archive.payload_filename(it.t, it.level, it.comp_idx, it.box)
        a = open(d_nat / name, "rb").read()
        b = open(d_py / name, "rb").read()
        assert a == b, name


@needs_native
def test_native_q16_matches_python(tmp_path):
    """Native q16 serializer produces byte-identical payloads to the Python
    path, including numpy's round-half-to-even quantization."""
    dims = (4, 8, 16)
    flat, t32 = _mk(5, dims, seed=21)
    items = [batching.WorkItem(0, 0, c, 0) for c in range(5)]
    cb = batching.ShapeBatch(shape=dims, data=flat.reshape((-1,) + dims),
                             items=items, n_valid=5)
    d_nat = tmp_path / "nat"; d_py = tmp_path / "py"
    d_nat.mkdir(); d_py.mkdir()
    engine.HostPacker(use_native=True, payload="q16").pack(str(d_nat), cb, t32)
    engine.HostPacker(use_native=False, payload="q16").pack(str(d_py), cb, t32)
    for it in items:
        name = archive.payload_filename(it.t, it.level, it.comp_idx, it.box)
        a = archive.xz_decompress(open(d_nat / name, "rb").read())
        b = archive.xz_decompress(open(d_py / name, "rb").read())
        assert a == b


@needs_native
def test_native_q16_unpack_roundtrip(tmp_path):
    dims = (8, 4, 2)
    flat, t32 = _mk(4, dims, seed=22)
    items = [batching.WorkItem(0, 0, c, 0) for c in range(4)]
    cb = batching.ShapeBatch(shape=dims, data=flat.reshape((-1,) + dims),
                             items=items, n_valid=4)
    packer = engine.HostPacker(use_native=True, payload="q16")
    packer.pack(str(tmp_path), cb, t32)
    dest = batching.empty_batch(items, dims)
    packer.unpack_into(str(tmp_path), dest)
    # python unpack agrees
    dest2 = batching.empty_batch(items, dims)
    engine.HostPacker(use_native=False, payload="q16").unpack_into(
        str(tmp_path), dest2)
    np.testing.assert_array_equal(dest.data, dest2.data)


def test_native_q16_zero_scale_matches_python():
    """All kept values exactly 0.0 (negative-absmax regime): both
    backends must emit q=0, not the int16 cast of 0/0 = NaN (round-5
    review: the native path clamped NaN to -32767, diverging byte-wise
    from the python packer)."""
    if not native.available():
        pytest.skip("native codec unavailable")
    from wavelet_tpu.io import archive

    dims = (2, 2, 2)
    flat = np.zeros((1, 8), np.float32)
    t32 = np.full(1, np.float32(-1.0))          # threshold < 0 keeps all
    offs = np.zeros(1, np.int64)
    blobs = native.encode_strided(flat, t32, dims, 1, 8, 8, offs,
                                  payload="q16", codec="raw")
    py_runs = np.zeros(8, np.int32)
    py_payload = archive.serialize_payload_q16(dims, py_runs,
                                               np.zeros(8, np.float32))
    py_blob = archive.encode_blob(py_payload, "raw", 6)
    assert blobs[0] == py_blob


def test_native_q16_rejects_nonfinite():
    """inf/NaN kept coefficients must fail the item (the python packer
    raises ValueError; silently encoding scale=inf would decode the whole
    box as NaN)."""
    if not native.available():
        pytest.skip("native codec unavailable")
    flat = np.array([[np.inf, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]],
                    np.float32)
    t32 = np.full(1, np.float32(0.5))
    offs = np.zeros(1, np.int64)
    with pytest.raises(IOError):
        native.encode_strided(flat, t32, (2, 2, 2), 1, 8, 8, offs,
                              payload="q16", codec="raw")
