"""Seeded randomized corruption fuzz over the unpack backends.

Both backends must survive arbitrary mutations of archive members —
reject structurally invalid streams with a clean error (never crash;
a native segfault would take down the test process) — and AGREE with
each other: any mutation the python path decodes, the native path must
decode to the same bytes, and vice versa.
"""

import os

import numpy as np
import pytest

from wavelet_tpu import native
from wavelet_tpu.core import rle
from wavelet_tpu.io import archive

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native codec unavailable")

DIMS = (8, 8, 8)
M = 512


def _make_member(codec: str, payload_fmt: str, rng) -> bytes:
    flat = np.zeros(M, np.float32)
    idx = rng.choice(M, 40, replace=False)
    flat[idx] = rng.standard_normal(40).astype(np.float32) * 10
    mask = flat != 0
    runs, vals = rle.rle_encode_mask(mask, flat)
    if payload_fmt == "q16":
        payload = archive.serialize_payload_q16(DIMS, runs, vals)
    else:
        payload = archive.serialize_payload(DIMS, runs, vals)
    return archive.encode_blob(payload, codec)


def _mutate(blob: bytes, rng) -> bytes:
    b = bytearray(blob)
    kind = rng.integers(0, 4)
    if kind == 0 and len(b) > 1:          # truncate
        return bytes(b[: rng.integers(1, len(b))])
    if kind == 1:                          # flip random bytes
        for _ in range(int(rng.integers(1, 6))):
            b[rng.integers(0, len(b))] ^= int(rng.integers(1, 256))
        return bytes(b)
    if kind == 2:                          # random garbage of random size
        return bytes(rng.integers(0, 256, int(rng.integers(1, 512)),
                                  dtype=np.uint8))
    # splice: prepend/append random bytes
    junk = bytes(rng.integers(0, 256, int(rng.integers(1, 64)),
                              dtype=np.uint8))
    return junk + bytes(b) if rng.integers(0, 2) else bytes(b) + junk


def _native_decode(path: str, codec: str, payload_fmt: str):
    """-> decoded flat row or None (clean rejection)."""
    dest = np.zeros(M, np.float32)
    try:
        native.unpack_strided([path], dest, 1, M, M,
                              np.zeros(1, np.int64), n_threads=1,
                              payload=payload_fmt, codec=codec)
    except (IOError, OSError, ValueError):
        return None
    return dest


def _python_decode(blob: bytes, payload_fmt: str, codec: str):
    try:
        payload = archive.decode_blob(blob, codec)
        if payload_fmt == "q16":
            shape, total, runs, vals = archive.deserialize_payload_q16(
                payload)
        else:
            shape, total, runs, vals = archive.deserialize_payload(payload)
        if tuple(shape) != DIMS or int(total) != M:
            return None
        return rle.rle_decode(runs, vals, total)
    except (ValueError, OSError, EOFError):
        return None


def test_fuzz_corrupt_bundle_container_raises_cleanly(tmp_path):
    """Random mutations of a .wtb bundle container: index parsing and
    member reads must raise only the clean-error family, never crash.
    Located members either come back byte-intact (and must decode) or
    mutated — where the CRC frame catches the corruption unless the
    mutation also destroyed the frame magic (the documented
    legacy-frameless sniffing trade-off in archive.decode_blob)."""
    from wavelet_tpu.io import bundle as bundle_mod

    rng = np.random.default_rng(77)
    d = str(tmp_path / "arch")
    os.makedirs(d)
    w = bundle_mod.BundleWriter(os.path.join(d, bundle_mod.bundle_name(0, 0)))
    blobs = {}
    for b in range(4):
        blob = _make_member("raw", "f32", rng)
        w.add(0, 0, 0, b, blob)
        blobs[b] = blob
    w.close()
    path = os.path.join(d, bundle_mod.bundle_name(0, 0))
    good = open(path, "rb").read()
    for trial in range(60):
        with open(path, "wb") as f:
            f.write(_mutate(good, rng))
        try:
            bs = bundle_mod.BundleSet(d)
            for b in range(4):
                if (0, 0, 0, b) in bs:
                    got = bs.blob(0, 0, 0, b)
                    if got == blobs[b]:
                        archive.decode_blob(got, "raw")   # must decode
                    elif got.startswith(b"WTCR"):
                        # intact frame magic + mutated body: the CRC
                        # must reject it
                        with pytest.raises(ValueError):
                            archive.decode_blob(got, "raw")
            bs.close()
        except (ValueError, OSError, EOFError, KeyError):
            pass
    with open(path, "wb") as f:
        f.write(good)
    bs = bundle_mod.BundleSet(d)
    for b in range(4):
        assert bs.blob(0, 0, 0, b) == blobs[b]
    bs.close()


def test_fuzz_corrupt_sidecars_raise_cleanly(tmp_path):
    """Every sidecar reader must turn arbitrary corruption into the
    ValueError/OSError family cli.main handles — never struct.error,
    IndexError, or a crash."""
    from wavelet_tpu.pipeline import Config, compress_run

    rng = np.random.default_rng(123)
    box = np.fromfunction(lambda i, j, k: np.sin(0.3 * i) + 0.1 * j + k,
                          (8, 8, 8)).astype(np.float32)
    from wavelet_tpu.io import plotfile as pf
    pf.write_plotfile(str(tmp_path / "data" / "plt00080"), [[box[None]]],
                      [[(0, 0, 0)]], [[(8, 8, 8)]], ["a"], 0.5,
                      [0., 0., 0.], [1., 1., 1.], (2, 2, 2), (8, 8, 8),
                      [80])
    comp = str(tmp_path / "comp") + "/"
    compress_run(Config(data_dir=str(tmp_path / "data"),
                        min_time="plt00080", max_time="plt00080",
                        min_level=0, max_level=0, components=["a"],
                        keep=0.999, compressed_dir=comp))
    readers = {
        "runinfo.raw": lambda: archive.read_runinfo(comp),
        "boxcounts.raw": lambda: archive.read_boxcounts(comp, 1, 1),
        "locations.raw": lambda: archive.read_locdim(
            comp, "locations.raw", [[1]]),
        "dimensions.raw": lambda: archive.read_locdim(
            comp, "dimensions.raw", [[1]]),
        "amrexinfo.raw": lambda: archive.read_amrexinfo(comp),
    }
    for name, read in readers.items():
        p = os.path.join(comp, name)
        good = open(p, "rb").read()
        for trial in range(25):
            with open(p, "wb") as f:
                f.write(_mutate(good, rng))
            try:
                read()
            except (ValueError, OSError, EOFError):
                pass   # the clean-error family
            # any other exception type fails the test by propagating
        with open(p, "wb") as f:
            f.write(good)
        read()   # restored sidecar reads fine again


@pytest.mark.parametrize("codec,payload_fmt", [
    ("xz", "f32"), ("raw", "f32"), ("xz", "q16"), ("raw", "q16")])
def test_fuzz_corrupt_members_never_crash_and_backends_agree(
        tmp_path, codec, payload_fmt):
    import zlib

    # deterministic per-combination seed (hash() is salted per process)
    rng = np.random.default_rng(
        zlib.crc32(f"{codec}/{payload_fmt}".encode()))
    good = _make_member(codec, payload_fmt, rng)
    n_agree = 0
    for trial in range(40):
        blob = _mutate(good, rng)
        p = str(tmp_path / f"m{trial}.xz")
        with open(p, "wb") as f:
            f.write(blob)
        nat = _native_decode(p, codec, payload_fmt)
        py = _python_decode(blob, payload_fmt, codec)
        if (nat is None) != (py is None):
            # acceptance must agree: a stream one backend rejects and the
            # other decodes would mean data that exists only on one path
            raise AssertionError(
                f"{codec}/{payload_fmt} trial {trial}: native "
                f"{'rejected' if nat is None else 'decoded'} but python "
                f"{'rejected' if py is None else 'decoded'}")
        if nat is not None:
            np.testing.assert_array_equal(nat, py)
            n_agree += 1
    # sanity: the UNmutated member decodes on both
    p = str(tmp_path / "good.xz")
    with open(p, "wb") as f:
        f.write(good)
    nat = _native_decode(p, codec, payload_fmt)
    py = _python_decode(good, payload_fmt, codec)
    assert nat is not None and py is not None
    np.testing.assert_array_equal(nat, py)
