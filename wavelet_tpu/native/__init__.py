"""ctypes binding for the native host codec (native/wtc_codec.cpp).

Loads ``native/libwtc_codec.so`` if present (or buildable with the local
toolchain); otherwise :data:`lib` is None and callers fall back to the
NumPy/``lzma`` path in runtime/engine.py.  Disable explicitly with
``WAVELET_TPU_NATIVE=0``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "pack_batch", "unpack_batch"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libwtc_codec.so")
_SRC_PATH = os.path.join(_REPO_ROOT, "native", "wtc_codec.cpp")

lib = None


def _try_load():
    global lib
    if os.environ.get("WAVELET_TPU_NATIVE", "1") == "0":
        return
    if not os.path.exists(_SO_PATH) and os.path.exists(_SRC_PATH):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                 "-fPIC", "-o", _SO_PATH, _SRC_PATH, "-llzma", "-lpthread"],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return
    if not os.path.exists(_SO_PATH):
        return
    try:
        handle = ctypes.CDLL(_SO_PATH)
    except OSError:
        return
    handle.wtc_pack_batch.restype = ctypes.c_int64
    handle.wtc_pack_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
    handle.wtc_unpack_batch.restype = ctypes.c_int64
    handle.wtc_unpack_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int]
    lib = handle


_try_load()


def available() -> bool:
    return lib is not None


def _paths_array(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def pack_batch(coeffs: np.ndarray, t32: np.ndarray, shape, paths,
               n_threads: int = 0) -> int:
    """coeffs [N, XYZ] f32 (C-contiguous), per-item thresholds t32 [N] f32;
    writes one .xz per path.  Returns total compressed bytes."""
    coeffs = np.ascontiguousarray(coeffs, dtype=np.float32)
    t32 = np.ascontiguousarray(t32, dtype=np.float32)
    shp = np.asarray(shape, dtype=np.int32)
    n, m = coeffs.shape
    ret = lib.wtc_pack_batch(
        coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, m, shp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _paths_array(list(paths)), n_threads)
    if ret < 0:
        raise IOError(f"native pack failed at item {-(ret + 1)}")
    return int(ret)


def unpack_batch(paths, n_coeffs: int, n_threads: int = 0):
    """Read .xz payloads -> (flat [N, n_coeffs] f32, shapes [N, 3] int32)."""
    n = len(paths)
    out = np.empty((n, n_coeffs), dtype=np.float32)
    shapes = np.empty((n, 3), dtype=np.int32)
    ret = lib.wtc_unpack_batch(
        _paths_array(list(paths)), n, n_coeffs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    if ret < 0:
        raise IOError(f"native unpack failed at item {-(ret + 1)}")
    return out, shapes
