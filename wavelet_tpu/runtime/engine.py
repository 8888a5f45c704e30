"""The device codec engine: jitted, sharded compress/decompress steps.

This is the TPU replacement for the reference's per-box serial codec calls
(modes.cpp:100-103, 151-166).  One jit per box shape (XLA caches by shape);
batches shard their leading axis over the mesh, so the same code runs
single-chip or across a pod slice unchanged.
"""

from __future__ import annotations

import concurrent.futures as cf
import os

import jax
import jax.numpy as jnp
import numpy as np

from wavelet_tpu.core import haar, threshold
from wavelet_tpu.core import rle
from wavelet_tpu.io import archive
from wavelet_tpu.kernels import haar_pallas
from wavelet_tpu.runtime import mesh as mesh_lib

__all__ = ["CodecEngine", "HostPacker", "resolve_signed_absmax"]


@jax.jit
def _compress_step(batch: jax.Array):
    """[N, X, Y, Z] -> (flat coeffs [N, XYZ], signed absmax [N]).

    The transform + reduction stays fused on device; the [N]-sized maxima are
    the only scalars the host needs to finish thresholding exactly
    (core/threshold.py).
    """
    flat = haar.forward_flat(batch)
    return flat, threshold.signed_absmax(flat, axis=-1)


@jax.jit
def _mask_step(flat: jax.Array, t32: jax.Array):
    """Exact-parity keep mask + per-item kept counts, on device."""
    mask = threshold.mask_coefficients(flat, t32)
    return mask, jnp.sum(mask, axis=-1, dtype=jnp.int32)


def _inverse_step(flat: jax.Array, dims):
    return haar.inverse_from_flat(flat, dims)


_inverse_jit = jax.jit(_inverse_step, static_argnums=1)


def resolve_signed_absmax(maxv: np.ndarray, minv: np.ndarray,
                          flat_dev=None) -> np.ndarray:
    """Signed largest-|.| value from per-box (max, min) pairs.

    The fused Pallas kernel returns plain max/min reductions; the signed
    extremum is whichever has the larger magnitude.  The only ambiguous case
    is an exact tie ``min == -max != 0`` where the reference picks whichever
    occurs *first* in flatten order (compressor.cpp:212-215); those rare
    boxes are resolved with the jnp argmax path on ``flat_dev``.
    """
    signed = np.where(np.abs(maxv) >= np.abs(minv), maxv, minv)
    tie = (minv == -maxv) & (maxv != 0)
    if tie.any() and flat_dev is not None:
        idx = np.flatnonzero(tie)
        exact = np.asarray(threshold.signed_absmax(flat_dev[idx], axis=-1))
        signed[idx] = exact
    return signed


class CodecEngine:
    """Runs the device side of the codec over ShapeBatches.

    ``mesh=None`` uses the default device; otherwise batches are sharded on
    their leading axis (data parallelism over boxes/components/timesteps —
    the TPU-native replacement for iterator.h).  On TPU the forward/inverse
    transforms run as fused single-HBM-pass Pallas kernels
    (kernels/haar_pallas.py); elsewhere the jnp path is used — both are
    bitwise-identical to the reference semantics.
    """

    def __init__(self, mesh=None, use_pallas: bool | None = None):
        self.mesh = mesh
        if use_pallas is None:
            use_pallas = haar_pallas.supported() and (
                mesh is None or mesh.size == 1)
        self.use_pallas = use_pallas

    # one box must fit VMEM alongside the double-buffered pipeline
    _PALLAS_MAX_BLOCK_BYTES = 4 << 20

    def _put(self, x):
        return mesh_lib.shard_batch(x, self.mesh)

    def _pallas_ok(self, dims) -> bool:
        return (self.use_pallas
                and int(np.prod(dims)) * 4 <= self._PALLAS_MAX_BLOCK_BYTES)

    def compress_batch(self, data: np.ndarray, keep: float):
        """-> (coeffs f32 [N, XYZ], mask bool [N, XYZ]) as NumPy arrays."""
        dev = self._put(jnp.asarray(data))
        if self._pallas_ok(data.shape[1:]):
            coeffs, maxv, minv = haar_pallas.fused_forward(dev)
            flat = coeffs.reshape(coeffs.shape[0], -1)
            signed = resolve_signed_absmax(np.asarray(maxv), np.asarray(minv),
                                           flat_dev=flat)
        else:
            flat, signed_dev = _compress_step(dev)
            signed = np.asarray(signed_dev)
        t32 = threshold.exact_threshold32(signed, keep)
        mask, _counts = _mask_step(flat, self._put(jnp.asarray(t32)))
        return np.asarray(flat), np.asarray(mask)

    def decompress_batch(self, flat: np.ndarray, dims) -> np.ndarray:
        """flat f32 [N, X*Y*Z] -> boxes f32 [N, X, Y, Z]."""
        dims = tuple(int(d) for d in dims)
        dev = self._put(jnp.asarray(flat))
        if self._pallas_ok(dims):
            blocks = dev.reshape((dev.shape[0],) + dims)
            return np.asarray(haar_pallas.fused_inverse(blocks))
        return np.asarray(_inverse_jit(dev, dims))


class HostPacker:
    """Parallel host-side pack/unpack + file I/O.

    LZMA encode dominates host cost; ``lzma`` releases the GIL so a thread
    pool scales across cores — the replacement for the reference's serial
    per-file writes (compressor.cpp:250-291).
    """

    def __init__(self, workers: int | None = None):
        self.workers = workers or min(32, (os.cpu_count() or 4))

    def pack_and_write(self, out_dir: str, jobs):
        """jobs: iterable of (WorkItem, shape, flat f32[XYZ], mask bool[XYZ])."""

        def one(job):
            item, shape, flat, mask = job
            runs, vals = rle.rle_encode_mask(mask, flat)
            blob = archive.xz_compress(
                archive.serialize_payload(shape, runs, vals))
            name = archive.payload_filename(item.t, item.level, item.comp_idx,
                                            item.box)
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(blob)
            return len(blob)

        with cf.ThreadPoolExecutor(self.workers) as ex:
            return list(ex.map(one, jobs))

    def read_and_unpack(self, in_dir: str, items):
        """items: list of WorkItem -> list of (shape, flat f32[XYZ])."""

        def one(item):
            name = archive.payload_filename(item.t, item.level, item.comp_idx,
                                            item.box)
            with open(os.path.join(in_dir, name), "rb") as f:
                payload = archive.xz_decompress(f.read())
            shape, total, runs, vals = archive.deserialize_payload(payload)
            return shape, rle.rle_decode(runs, vals, total)

        with cf.ThreadPoolExecutor(self.workers) as ex:
            return list(ex.map(one, items))
