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
from wavelet_tpu.runtime import mesh as mesh_lib

__all__ = ["CodecEngine", "HostPacker"]


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


class CodecEngine:
    """Runs the device side of the codec over ShapeBatches.

    ``mesh=None`` uses the default device; otherwise batches are sharded on
    their leading axis (data parallelism over boxes/components/timesteps —
    the TPU-native replacement for iterator.h).
    """

    def __init__(self, mesh=None):
        self.mesh = mesh

    def _put(self, x):
        return mesh_lib.shard_batch(x, self.mesh)

    def compress_batch(self, data: np.ndarray, keep: float):
        """-> (coeffs f32 [N, XYZ], mask bool [N, XYZ]) as NumPy arrays."""
        dev = self._put(jnp.asarray(data))
        flat, maxv = _compress_step(dev)
        t32 = threshold.exact_threshold32(np.asarray(maxv), keep)
        mask, _counts = _mask_step(flat, self._put(jnp.asarray(t32)))
        return np.asarray(flat), np.asarray(mask)

    def decompress_batch(self, flat: np.ndarray, dims) -> np.ndarray:
        """flat f32 [N, X*Y*Z] -> boxes f32 [N, X, Y, Z]."""
        dev = self._put(jnp.asarray(flat))
        return np.asarray(_inverse_jit(dev, tuple(int(d) for d in dims)))


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
