"""Vectorized run-length coding of thresholded coefficients (host side).

Format identical to the reference (``compressor.cpp:24-42`` encode,
``decompressor.cpp:14-30`` decode): a sequence of pairs
``(zeros_before, value)`` covering the kept coefficients in flatten order;
trailing zeros after the last kept value are implicit (the total coefficient
count travels in the payload header).

The reference loops element-by-element; here both directions are O(n) NumPy
vector ops (``flatnonzero``/``diff`` for encode, ``cumsum`` scatter for
decode), which is what keeps the host pack stage off the critical path of
the TPU pipeline.
"""

from __future__ import annotations

import numpy as np

__all__ = ["rle_encode_mask", "rle_decode"]


def rle_encode_mask(mask: np.ndarray, values_src: np.ndarray):
    """Encode: ``mask`` (bool[n]) selects kept entries of ``values_src`` (f32[n]).

    Returns ``(runs int32[k], vals float32[k])`` — runs of zeros before each
    kept value, exactly the pair stream of compressor.cpp:24-42.
    """
    idx = np.flatnonzero(mask)
    runs = np.diff(idx, prepend=np.int64(-1)) - 1
    return runs.astype(np.int32), values_src[idx].astype(np.float32, copy=False)


def rle_decode(runs: np.ndarray, vals: np.ndarray, total: int) -> np.ndarray:
    """Decode to a zero-padded float32[total] coefficient vector.

    Positions are ``cumsum(runs + 1) - 1``; out-of-range entries are dropped
    with the same bounds check as decompressor.cpp:23.
    """
    out = np.zeros(total, dtype=np.float32)
    if len(runs) == 0:
        return out
    pos = np.cumsum(runs.astype(np.int64) + 1) - 1
    # reject negative positions too (a corrupt payload with negative runs
    # would otherwise scatter via Python's negative indexing; the reference
    # has the same latent bug — UB in its case)
    ok = (pos < total) & (pos >= 0)
    out[pos[ok]] = vals[ok]
    return out
