"""Batched single-scale 3D Haar (Daubechies-1) transform in JAX.

Semantics match the reference exactly (``compressor.cpp:85-185`` forward,
``decompressor.cpp:79-159`` inverse):

- forward: along Z, then Y, then X, each 1D line of length n maps pairs
  ``(a, b) -> low=(a+b)/2`` into ``[0, n/2)`` and ``high=(a-b)/2`` into
  ``[n/2, n)``.  This is the *non*-orthonormal averaging variant, one scale
  only ("multi-level" in this project refers to AMR refinement levels).
- odd lengths: the forward pass leaves the trailing element untouched
  (``k+1 < n`` loop bound, compressor.cpp:107); the reference inverse zeroes
  it (decompressor.cpp:99-108) — we reproduce both so round-trips agree with
  the reference bit-for-bit.
- inverse: along X, then Y, then Z: ``restored[2i] = avg+diff``,
  ``restored[2i+1] = avg-diff``.

Bit-parity note: the C++ computes ``(a+b)/2.0`` in double and rounds once
when storing to float.  In float32, ``fl(a+b)/2`` equals ``fl((a+b)/2)``
because dividing by two is exact, so these jnp float32 kernels agree bitwise
with the reference except in the far-subnormal range.

Arrays are ``[..., X, Y, Z]``; any leading batch dimensions are allowed, and
the C-order flatten of the trailing three axes reproduces the reference's
coefficient order (``compressor.cpp:178-181``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["haar3d_forward", "haar3d_inverse", "forward_flat",
           "inverse_from_flat", "haar3d_forward_multi", "haar3d_inverse_multi",
           "haar3d_lowpass"]


def _fwd_last(x: jax.Array) -> jax.Array:
    """One forward Haar pass along the last axis."""
    n = x.shape[-1]
    h = n // 2
    v = x[..., : 2 * h].reshape(x.shape[:-1] + (h, 2))
    a = v[..., 0]
    b = v[..., 1]
    low = (a + b) * jnp.asarray(0.5, x.dtype)
    high = (a - b) * jnp.asarray(0.5, x.dtype)
    parts = [low, high]
    if n % 2:
        parts.append(x[..., 2 * h :])
    return jnp.concatenate(parts, axis=-1)


def _inv_last(c: jax.Array) -> jax.Array:
    """One inverse Haar pass along the last axis (zeroes a trailing odd slot,
    matching decompressor.cpp:99-108 where `restored` is default-initialized)."""
    n = c.shape[-1]
    h = n // 2
    avg = c[..., :h]
    diff = c[..., h : 2 * h]
    even = avg + diff
    odd = avg - diff
    out = jnp.stack([even, odd], axis=-1).reshape(c.shape[:-1] + (2 * h,))
    if n % 2:
        out = jnp.concatenate([out, jnp.zeros_like(c[..., :1])], axis=-1)
    return out


def _along(fn, x: jax.Array, axis: int) -> jax.Array:
    if axis in (-1, x.ndim - 1):
        return fn(x)
    moved = jnp.moveaxis(x, axis, -1)
    return jnp.moveaxis(fn(moved), -1, axis)


def haar3d_forward(x: jax.Array) -> jax.Array:
    """Forward transform of ``[..., X, Y, Z]``: Z pass, Y pass, X pass."""
    x = _along(_fwd_last, x, -1)   # Z  (compressor.cpp:98-125)
    x = _along(_fwd_last, x, -2)   # Y  (compressor.cpp:128-150)
    x = _along(_fwd_last, x, -3)   # X  (compressor.cpp:153-175)
    return x


def haar3d_inverse(c: jax.Array) -> jax.Array:
    """Inverse transform of ``[..., X, Y, Z]``: X pass, Y pass, Z pass."""
    c = _along(_inv_last, c, -3)   # X  (decompressor.cpp:90-114)
    c = _along(_inv_last, c, -2)   # Y  (decompressor.cpp:117-135)
    c = _along(_inv_last, c, -1)   # Z  (decompressor.cpp:138-156)
    return c


def haar3d_forward_multi(x: jax.Array, scales: int) -> jax.Array:
    """Multi-scale forward: scale s re-transforms the low-low-low corner
    block of the previous scale (classic pyramid decomposition).

    Extension beyond the reference, which applies exactly one scale
    (SURVEY.md §5.1 — its "multi-level" means AMR refinement levels; its
    TODO.txt wishes for better coefficient compaction, which deeper scales
    deliver).

    Divisibility rule (odd-tolerant, matching the single-scale
    transform): scale 0 runs on ANY dims — an odd axis's last element
    passes through untransformed, exactly like haar3d_forward — but each
    DEEPER scale's corner block must have even dims, i.e. every trailing
    dim must be odd-or-divisible-by-2**scales.  (The engine's
    ``eff_scales`` clamps scales so production shapes always satisfy
    this; the error below names the corner that fails.)
    """
    X, Y, Z = x.shape[-3:]
    for s in range(scales):
        cx, cy, cz = X >> s, Y >> s, Z >> s
        if s and (cx % 2 or cy % 2 or cz % 2):
            raise ValueError(
                f"dims {(X, Y, Z)}: scale-{s} corner {(cx, cy, cz)} has "
                f"odd extent — deeper scales need even corner dims "
                f"(scale 0 alone tolerates odd axes)")
        sub = haar3d_forward(x[..., :cx, :cy, :cz])
        x = x.at[..., :cx, :cy, :cz].set(sub)
    return x


def haar3d_inverse_multi(c: jax.Array, scales: int) -> jax.Array:
    """Inverse of :func:`haar3d_forward_multi` (coarsest corner first)."""
    X, Y, Z = c.shape[-3:]
    for s in reversed(range(scales)):
        cx, cy, cz = X >> s, Y >> s, Z >> s
        sub = haar3d_inverse(c[..., :cx, :cy, :cz])
        c = c.at[..., :cx, :cy, :cz].set(sub)
    return c


def _low_last(x: jax.Array) -> jax.Array:
    """The low (pairwise-mean) half of a forward pass along the last axis;
    requires an even length."""
    h = x.shape[-1] // 2
    v = x.reshape(x.shape[:-1] + (h, 2))
    return (v[..., 0] + v[..., 1]) * jnp.asarray(0.5, x.dtype)


def haar3d_lowpass(x: jax.Array, depth: int) -> jax.Array:
    """``depth`` rounds of low-pass only: the LLL corner block that
    :func:`haar3d_forward_multi` would produce, without computing any detail
    band.  Same per-axis order (Z, Y, X per scale) and arithmetic as the
    forward, so the result is bitwise what the pyramid stores in its corner.
    Trailing dims must be divisible by ``2**depth``; output is
    ``[..., X >> depth, Y >> depth, Z >> depth]``.
    """
    for _ in range(depth):
        x = _along(_low_last, x, -1)   # Z
        x = _along(_low_last, x, -2)   # Y
        x = _along(_low_last, x, -3)   # X
    return x


def forward_flat(x: jax.Array) -> jax.Array:
    """Forward transform + C-order flatten of the trailing 3 axes."""
    c = haar3d_forward(x)
    return c.reshape(c.shape[:-3] + (-1,))


def inverse_from_flat(flat: jax.Array, dims) -> jax.Array:
    """Inverse transform from flat coefficients; ``dims`` = (X, Y, Z)."""
    c = flat.reshape(flat.shape[:-1] + tuple(dims))
    return haar3d_inverse(c)
