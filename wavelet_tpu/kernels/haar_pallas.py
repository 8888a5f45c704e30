"""Fused single-pass Haar kernels (Pallas TPU).

The jnp path (core/haar.py) materializes each of the three axis passes to
HBM — ~6x the block's bytes in HBM traffic.  These kernels stream one box
per grid step into VMEM, run all three passes (and the min/max reduction the
thresholder needs) entirely on-chip, and write the result once: 2x traffic,
i.e. the HBM-bandwidth speed-of-light for this op.  (Reference analogue:
the cache-unfriendly triple loops of compressor.cpp:85-185 /
decompressor.cpp:79-159 — here redesigned around the TPU memory hierarchy
rather than translated.)

The in-kernel math reuses core.haar's jnp ops, so results are bitwise equal
to the reference-parity path; tests assert that.

Use :func:`fused_forward` / :func:`fused_inverse`; both fall back to the jnp
path automatically on platforms without Mosaic support (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavelet_tpu.core import haar

__all__ = ["fused_forward", "fused_inverse", "supported"]


def supported() -> bool:
    return jax.devices()[0].platform == "tpu"


def _fwd_lead(v: jax.Array) -> jax.Array:
    """One forward Haar pass along the *leading* axis.

    Mosaic supports pair-splitting reshapes and concat only on untiled
    (leading) dimensions, so each axis is transposed into the leading slot
    for its pass.  Math identical to core.haar._fwd_last (same single
    float32 rounding per output), hence bitwise-equal results.
    """
    n = v.shape[0]
    h = n // 2
    w = v[: 2 * h].reshape((h, 2) + v.shape[1:])
    a = w[:, 0]
    b = w[:, 1]
    parts = [(a + b) * 0.5, (a - b) * 0.5]
    if n % 2:
        parts.append(v[2 * h :])
    return jnp.concatenate(parts, axis=0)


def _inv_lead(v: jax.Array) -> jax.Array:
    """One inverse pass along the leading axis (odd tail zeroed, matching
    decompressor.cpp:99-108)."""
    n = v.shape[0]
    h = n // 2
    avg = v[:h]
    diff = v[h : 2 * h]
    even = avg + diff
    odd = avg - diff
    out = jnp.stack([even, odd], axis=1).reshape((2 * h,) + v.shape[1:])
    if n % 2:
        out = jnp.concatenate([out, jnp.zeros_like(v[:1])], axis=0)
    return out


def _fwd_block(x: jax.Array) -> jax.Array:
    """(X, Y, Z) forward: Z, Y, X passes — the reference's order
    (compressor.cpp:98-175), each via a transpose-to-leading."""
    t = jnp.transpose(x, (2, 1, 0))       # (Z, Y, X)
    t = _fwd_lead(t)                      # Z pass
    t = jnp.transpose(t, (1, 0, 2))       # (Y, Z, X)
    t = _fwd_lead(t)                      # Y pass
    t = jnp.transpose(t, (2, 1, 0))       # (X, Z, Y)
    t = _fwd_lead(t)                      # X pass
    return jnp.transpose(t, (0, 2, 1))    # (X, Y, Z)


def _inv_block(c: jax.Array) -> jax.Array:
    """(X, Y, Z) inverse: X, Y, Z passes (decompressor.cpp:90-156)."""
    t = _inv_lead(c)                      # X pass (already leading)
    t = jnp.transpose(t, (1, 0, 2))       # (Y, X, Z)
    t = _inv_lead(t)                      # Y pass
    t = jnp.transpose(t, (2, 1, 0))       # (Z, X, Y)
    t = _inv_lead(t)                      # Z pass
    return jnp.transpose(t, (1, 2, 0))    # (X, Y, Z)


def _fwd_kernel(x_ref, out_ref, maxv_ref, minv_ref):
    c = _fwd_block(x_ref[0])
    out_ref[0] = c
    # Partial reduction over the leading axis only: SMEM scalar outputs per
    # grid step serialize the DMA pipeline (measured 4x slowdown), so the
    # kernel emits (Y, Z) tiles and the caller finishes the reduction.
    maxv_ref[0] = jnp.max(c, axis=0)
    minv_ref[0] = jnp.min(c, axis=0)


def _inv_kernel(c_ref, out_ref):
    out_ref[0] = _inv_block(c_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_forward_call(batch: jax.Array, *, interpret: bool = False):
    n, x, y, z = batch.shape
    blk = (1, x, y, z)
    c, pmax, pmin = pl.pallas_call(
        _fwd_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec(blk, lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(blk, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, y, z), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, y, z), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, x, y, z), batch.dtype),
            jax.ShapeDtypeStruct((n, y, z), batch.dtype),
            jax.ShapeDtypeStruct((n, y, z), batch.dtype),
        ),
        interpret=interpret,
    )(batch)
    return c, jnp.max(pmax, axis=(1, 2)), jnp.min(pmin, axis=(1, 2))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_inverse_call(coeffs: jax.Array, *, interpret: bool = False):
    n, x, y, z = coeffs.shape
    blk = (1, x, y, z)
    return pl.pallas_call(
        _inv_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec(blk, lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, x, y, z), coeffs.dtype),
        interpret=interpret,
    )(coeffs)


def fused_forward(batch: jax.Array):
    """[N, X, Y, Z] -> (coeffs [N, X, Y, Z], max [N], min [N]).

    The per-block max/min feed the signed-absmax threshold rule: the signed
    extremum is ``max`` if |max| > |min| else ``min``; exact ties (min ==
    -max) are resolved by the caller on the first-occurrence rule
    (compressor.cpp:212-215) via the jnp path.
    """
    if supported():
        return _fused_forward_call(batch)
    c = haar.haar3d_forward(batch)
    flat = c.reshape(c.shape[0], -1)
    return c, jnp.max(flat, axis=-1), jnp.min(flat, axis=-1)


def fused_inverse(coeffs: jax.Array) -> jax.Array:
    """[N, X, Y, Z] coeffs -> [N, X, Y, Z] reconstruction."""
    if supported():
        return _fused_inverse_call(coeffs)
    return haar.haar3d_inverse(coeffs)
