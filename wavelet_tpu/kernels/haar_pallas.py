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

# Every kernel's grid is embarrassingly parallel (one block per grid step,
# no cross-step state), and telling Mosaic so is worth ~1.4-4x: with the
# default "arbitrary" semantics the compiler serializes grid steps and the
# DMA pipeline stalls (measured 45 -> 193 GB/s on the interleaved forward,
# scripts/kernel_lab.py hint variants).
#
# Every kernel also aliases its coefficient output onto its input buffer
# (input_output_aliases + donated jit arg 0).  Measured on the v5e
# (scripts/kernel_probe{3,4,5}.py): with separate in/out buffers any
# pallas kernel — including a pure copy, under every DMA strategy — caps
# at ~163 GB/s input rate once the working set exceeds ~96 MiB per
# buffer, while the in-place version sustains ~325 GB/s at any size
# (plain-XLA elementwise, which runs in place via loop-carry donation,
# measures the same 325).  Safe because each output block depends only on
# its own input block and the index maps are identical.  CALLERS MUST NOT
# REUSE the array they pass in (on TPU the buffer is consumed; CPU
# ignores donation) — every production call site hands in a fresh
# device_put/jnp.asarray.
_PARALLEL = pltpu.CompilerParams(dimension_semantics=("parallel",))

__all__ = ["fused_forward", "fused_inverse", "supported",
           "fused_forward_packed", "fused_inverse_packed",
           "lane_pack_factor",
           "fused_forward_interleaved", "fused_inverse_interleaved",
           "fused_forward_interleaved_nored",
           "interleaved_pack_factor", "interleave_perm",
           "interleave_coords_multi", "interleave_map_multi",
           "interleaved_ok"]


def supported() -> bool:
    return jax.devices()[0].platform == "tpu"


def _fwd_lead(v: jax.Array, n_seg: int = 1) -> jax.Array:
    """One forward Haar pass along the *leading* axis.

    Mosaic supports pair-splitting reshapes and concat only on untiled
    (leading) dimensions, so each axis is transposed into the leading slot
    for its pass.  Math identical to core.haar._fwd_last (same single
    float32 rounding per output), hence bitwise-equal results.

    ``n_seg > 1`` treats the axis as that many independent equal segments
    (the lane-packed layout: several boxes' Z-axes concatenated to fill the
    128 lanes); pairing and the low/high split happen within each segment,
    entirely with leading-dimension reshapes.
    """
    n = v.shape[0]
    if n_seg == 1:
        h = n // 2
        w = v[: 2 * h].reshape((h, 2) + v.shape[1:])
        parts = [(w[:, 0] + w[:, 1]) * 0.5, (w[:, 0] - w[:, 1]) * 0.5]
        if n % 2:
            parts.append(v[2 * h :])
        return jnp.concatenate(parts, axis=0)
    z = n // n_seg
    h = z // 2
    assert z % 2 == 0, "packed segments require even Z"
    w = v.reshape((n_seg, h, 2) + v.shape[1:])
    a = w[:, :, 0]
    b = w[:, :, 1]
    out = jnp.concatenate([(a + b) * 0.5, (a - b) * 0.5], axis=1)
    return out.reshape((n,) + v.shape[1:])


def _inv_lead(v: jax.Array, n_seg: int = 1) -> jax.Array:
    """One inverse pass along the leading axis (odd tail zeroed, matching
    decompressor.cpp:99-108); ``n_seg`` as in :func:`_fwd_lead`."""
    n = v.shape[0]
    if n_seg == 1:
        h = n // 2
        avg = v[:h]
        diff = v[h : 2 * h]
        out = jnp.stack([avg + diff, avg - diff], axis=1).reshape(
            (2 * h,) + v.shape[1:])
        if n % 2:
            out = jnp.concatenate([out, jnp.zeros_like(v[:1])], axis=0)
        return out
    z = n // n_seg
    h = z // 2
    assert z % 2 == 0, "packed segments require even Z"
    w = v.reshape((n_seg, 2, h) + v.shape[1:])
    avg = w[:, 0]
    diff = w[:, 1]
    out = jnp.stack([avg + diff, avg - diff], axis=2)
    return out.reshape((n,) + v.shape[1:])


def _fwd_block(x: jax.Array, n_seg_lane: int = 1,
               n_seg_lead: int = 1) -> jax.Array:
    """(X, Y, L) forward: Z, Y, X passes — the reference's order
    (compressor.cpp:98-175), each via a transpose-to-leading.

    Layout discipline: every intermediate keeps a *large* minor (lane)
    dimension — either L or the folded leading axis — by returning to the
    home (X, Y, L) layout after each pass.  Routing a small axis (e.g. Y=4)
    through the lanes pads registers up to 128 wide and can inflate VMEM by
    32x (observed as a Mosaic scoped-vmem OOM).

    ``n_seg_lane > 1``: the last axis holds that many boxes' Z-axes packed
    to fill the 128 lanes (L = n_seg_lane * Z).  ``n_seg_lead > 1``: the
    leading axis holds that many boxes' X-extents stacked (multi-row grid
    blocks); both passes pair within segments only.
    """
    t = jnp.transpose(x, (2, 1, 0))       # (L, Y, bX) — lanes = bX
    t = _fwd_lead(t, n_seg_lane)          # Z pass
    t = jnp.transpose(t, (2, 1, 0))       # home (bX, Y, L)
    t = jnp.transpose(t, (1, 0, 2))       # (Y, bX, L) — lanes = L
    t = _fwd_lead(t)                      # Y pass
    t = jnp.transpose(t, (1, 0, 2))       # home
    return _fwd_lead(t, n_seg_lead)       # X pass (leading, no transpose)


def _inv_block(c: jax.Array, n_seg_lane: int = 1,
               n_seg_lead: int = 1) -> jax.Array:
    """(X, Y, L) inverse: X, Y, Z passes (decompressor.cpp:90-156), same
    home-layout discipline as :func:`_fwd_block`."""
    t = _inv_lead(c, n_seg_lead)          # X pass (leading)
    t = jnp.transpose(t, (1, 0, 2))       # (Y, bX, L)
    t = _inv_lead(t)                      # Y pass
    t = jnp.transpose(t, (1, 0, 2))       # home
    t = jnp.transpose(t, (2, 1, 0))       # (L, Y, bX)
    t = _inv_lead(t, n_seg_lane)          # Z pass
    return jnp.transpose(t, (2, 1, 0))    # home (bX, Y, L)


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


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0,))
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
        input_output_aliases={0: 0},
        compiler_params=_PARALLEL,
    )(batch)
    return c, jnp.max(pmax, axis=(1, 2)), jnp.min(pmin, axis=(1, 2))


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0,))
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
        input_output_aliases={0: 0},
        compiler_params=_PARALLEL,
    )(coeffs)


def block_rows(x: int, y: int, L: int, m: int | None = None,
               target_bytes: int = 1 << 20) -> int:
    """Packed rows per grid step: larger blocks amortize the per-step DMA
    overhead that dominates for small boxes, bounded by the kernel's VMEM
    footprint (intermediates cost ~8-14x the *sublane-padded* block bytes
    depending on shape; exceeding 16 MiB is a Mosaic scoped-vmem OOM, so
    the target stays at 1 MiB)."""
    if x % 2:
        # multi-row blocks fold b rows into the leading axis and run the X
        # pass with b segments, which requires even segment length; odd-X
        # boxes use single-row blocks (the n_seg==1 pass handles odd tails)
        return 1
    padded_row = x * max(y, 8) * L * 4
    b = max(1, target_bytes // max(padded_row, 1))
    if m is not None:
        b = min(b, m)
        while m % b:
            b -= 1
    return b


@functools.partial(jax.jit, static_argnames=("n_seg", "interpret"),
                   donate_argnums=(0,))
def _fused_forward_packed_call(packed: jax.Array, n_seg: int,
                               *, interpret: bool = False):
    m, x, y, L = packed.shape
    b = block_rows(x, y, L, m)
    blk = (b, x, y, L)

    def kern(x_ref, out_ref, maxv_ref, minv_ref):
        # fold the b packed rows into the leading axis; the X pass then
        # runs with b segments (pairing stays within each row's X extent)
        v = x_ref[:].reshape(b * x, y, L)
        c = _fwd_block(v, n_seg_lane=n_seg, n_seg_lead=b).reshape(b, x, y, L)
        out_ref[:] = c
        maxv_ref[:] = jnp.max(c, axis=1)
        minv_ref[:] = jnp.min(c, axis=1)

    c, pmax, pmin = pl.pallas_call(
        kern,
        grid=(m // b,),
        in_specs=[pl.BlockSpec(blk, lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(blk, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, y, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, y, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, x, y, L), packed.dtype),
            jax.ShapeDtypeStruct((m, y, L), packed.dtype),
            jax.ShapeDtypeStruct((m, y, L), packed.dtype),
        ),
        interpret=interpret,
        input_output_aliases={0: 0},
        compiler_params=_PARALLEL,
    )(packed)
    # finish the per-box reduction: lanes hold (segment p, z)
    z = L // n_seg
    maxv = jnp.max(pmax.reshape(m, y, n_seg, z), axis=(1, 3)).reshape(-1)
    minv = jnp.min(pmin.reshape(m, y, n_seg, z), axis=(1, 3)).reshape(-1)
    return c, maxv, minv


@functools.partial(jax.jit, static_argnames=("n_seg", "interpret"),
                   donate_argnums=(0,))
def _fused_inverse_packed_call(packed: jax.Array, n_seg: int,
                               *, interpret: bool = False):
    m, x, y, L = packed.shape
    b = block_rows(x, y, L, m)
    blk = (b, x, y, L)

    def kern(c_ref, out_ref):
        v = c_ref[:].reshape(b * x, y, L)
        out_ref[:] = _inv_block(v, n_seg_lane=n_seg,
                                n_seg_lead=b).reshape(b, x, y, L)

    return pl.pallas_call(
        kern,
        grid=(m // b,),
        in_specs=[pl.BlockSpec(blk, lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, x, y, L), packed.dtype),
        interpret=interpret,
        input_output_aliases={0: 0},
        compiler_params=_PARALLEL,
    )(packed)


# ---------------------------------------------------------------------------
# Interleaved-layout kernels (round-2 redesign)
#
# The halves-layout kernels above deinterleave each pass's (low, high) pairs
# into axis halves, which forces pair-split reshapes and a transpose per
# axis; those cap DMA efficiency (small contiguous runs, VMEM inflation).
# The interleaved kernels keep every pass IN PLACE:
#
#     out[2l]   = (v[2l] + v[2l+1]) / 2      (low  stays at even index)
#     out[2l+1] = (v[2l] - v[2l+1]) / 2      (high stays at odd index)
#
# — a roll + parity-select stencil with no reshapes and no transposes, so
# it works at any lane width (wide L -> >= 4 KiB HBM runs) and can be
# blocked over rows (pairs are adjacent; an even block never splits one).
# The reference's halves order is recovered by a fixed per-axis index
# permutation (interleave_perm) applied by the HOST packer while it walks
# coefficients — archive bytes are identical, the device never pays for
# the shuffle.  The inverse consumes interleaved coefficients directly and
# emits natural spatial order, so decompress needs no permutation at all.
# Bitwise-equal to the reference math (same single rounding per output);
# asserted in tests/test_interleaved.py.
# ---------------------------------------------------------------------------


def interleave_coords_multi(dims, scales: int):
    """Physical coordinates of every LOGICAL pyramid position for the
    multi-scale interleaved layout: returns (PX, PY, PZ), each int64
    [X, Y, Z], with ``logical (i, j, k) -> physical (PX[ijk], PY[ijk],
    PZ[ijk])``.

    The map is NOT a per-axis product for scales > 1: a coordinate in a
    high band means the other axes were never re-transformed at deeper
    scales (haar3d_forward_multi only recurses into the corner block), so
    membership of the block decides which scale's per-axis map applies.
    Recursion mirrors the pyramid: outside the corner block, the
    single-scale maps apply; inside, recurse on the half-dims and double
    (scale-1 lows sit at even physical positions in every axis).
    """
    import numpy as np

    x, y, z = (int(d) for d in dims)
    px1, py1, pz1 = (interleave_perm(n) for n in (x, y, z))
    PX = np.broadcast_to(px1[:, None, None], (x, y, z)).copy()
    PY = np.broadcast_to(py1[None, :, None], (x, y, z)).copy()
    PZ = np.broadcast_to(pz1[None, None, :], (x, y, z)).copy()
    if scales > 1 and x % 2 == 0 and y % 2 == 0 and z % 2 == 0:
        hx, hy, hz = x // 2, y // 2, z // 2
        QX, QY, QZ = interleave_coords_multi((hx, hy, hz), scales - 1)
        PX[:hx, :hy, :hz] = 2 * QX
        PY[:hx, :hy, :hz] = 2 * QY
        PZ[:hx, :hy, :hz] = 2 * QZ
    return PX, PY, PZ


def interleave_map_multi(dims, scales: int, sx: int, sy: int, sz: int = 1):
    """Flat physical element offsets per logical position: int64[X*Y*Z]
    with strides (sx, sy, sz) — the host packer's walk table for the
    multi-scale interleaved layout.

    Built directly in flat form: the corner block's recursive map uses
    the PARENT's strides throughout (physical coords double per scale, so
    ``corner = 2 * submap`` with the same (sx, sy, sz)), which means the
    three int64 [X, Y, Z] coordinate temporaries of
    :func:`interleave_coords_multi` (24 B/element on top of the 8 B
    result — prohibitive for giant boxes) are never materialized; peak is
    the result plus broadcast scratch.  Bitwise-identical to the
    coordinate route (tests/test_interleaved.py)."""
    import numpy as np

    x, y, z = (int(d) for d in dims)
    px1, py1, pz1 = (interleave_perm(n) for n in (x, y, z))
    m = (px1[:, None, None] * sx + py1[None, :, None] * sy
         + pz1[None, None, :] * sz)
    if scales > 1 and x % 2 == 0 and y % 2 == 0 and z % 2 == 0:
        hx, hy, hz = x // 2, y // 2, z // 2
        m[:hx, :hy, :hz] = 2 * interleave_map_multi(
            (hx, hy, hz), scales - 1, sx, sy, sz).reshape(hx, hy, hz)
    return m.reshape(-1)


def interleave_perm(n: int) -> "np.ndarray":
    """Logical (reference halves-order) index -> physical interleaved index.

    lows l < n//2 live at 2l; highs at 2(l - n//2) + 1; an odd axis's last
    element stays in place (compressor.cpp:107 leaves it untransformed).
    """
    import numpy as np

    h = n // 2
    p = np.empty(n, np.int64)
    p[:h] = 2 * np.arange(h)
    p[h : 2 * h] = 2 * np.arange(h) + 1
    if n % 2:
        p[n - 1] = n - 1
    return p


def _interleave_pass(v: jax.Array, axis: int, stride: int = 1,
                     inverse: bool = False, member=None) -> jax.Array:
    """One in-place Haar pass along ``axis`` (stencil form).

    ``stride = 2**(s-1)`` selects scale ``s`` of the pyramid: the pass
    pairs positions ``(2m*stride, (2m+1)*stride)``.  ``member`` restricts
    it to the scale's corner block (positions that are scale-(s-1) lows in
    EVERY axis — the block ``haar3d_forward_multi`` re-transforms); a
    member's roll partner is itself a member, so partners are always
    valid.  Pairs never straddle a packed-segment boundary as long as the
    segment length divides by ``2*stride``.
    """
    left = jnp.roll(v, -stride, axis)    # partner of even-position lows
    right = jnp.roll(v, stride, axis)    # partner of odd-position entries
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    parity = (idx // stride) % 2
    half = jnp.asarray(0.5, v.dtype)
    if inverse:
        even_out = v + left          # avg + diff
        odd_out = right - v          # avg - diff
    else:
        even_out = (v + left) * half
        odd_out = (right - v) * half
    out = jnp.where(parity == 0, even_out, odd_out)
    if member is None:
        return out
    return jnp.where(member, out, v)


def _scale_member(shape, stride: int, seg: int | None = None):
    """Membership mask of the scale's corner block in interleaved space:
    positions that are multiples of ``stride`` along every axis (within
    each packed lane segment of length ``seg`` for the lane axis)."""
    if stride == 1:
        return None
    m = None
    for axis in range(3):
        idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        if axis == 2 and seg is not None:
            idx = idx % seg
        cond = idx % stride == 0
        m = cond if m is None else (m & cond)
    return m


def _fwd_interleaved_block(v: jax.Array, scales: int = 1,
                           seg: int | None = None) -> jax.Array:
    """(rows, Y, L) forward: per scale, Z, Y, X passes, all in place
    (rows = X chunk; scale s pairs at stride 2**(s-1) within the corner
    block).  Multi-scale X-blocking is valid whenever the block size is a
    multiple of 2**scales (what _x_block guarantees): block-local row
    indices then have the same corner membership and pair parity as the
    global indices, so a blocked run is bitwise-identical to a
    whole-extent run (asserted by the multiscale kernel tests)."""
    for s in range(scales):
        st = 1 << s
        member = _scale_member(v.shape, st, seg)
        v = _interleave_pass(v, 2, st, member=member)
        v = _interleave_pass(v, 1, st, member=member)
        v = _interleave_pass(v, 0, st, member=member)
    return v


def _inv_interleaved_block(v: jax.Array, scales: int = 1,
                           seg: int | None = None) -> jax.Array:
    """Coarsest scale first, X, Y, Z inverse passes per scale; input
    interleaved, output natural spatial."""
    for s in reversed(range(scales)):
        st = 1 << s
        member = _scale_member(v.shape, st, seg)
        v = _interleave_pass(v, 0, st, inverse=True, member=member)
        v = _interleave_pass(v, 1, st, inverse=True, member=member)
        v = _interleave_pass(v, 2, st, inverse=True, member=member)
    return v


def interleaved_ok(dims, scales: int = 1) -> bool:
    """Interleaved kernels need extents divisible by ``2**scales`` (odd
    tails take the halves path, which handles the reference's
    stay-in-place/zeroing quirks; deeper pyramids need deeper
    divisibility, same rule as haar3d_forward_multi)."""
    q = 1 << max(1, int(scales))
    return all(int(d) % q == 0 for d in dims)


def _x_block(x: int, y: int, L: int, target_bytes: int = 1 << 20,
             scales: int = 1) -> int:
    """Rows per grid step: largest divisor of X that is a multiple of
    ``2**scales`` within the VMEM target (the stencil's intermediates are
    ~4-6x the block bytes).

    A block must hold whole pairs at every scale: scale s pairs span
    ``2**s`` rows, so blocks must be ``2**scales``-multiples (a too-small
    block would silently skip passes — rolls on a short axis wrap — so
    when nothing fits the byte target we still take ``2**scales`` and let
    VMEM pressure surface as a compile error rather than wrong
    coefficients; interleaved_pack_factor caps the lane width so the
    minimum block fits at scales=1).
    """
    if x % 2:
        return 1
    q = 1 << scales
    # sublane-padded row bytes, like block_rows: Mosaic pads Y to 8
    # sublanes, so a thin-Y box's real block is up to 8/y x the nominal
    # estimate — sizing from the unpadded row overshot the VMEM target
    row = max(y, 8) * L * 4
    xb = max(q, min(x, target_bytes // max(row, 1)))
    while xb > q and (x % xb or xb % q):
        xb -= 1
    if x % xb or xb % q:
        xb = q
    return xb


@functools.partial(jax.jit, static_argnames=("n_seg", "scales",
                                             "interpret"),
                   donate_argnums=(0,))
def _fwd_interleaved_call(packed: jax.Array, n_seg: int, scales: int = 1,
                          *, interpret: bool = False):
    m, x, y, L = packed.shape
    z = L // n_seg
    flat = packed.reshape(m * x, y, L)
    xb = _x_block(x, y, L, scales=scales)
    g = (m * x) // xb

    def kern(x_ref, out_ref, maxv_ref, minv_ref):
        c = _fwd_interleaved_block(x_ref[:], scales,
                                   seg=z if n_seg > 1 else None)
        out_ref[:] = c
        # per-lane partials broadcast into an (8, L) tile: Mosaic requires
        # the block's trailing two dims to be (8k, 128k)-tiled, so a
        # (1, L) per-block row cannot lower (interpret mode does not
        # enforce this — caught on real hardware); the 8-sublane broadcast
        # costs ~8/(xb*y) extra HBM write traffic (~3% at xb=4, y=64)
        maxv_ref[0] = jnp.broadcast_to(jnp.max(c, axis=(0, 1)), (8, L))
        minv_ref[0] = jnp.broadcast_to(jnp.min(c, axis=(0, 1)), (8, L))

    c, pmax, pmin = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m * x, y, L), packed.dtype),
            jax.ShapeDtypeStruct((g, 8, L), packed.dtype),
            jax.ShapeDtypeStruct((g, 8, L), packed.dtype),
        ),
        interpret=interpret,
        input_output_aliases={0: 0},
        compiler_params=_PARALLEL,
    )(flat)
    # finish the reduction: blocks of box (mm, p) are rows mm*x/xb..(mm+1)*x/xb
    blocks_per_box = x // xb
    maxv = jnp.max(pmax.reshape(m, blocks_per_box, 8, n_seg, z),
                   axis=(1, 2, 4)).reshape(-1)
    minv = jnp.min(pmin.reshape(m, blocks_per_box, 8, n_seg, z),
                   axis=(1, 2, 4)).reshape(-1)
    return c.reshape(m, x, y, L), maxv, minv


@functools.partial(jax.jit, static_argnames=("n_seg", "scales",
                                             "interpret"),
                   donate_argnums=(0,))
def _fwd_interleaved_nored_call(packed: jax.Array, n_seg: int = 1,
                                scales: int = 1,
                                *, interpret: bool = False):
    """Forward without the fused extrema reductions: the global-threshold
    histogram pass doesn't need per-box extrema, and the reduction outputs
    cost ~16% (measured 164 vs 193 GB/s) — this variant runs at the bare
    stencil rate."""
    m, x, y, L = packed.shape
    z = L // n_seg
    flat = packed.reshape(m * x, y, L)
    xb = _x_block(x, y, L, scales=scales)

    def kern(x_ref, out_ref):
        out_ref[:] = _fwd_interleaved_block(
            x_ref[:], scales, seg=z if n_seg > 1 else None)

    out = pl.pallas_call(
        kern,
        grid=((m * x) // xb,),
        in_specs=[pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m * x, y, L), packed.dtype),
        interpret=interpret,
        input_output_aliases={0: 0},
        compiler_params=_PARALLEL,
    )(flat)
    return out.reshape(m, x, y, L)


def _check_interleaved_shape(packed, n_seg: int, scales: int) -> None:
    """Loud error instead of silent corruption: a shape that fails
    interleaved_ok would make the X-pass rolls wrap (self-pairing rows)
    or leave rows uncovered by the block grid, returning plausible but
    WRONG coefficients.  Production routes through engine.coeff_layout,
    which gates on the same rule; this guards every other caller."""
    m, x, y, L = packed.shape
    if n_seg < 1 or L % n_seg:
        raise ValueError(f"lane extent {L} not divisible by pack {n_seg}")
    dims = (x, y, L // n_seg)
    if not interleaved_ok(dims, scales):
        raise ValueError(
            f"interleaved kernels need box dims divisible by "
            f"2**{max(1, int(scales))}, got {dims} — odd/indivisible "
            "shapes take the halves or jnp path (engine.coeff_layout)")


def fused_forward_interleaved_nored(packed: jax.Array, n_seg: int = 1,
                                    scales: int = 1) -> jax.Array:
    """Interleaved forward, coefficients only (no extrema) — for callers
    that don't threshold per box (global-histogram mode)."""
    _check_interleaved_shape(packed, n_seg, scales)
    if supported():
        return _fwd_interleaved_nored_call(packed, n_seg, scales)
    return _fwd_interleaved_nored_call(packed, n_seg, scales,
                                       interpret=True)


@functools.partial(jax.jit, static_argnames=("n_seg", "scales",
                                             "interpret"),
                   donate_argnums=(0,))
def _inv_interleaved_call(packed: jax.Array, n_seg: int = 1,
                          scales: int = 1, *, interpret: bool = False):
    m, x, y, L = packed.shape
    z = L // n_seg
    flat = packed.reshape(m * x, y, L)
    xb = _x_block(x, y, L, scales=scales)

    def kern(c_ref, out_ref):
        out_ref[:] = _inv_interleaved_block(
            c_ref[:], scales, seg=z if n_seg > 1 else None)

    out = pl.pallas_call(
        kern,
        grid=((m * x) // xb,),
        in_specs=[pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m * x, y, L), packed.dtype),
        interpret=interpret,
        input_output_aliases={0: 0},
        compiler_params=_PARALLEL,
    )(flat)
    return out.reshape(m, x, y, L)


def fused_forward_interleaved(packed: jax.Array, n_seg: int,
                              scales: int = 1):
    """Packed [M, X, Y, n_seg*Z] -> (interleaved coeffs, max [M*n_seg],
    min [M*n_seg]).  Coefficients stay in interleaved (in-place) order —
    a ``scales``-deep pyramid when requested; the host packer walks
    :func:`interleave_map_multi` to recover the reference byte order
    exactly."""
    _check_interleaved_shape(packed, n_seg, scales)
    if supported():
        return _fwd_interleaved_call(packed, n_seg, scales)
    return _fwd_interleaved_call(packed, n_seg, scales, interpret=True)


def fused_inverse_interleaved(packed: jax.Array, n_seg: int = 1,
                              scales: int = 1) -> jax.Array:
    """Interleaved coeffs [M, X, Y, L] -> natural spatial boxes (packed)."""
    _check_interleaved_shape(packed, n_seg, scales)
    if supported():
        return _inv_interleaved_call(packed, n_seg, scales)
    return _inv_interleaved_call(packed, n_seg, scales, interpret=True)


def interleaved_pack_factor(dims, target_lanes: int = 1024,
                            scales: int = 1) -> int:
    """Boxes per packed row for the interleaved layout: fill up to
    ``target_lanes`` lanes (wide rows -> >= 4 KiB contiguous HBM runs,
    the DMA-efficient regime) with P = target/Z whole Z-extents.

    P is additionally capped so the MINIMUM legal interleaved block
    (``2**scales`` X rows, see :func:`_x_block`) stays within the 1 MiB
    block target — otherwise wide rows on large (Y, Z) boxes would force
    VMEM-oversized blocks.  The kernels stream these blocks, so box sizes
    are otherwise unbounded (unlike the whole-box halves kernels)."""
    x, y, z = (int(d) for d in dims)
    if z <= 0 or z % 2 or not interleaved_ok(dims, scales):
        return 1
    if z >= target_lanes:
        return 1
    p = target_lanes // z
    q = 1 << max(1, int(scales))
    max_p = max(1, (1 << 20) // (q * y * z * 4))
    return max(1, min(p, max_p))


def lane_pack_factor(dims) -> int:
    """Boxes per 128-lane row for shape (X, Y, Z): pack P = 128 // Z boxes'
    Z-axes into the lane dimension when Z evenly fills it.  Z >= 128 (or
    shapes that don't divide) pack singly."""
    z = int(dims[-1])
    if 0 < z < 128 and 128 % z == 0 and z % 2 == 0:
        return 128 // z
    return 1


def fused_forward_packed(packed: jax.Array, n_seg: int):
    """Packed layout [M, X, Y, n_seg*Z]: lane-dense forward transform.

    DMA efficiency on this hardware depends on contiguous run length; boxes
    with Z < 128 fill only part of each (8, 128) tile, so the batch packs
    ``n_seg`` boxes' Z-rows per 128-lane row (runs of 512 B instead of
    Z*4 B) — measured ~1.7x over the unpacked kernel at Z=64.
    Returns (coeffs packed [M, X, Y, L], max [M*n_seg], min [M*n_seg]) with
    per-box extrema in item order.
    """
    if supported():
        return _fused_forward_packed_call(packed, n_seg)
    return _fused_forward_packed_call(packed, n_seg, interpret=True)


def fused_inverse_packed(packed: jax.Array, n_seg: int) -> jax.Array:
    if supported():
        return _fused_inverse_packed_call(packed, n_seg)
    return _fused_inverse_packed_call(packed, n_seg, interpret=True)


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
