"""Sort-free on-device sparsification (strided rank-select compact).

Replaces the chunked-argsort ``engine._compact_step`` hot path.  The
reference sparsifies serially while packing (compressor.cpp:222-234); on
TPU the kept (index, value) pairs are what crosses the device->host link,
so the compact stage's rate bounds sparse-transport throughput.

Round-3 probes (bench_results/kernel_probe8*.json) showed every sort-based
design binds at 2.7-3.8 GB/s while a bare prefix-sum runs at 43 GB/s: the
full-width sort is the waste.  This module compacts WITHOUT sorting the
coefficient array:

1. **Strided chunking**: the row is viewed as [c, C] (a free reshape), so
   chunk b holds positions {b, b+C, b+2C, ...}.  Real coefficient rows
   cluster their kept entries (the low-band corner of a Haar pyramid is
   nearly 100% kept — measured row_overflow_rate 1.0 for CONTIGUOUS
   chunks on shock-tube fields, kernel_probe11.json); stride-C sampling
   spreads any run of up to C consecutive kept positions one-per-chunk,
   so per-chunk density ~ the row's global kept fraction and a small
   per-chunk capacity K suffices.
2. **Rank via MXU prefix**: the keep-mask's exclusive prefix sum down
   each chunk (sublane axis) is a [c, c] strictly-lower-triangular bf16
   matmul — exact for 0/1 operands, full 512-row MXU utilization.
3. **One-hot rank select**: for each rank k < K, a compare-select
   reduction extracts the chunk-local position holding rank k and its
   value (exact: at most one nonzero term per sum).
4. **Matmul-gather assembly**: output slot k's source chunk is
   ch(k) = #(chunk offsets <= k) - 1; ONE f32 matmul U = tT @ onehot(ch)
   gathers positions, values and offsets at ch simultaneously (per-element
   HBM gathers were the round-3 assembly's bottleneck).
5. **Pair sort**: strided chunk ids interleave global positions, so the
   assembled ``cap`` pairs are keysorted ascending (cap is ~2% of the row
   — this sort is ~100x cheaper than sorting the coefficient array, and
   it restores exactly the argsort path's output order).

K bounds the kept count PER CHUNK the fast path can represent (default
32 of 512 = 6.25% against few-percent row-wide keeps).  Rows where any
chunk exceeds K are flagged in the returned overflow mask and the caller
re-runs them through the argsort path — correctness never depends on K.

Two interchangeable implementations of stages 2-4 (``impl``/``assemble``):
``jnp`` (XLA-fused cumsum + gathers) and ``pallas`` (Mosaic kernels).
Both produce bit-identical (counts, idx, vals) to ``engine._compact_step``
on non-overflowing rows (tests/test_compact_fast.py); the production
switch is measured, not assumed — scripts/kernel_probe11.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["compact_fast", "fast_ok", "direct_ok", "CHUNK", "KSLOTS"]

CHUNK = 512     # within-chunk length c (the strided view is [c, C])
KSLOTS = 32     # per-chunk kept capacity of the fast path (see header)

# Both assembly stages attribute output slots to chunks by comparing f32
# copies of integer offsets (``offs <= ks``): integers above 2**24 are not
# exactly representable in float32, so boundary slots would silently map
# to the wrong chunk and emit wrong (index, value) pairs with no overflow
# flag.  The fast path therefore refuses caps past this bound (the caller
# falls back to the argsort compact, which is integer throughout).
_F32_EXACT = 1 << 24

_PARALLEL = pltpu.CompilerParams(dimension_semantics=("parallel", "parallel"))


def fast_ok(m: int, c: int = CHUNK, cap: "int | None" = None) -> bool:
    """The skewed view handles any row length; only tiny rows (where the
    chunk machinery cannot win) and caps past the f32-exact integer range
    (see ``_F32_EXACT``) are excluded."""
    if cap is not None and cap > _F32_EXACT:
        return False
    return m >= 4 * c


_SKEW = 73   # x-slab skew offset (odd; see _skew_params)


def _skew_params(m: int, dims, c: int = CHUNK):
    """Skewed-view geometry for an [n, m] row of boxes shaped ``dims``.

    chunk(pos) = pos mod C is blind to x whenever C divides Y*Z (always,
    for power-of-2 boxes): a constant-x feature drops its whole X-extent
    into ONE chunk (measured row_overflow_rate 1.0 on shock-field Haar
    coefficients, kernel_probe11.json).  Padding each x-slab by an ODD
    offset P makes the skewed position x*W + y*Z + z with W = Y*Z + P
    odd, so chunk = pos_skew mod C' mixes all three axes: x-lines visit
    C'/gcd distinct chunks, y-lines spread by Z, z-lines are consecutive.
    The pad slots are NaN (|NaN| > t is false for every t, including the
    negative thresholds of the reference's keep-everything quirk), so
    counts stay exact.  C' is rounded so one lane-tile divides it.
    """
    x = int(dims[0]) if dims is not None else 1
    if x < 1 or m % x:
        x = 1
    yz = m // x
    p = _SKEW if (yz + _SKEW) % 2 else _SKEW + 1
    w = yz + p
    m2 = x * w
    # Mosaic wants lane widths in 128s: fix the chunk count C' to a
    # multiple of 128 near m2/c and let the within-chunk length absorb
    # the remainder (rounded to the 8-sublane tile); padding stays ~1-3%
    ct = max(1, -(-m2 // (c * 128))) * 128
    cc = max(8, -(-m2 // (ct * 8)) * 8)
    return x, yz, w, cc, ct


def _skew_view(flat: jax.Array, dims, c: int = CHUNK):
    """[n, m] -> NaN-padded skewed view [n, c', C'] (chunk axis minor)."""
    n, m = flat.shape
    x, yz, w, cc, ct = _skew_params(m, dims, c)
    sk = jnp.pad(flat.reshape(n, x, yz), ((0, 0), (0, 0), (0, w - yz)),
                 constant_values=jnp.nan).reshape(n, x * w)
    sk = jnp.pad(sk, ((0, 0), (0, ct * cc - x * w)),
                 constant_values=jnp.nan)
    return sk.reshape(n, cc, ct)


# ---------------------------------------------------------------- rank select

def _rank_select_jnp(flat3: jax.Array, t32: jax.Array, K: int):
    """[n, c, C] (strided view: chunk b = column b) ->
    (kept counts [n, C] i32, chunk-local positions of the first K kept,
    ascending [n, K, C] i32, their values [n, K, C] f32)."""
    mask = jnp.abs(flat3) > t32[:, None, None]
    mi = mask.astype(jnp.int32)
    cnt = jnp.sum(mi, axis=1)
    ranks = jnp.cumsum(mi, axis=1) - mi            # exclusive prefix
    ranksel = jnp.where(mask, ranks, -1)
    c = flat3.shape[1]
    kio = jnp.arange(K, dtype=jnp.int32)
    io_c = jnp.arange(c, dtype=jnp.int32)
    # XLA fuses the [n, c, K, C] broadcast-compare into the reduction;
    # nothing K*C-sized reaches HBM.
    oh = ranksel[:, :, None, :] == kio[None, None, :, None]
    jloc = jnp.sum(jnp.where(oh, io_c[None, :, None, None], jnp.int32(0)),
                   axis=1)
    vc = jnp.sum(jnp.where(oh, flat3[:, :, None, :], 0.0), axis=1)
    return cnt, jloc, vc


def _tri(c: int) -> jax.Array:
    """Strictly-lower-triangular ones, [c, c] bf16: T^T @ mask = exclusive
    down-column prefix (0/1 inputs, f32 accumulate — exact on the MXU)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (j < i).astype(jnp.bfloat16)


_KBATCH = 4   # rank slots per in-kernel sub-step: bounds the [c, kb, Cb]
              # one-hot intermediates to ~1 MiB of VMEM


def _rank_select_kernel(t_ref, x_ref, tri_ref, jc_ref, vc_ref, *,
                        c: int, cb: int, K: int):
    """Block = [c, Cb] (all chunk rows x a lane-tile of chunks).  Emits
    jc[k, b] = (k < K: position of chunk b's k-th kept entry, ascending;
    k == K: chunk b's kept count) and vc[k, b] = the k-th kept VALUE
    (exact: each one-hot sum has at most one nonzero term).  Everything
    stays lane-major — Mosaic has no lane<->sublane reshape, so nothing
    here may change the minor dimension."""
    x = x_ref[0]                                    # [c, cb] f32
    t = t_ref[0, 0, 0]
    mask = jnp.abs(x) > t
    mb = mask.astype(jnp.bfloat16)
    # down-column exclusive prefix on the MXU: ranks = T^T @ mask
    ranks = jax.lax.dot_general(
        tri_ref[...], mb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # [c, cb]
    # tpu.iota is integer-only, so the rank comparison runs in i32
    ranksel = jnp.where(mask, ranks.astype(jnp.int32), -1)
    cnt = jnp.sum(mask.astype(jnp.float32), axis=0, keepdims=True)
    jc_ref[0, K:K + 1] = cnt.astype(jnp.int32)
    for s in range(0, K, _KBATCH):                  # static, unrolled
        kb = min(_KBATCH, K - s)
        kio = (jnp.int32(s) +
               jax.lax.broadcasted_iota(jnp.int32, (c, kb, cb), 1))
        io_c = jax.lax.broadcasted_iota(jnp.int32, (c, kb, cb), 0)
        oh = ranksel[:, None, :] == kio
        jc_ref[0, s:s + kb] = jnp.sum(jnp.where(oh, io_c, 0), axis=0)
        vc_ref[0, s:s + kb] = jnp.sum(
            jnp.where(oh, x[:, None, :], 0.0), axis=0)


def _chunk_tile(C: int) -> int:
    """Chunk columns per grid step (lane tile)."""
    return 128 if C % 128 == 0 and C > 128 else C


def _rank_select_pallas(flat3: jax.Array, t32: jax.Array, K: int,
                        interpret: bool = False):
    n, c, C = flat3.shape
    cb = _chunk_tile(C)
    kern = functools.partial(_rank_select_kernel, c=c, cb=cb, K=K)
    jc, vc = pl.pallas_call(
        kern,
        grid=(n, C // cb),
        in_specs=[
            # [n, 1, 128] broadcast of the per-row threshold: Mosaic block
            # shapes must tile (8, 128) or match the array dims, so a
            # scalar-per-row rides a one-sublane 128-lane tile
            pl.BlockSpec((1, 1, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, cb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, K + 1, cb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, cb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, K + 1, C), jnp.int32),
            jax.ShapeDtypeStruct((n, K, C), jnp.float32),
        ),
        compiler_params=_PARALLEL,
        interpret=interpret,
    )(jnp.broadcast_to(t32[:, None, None], (n, 1, 128)), flat3, _tri(c))
    return jc[:, K, :], jc[:, :K, :], vc


# -------------------------------------------------- direct (padless) rank select
#
# Probe 13 (bench_results/kernel_probe13.json) attributed 27% of the
# compact chain to building the skewed VIEW alone: two sequential full
# jnp.pad copies at the separate-output copy rate (81 GB/s combined), and
# no XLA-level one-copy form measured faster (probe 13b).  The fusion the
# pads cannot express in XLA IS expressible in the kernel: stream the
# UNPADDED [n, x, yz] slabs (plain affine blocks, no padding, no NaN
# sentinels), and place each slab into skew-chunk alignment in VMEM with
# one dynamic lane rotation (tpu.dynamic_rotate) — slab s's skewed
# positions are s*w + r, i.e. a lane offset of (s*w) mod C and a row
# offset of (s*w) // C.  Per-chunk counts and the first-K selections
# accumulate across slabs directly in the revisited output block (exact:
# each global rank matches at most once), with validity decided by
# POSITION iota instead of NaN pad values.  Output contract is identical
# to _rank_select_pallas, so every downstream stage (offsets, assembly,
# unskew, keysort) is unchanged and the bitwise tests pin equality.
#
# MEASURED OUTCOME (probe 14, bench_results/kernel_probe14.json): bitwise
# on hardware at 64^3/128^3/mixed shapes, but SLOWER than the skew path —
# rank-select 29.0 GB/s vs 35.2 (which includes the two pad copies),
# chain 19.0 vs 21.6.  The per-slab small-frame processing (the [~8, C]
# frames underfill the VPU relative to the skew kernel's [c', 128]
# blocks, plus two rotations and sequential read-modify-write
# accumulation per slab) costs more than the two saved HBM passes.  The
# skew-view path REMAINS production; this kernel is kept as the measured
# alternative (reachable via impl="direct", CPU- and hardware-tested) so
# the negative result stays reproducible.

_DIRECT_GROUP_BYTES = 2 << 20   # slab-group block target (VMEM + DMA size)


def direct_ok(m: int, dims, c: int = CHUNK) -> bool:
    """The padless kernel streams whole x-slabs: it needs a real slab
    decomposition (x >= 2), slabs at least one chunk-row wide, and a
    lane-aligned slab stride — Mosaic rejects dynamic loads at unaligned
    offsets ("dynamic load with unaligned indices", probe 14), and the
    kernel indexes slab g of its block dynamically, so yz must be a
    multiple of the 128-lane tile.  Power-of-two AMR shapes always
    qualify; odd shapes keep the skew-view path."""
    x, yz, w, cc, ct = _skew_params(m, dims, c)
    return x >= 2 and yz >= ct and yz % 128 == 0


def _rank_select_direct_kernel(t_ref, x_ref, jc_ref, vc_ref, *,
                               G: int, yz: int, w: int, ct: int,
                               rows: int, K: int, n_slabs: int):
    g0 = pl.program_id(1) * G

    @pl.when(g0 == 0)
    def _init():
        jc_ref[...] = jnp.zeros(jc_ref.shape, jnp.int32)
        vc_ref[...] = jnp.zeros(vc_ref.shape, jnp.float32)

    t = t_ref[0, 0, 0]
    full, rem = yz // ct, yz % ct
    pos = (jax.lax.broadcasted_iota(jnp.int32, (rows, ct), 0) * ct
           + jax.lax.broadcasted_iota(jnp.int32, (rows, ct), 1))

    def slab(g, _):
        s = g0 + g
        s0g = s * w                       # skewed offset of this slab
        lane0 = jax.lax.rem(s0g, ct)
        base_row = jax.lax.div(s0g, ct)
        # ONE dynamic load per slab (multi-tile loads at a dynamic sublane
        # index lower fine; per-chunk 128-wide dynamic loads hit Mosaic's
        # "dynamic load with unaligned indices" — probe 14), then static
        # lane slices.  frame0[j, l] = slab[j*ct + l]; the tail row is a
        # window ending at yz, statically rolled so lanes < rem hold the
        # true tail — its junk lanes land at positions >= yz and the
        # validity mask drops them (no pad values anywhere).
        row = x_ref[0, g, :].reshape(1, yz)
        parts = [row[:, j * ct:(j + 1) * ct] for j in range(full)]
        if rem:
            parts.append(pltpu.roll(row[:, yz - ct:], rem, 1))
        if len(parts) < rows:
            parts.append(jnp.zeros((rows - len(parts), ct), jnp.float32))
        frame0 = jnp.concatenate(parts, axis=0)       # [rows, ct]
        # one dynamic lane rotation + a row shift-down for the wrap:
        # F[j, l] = slab[j*ct + l - lane0]
        a = pltpu.roll(frame0, lane0, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, ct), 1)
        frame = jnp.where(lane < lane0, pltpu.roll(a, 1, 0), a)
        valid = (pos >= lane0) & (pos < lane0 + yz)
        mask = (jnp.abs(frame) > t) & valid
        mi = mask.astype(jnp.int32)
        # exclusive down-column prefix over the handful of frame rows
        incl = mi
        sh = 1
        while sh < rows:
            rio = jax.lax.broadcasted_iota(jnp.int32, (rows, ct), 0)
            incl = incl + jnp.where(rio >= sh, pltpu.roll(incl, sh, 0), 0)
            sh *= 2
        cnt_prev = jc_ref[0, K:K + 1]                 # [1, ct] i32
        grank = cnt_prev + (incl - mi)
        granksel = jnp.where(mask, grank, -1)
        for s0 in range(0, K, _KBATCH):               # static, unrolled
            kb = min(_KBATCH, K - s0)
            kio = (jnp.int32(s0) + jax.lax.broadcasted_iota(
                jnp.int32, (rows, kb, ct), 1))
            io_r = (base_row + jax.lax.broadcasted_iota(
                jnp.int32, (rows, kb, ct), 0))
            oh = granksel[:, None, :] == kio
            jc_ref[0, s0:s0 + kb] = jc_ref[0, s0:s0 + kb] + jnp.sum(
                jnp.where(oh, io_r, 0), axis=0)
            vc_ref[0, s0:s0 + kb] = vc_ref[0, s0:s0 + kb] + jnp.sum(
                jnp.where(oh, frame[:, None, :], 0.0), axis=0)
        jc_ref[0, K:K + 1] = cnt_prev + jnp.sum(mi, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, jnp.minimum(G, n_slabs - g0), slab, 0)


def _rank_select_pallas_direct(flat: jax.Array, t32: jax.Array, K: int,
                               dims, c: int = CHUNK,
                               interpret: bool = False):
    """Padless rank select: same (cnt, jloc, vc) as
    ``_rank_select_pallas(_skew_view(flat, dims), t32, K)`` with zero
    skew-view HBM passes.  Callers must gate on :func:`direct_ok`."""
    n, m = flat.shape
    x, yz, w, cc, ct = _skew_params(m, dims, c)
    rows = (yz + 2 * ct - 2) // ct
    G = max(1, min(x, _DIRECT_GROUP_BYTES // (yz * 4)))
    kern = functools.partial(_rank_select_direct_kernel, G=G, yz=yz, w=w,
                             ct=ct, rows=rows, K=K, n_slabs=x)
    jc, vc = pl.pallas_call(
        kern,
        grid=(n, -(-x // G)),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, yz), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, K + 1, ct), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, ct), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, K + 1, ct), jnp.int32),
            jax.ShapeDtypeStruct((n, K, ct), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.broadcast_to(t32[:, None, None], (n, 1, 128)),
      flat.reshape(n, x, yz))
    return jc[:, K, :], jc[:, :K, :], vc


# ------------------------------------------------------------------- assembly

_KTILE = 512        # output slots assembled per in-kernel sub-step
_CTILE_MAX = 1024   # chunk-table columns per loop step (VMEM: the one-hot
                    # temp is ctile x _KTILE f32 = 2 MiB at the max)


def _ctile(C: int) -> int:
    """Largest 128-multiple divisor of C that fits the VMEM budget.

    _skew_params makes C a multiple of 128, so 128 always qualifies; the
    common case (C <= _CTILE_MAX, e.g. 640 for 64-cubed boxes) sweeps the
    whole table in ONE loop trip — measured 18.3 -> ~22 GB/s vs fixed 128
    tiles on the probe-12 chain."""
    best = 128
    for t in range(128, min(C, _CTILE_MAX) + 1, 128):
        if C % t == 0:
            best = t
    return best


def _assemble_kernel(offs_ref, tt_ref, out_ref, *,
                     C: int, K: int, cap: int):
    """Row-global assembly on the MXU: for each output slot k, the source
    chunk ch(k) = #(offs <= k) - 1 (compare-reduce), then ONE f32 matmul
    U = tT @ onehot(ch) gathers every chunk table (positions, values,
    offsets) at ch simultaneously — replacing the three per-element HBM
    gathers that capped the jnp assembly (probe11 select-vs-full split).
    Exactness: one-hot operands make each U entry a single-term f32 sum,
    and HIGHEST precision makes the f32 MXU passes exact.  Global
    position = jloc * C + ch (strided chunks)."""
    # tables are sliced straight from tt_ref per loop step (keeps VMEM flat)

    def tile(kb):
        """(idx, val) [1, _KTILE] for output slots [kb, kb+_KTILE).

        Both C sweeps run as fori_loops with carried accumulators: a
        statically unrolled C loop allocates its [tile, T] temps PER
        ITERATION on the Mosaic stack (measured 25 MB scoped-vmem OOM at
        C=4224); the loop-carried form keeps one tile's temps live.
        _ctile(C) divides C by construction."""
        ct = _ctile(C)
        ks = (kb.astype(jnp.float32) if hasattr(kb, "astype")
              else jnp.float32(kb)) + \
            jax.lax.broadcasted_iota(jnp.int32, (1, _KTILE), 1) \
            .astype(jnp.float32)                     # [1, T]

        def ch_body(ci, acc):
            oc = offs_ref[0, pl.dslice(ci * ct, ct)]           # [ct, 1]
            return acc + jnp.sum((oc <= ks).astype(jnp.float32), axis=0,
                                 keepdims=True)

        ch = jax.lax.fori_loop(0, C // ct, ch_body,
                               jnp.zeros((1, _KTILE), jnp.float32))
        ch = jnp.clip(ch - 1.0, 0.0, jnp.float32(C - 1))

        def u_body(ci, U):
            cb = ci * ct
            aio = (cb.astype(jnp.float32) if hasattr(cb, "astype")
                   else jnp.float32(cb)) + \
                jax.lax.broadcasted_iota(jnp.int32, (ct, _KTILE), 0) \
                .astype(jnp.float32)
            ocmat = jnp.where(aio == ch, 1.0, 0.0)   # [ct, T]
            # dynamic_slice of a VALUE is not lowerable in Mosaic; slice
            # the ref instead (dynamic ref reads are)
            ttb = tt_ref[0, :, pl.dslice(cb, ct)]
            return U + jax.lax.dot_general(
                ttb, ocmat, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        U = jax.lax.fori_loop(0, C // ct, u_body,
                              jnp.zeros((2 * K + 1, _KTILE), jnp.float32))
        loc = ks - U[2 * K:2 * K + 1, :]             # [1, T]
        bio = jax.lax.broadcasted_iota(jnp.int32, (K, _KTILE), 0) \
            .astype(jnp.float32)
        msk = bio == loc
        jl = jnp.sum(jnp.where(msk, U[0:K, :], 0.0), axis=0, keepdims=True)
        val = jnp.sum(jnp.where(msk, U[K:2 * K, :], 0.0), axis=0,
                      keepdims=True)
        return jl * jnp.float32(C) + ch, val

    # full tiles run under fori_loop (dynamic stores): a 128^3 box's cap
    # needs ~60-80 tiles and a python-unrolled loop would explode the
    # Mosaic program; the partial tail tile (if any) is a static epilogue
    def body(t, carry):
        kb = t * _KTILE
        idx, val = tile(kb)
        out_ref[0, 0:1, pl.dslice(kb, _KTILE)] = idx
        out_ref[0, 1:2, pl.dslice(kb, _KTILE)] = val
        return carry

    jax.lax.fori_loop(0, cap // _KTILE, body, 0)
    if cap % _KTILE:
        kb = (cap // _KTILE) * _KTILE
        kw = cap - kb
        idx, val = tile(kb)
        out_ref[0, 0:1, kb:kb + kw] = idx[:, :kw]
        out_ref[0, 1:2, kb:kb + kw] = val[:, :kw]


def _assemble_pallas(offs, tt, cap: int, C: int, K: int,
                     interpret: bool = False):
    n = offs.shape[0]
    kern = functools.partial(_assemble_kernel, C=C, K=K, cap=cap)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, C, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * K + 1, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, cap), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(offs[:, :, None], tt)
    return out[:, 0, :].astype(jnp.int32), out[:, 1, :]


def _assemble_jnp(offs, tt, cap: int, C: int, K: int):
    """Same math through XLA gathers (CPU tests and a measured baseline)."""
    n = offs.shape[0]
    jloc = tt[:, 0:K, :]
    vc = tt[:, K:2 * K, :]
    ks = jnp.arange(cap, dtype=jnp.float32)
    ch = (jnp.sum(offs[:, None, :] <= ks[None, :, None],
                  axis=2, dtype=jnp.int32) - 1)
    ch = jnp.clip(ch, 0, C - 1)
    loc = ks[None, :].astype(jnp.int32) - jnp.take_along_axis(
        offs, ch, axis=1).astype(jnp.int32)
    loc = jnp.clip(loc, 0, K - 1)
    flat_ix = loc * C + ch
    j = jnp.take_along_axis(jloc.reshape(n, K * C), flat_ix, axis=1)
    vals = jnp.take_along_axis(vc.reshape(n, K * C), flat_ix, axis=1)
    # integer position math: j is an exact small int carried in f32, but
    # j * C overflows f32 exactness past 2**24 (big skewed layouts)
    idx = j.astype(jnp.int32) * C + ch
    return idx, vals


@functools.partial(jax.jit,
                   static_argnames=("cap", "dims", "ilv1_dims", "K", "c",
                                    "impl", "assemble", "interpret"))
def compact_fast(flat: jax.Array, t32: jax.Array, cap: int, *,
                 dims=None, idx_map: jax.Array | None = None,
                 ilv1_dims=None, K: int = KSLOTS, c: int = CHUNK,
                 impl: str = "jnp", assemble: str = "jnp",
                 interpret: bool = False):
    """Sort-free drop-in for ``engine._compact_step`` plus an overflow mask.

    -> (counts [n] i32, idx [n, cap] i32, vals [n, cap] f32, over [n] bool).
    Rows with ``over`` set have a chunk holding more than K kept entries
    and must be re-compacted by the caller (their idx/vals rows are
    truncated per-chunk and NOT usable); all other rows with
    ``counts <= cap`` are bit-identical to the argsort path's
    first-``count`` entries (junk past ``count`` is arbitrary, as there).
    Rows with ``counts > cap`` hold cap kept pairs in strided-chunk order
    rather than the argsort path's globally-first cap — the engine never
    reads pair rows of cap-overflowing items (SparseCoeffs.item_pairs
    serves them from the dense fallback), so the two paths only diverge
    on rows neither ever uses.

    ``impl`` picks the rank-select stage (jnp | pallas), ``assemble`` the
    assembly stage (jnp gathers | pallas matmul-gather); the production
    choice is measured per platform (scripts/kernel_probe11.py).
    """
    n, m = flat.shape
    if not fast_ok(m, c):
        raise ValueError(f"compact_fast: m={m} too small for the fast "
                         f"path (c={c})")
    if cap > _F32_EXACT:
        # chunk attribution compares f32 copies of integer offsets: slots
        # past 2**24 would silently land in the wrong chunk (review
        # finding, round 4).  Callers must gate on fast_ok(m, cap=cap).
        raise ValueError(f"compact_fast: cap={cap} exceeds the f32-exact "
                         f"integer range ({_F32_EXACT}); use the argsort "
                         f"compact for caps this large")
    x, yz, w, _cc, C = _skew_params(m, dims, c)
    if impl == "direct":
        # padless: stream the unpadded slabs straight into the kernel
        # (zero skew-view HBM passes; callers gate on direct_ok)
        cnt, jloc, vc = _rank_select_pallas_direct(flat, t32, K, dims, c,
                                                   interpret)
    elif impl == "pallas":
        flat3 = _skew_view(flat, dims, c)            # [n, c', C]
        cnt, jloc, vc = _rank_select_pallas(flat3, t32, K, interpret)
    else:
        flat3 = _skew_view(flat, dims, c)
        cnt, jloc, vc = _rank_select_jnp(flat3, t32, K)
    counts = jnp.sum(cnt, axis=1)
    over = jnp.any(cnt > K, axis=1)
    offs = (jnp.cumsum(cnt, axis=1) - cnt).astype(jnp.float32)
    tt = jnp.concatenate([jloc.astype(jnp.float32), vc, offs[:, None, :]],
                         axis=1)                     # [n, 2K+1, C]
    # the Pallas assembly additionally stores SKEWED positions (up to the
    # padded _cc*C) through its f32 output rows — exact only below 2**24
    if assemble == "pallas" and C <= 4352 and _cc * C <= _F32_EXACT:
        idx, vals = _assemble_pallas(offs, tt, cap, C, K, interpret)
    else:
        idx, vals = _assemble_jnp(offs, tt, cap, C, K)
    # un-skew: skewed position -> true flat position
    a = idx // jnp.int32(w)
    idx = a * jnp.int32(yz) + (idx - a * jnp.int32(w))
    if ilv1_dims is not None:
        # the caller compacted the single-scale INTERLEAVED layout
        # directly (skipping the full-array regather — probe 12: the
        # 3-axis-take regather alone runs at 12.9 GB/s and halves the
        # chain).  The scales=1 inverse interleave has a CLOSED FORM per
        # axis (physical 2l <-> logical low l, 2l+1 <-> high n//2+l, an
        # odd axis's last element fixed — haar_pallas.interleave_perm),
        # so the translation is pure arithmetic: no gather at all.
        X, Y, Z = (int(v) for v in ilv1_dims)

        def inv1(p, nn):
            v = p // 2 + (p % 2) * (nn // 2)
            if nn % 2:
                v = jnp.where(p == nn - 1, nn - 1, v)
            return v

        j = jnp.clip(idx, 0, m - 1)
        ai, r = j // (Y * Z), j % (Y * Z)
        idx = (inv1(ai, X) * (Y * Z) + inv1(r // Z, Y) * Z
               + inv1(r % Z, Z))
    elif idx_map is not None:
        # multi-scale interleave is not per-axis separable
        # (haar_pallas.interleave_coords_multi): translate the cap kept
        # positions through the inverse table instead
        idx = jnp.take(idx_map, jnp.clip(idx, 0, m - 1))
    # strided chunks interleave global positions: keysort the cap pairs
    # ascending (junk slots key to m, off the end, and clamp back in
    # bounds after — consumers read only the first `count` entries)
    key = jnp.where(jnp.arange(cap)[None, :] < counts[:, None], idx,
                    jnp.int32(m))
    key, vals = jax.lax.sort((key, vals), dimension=1, num_keys=1)
    return counts, jnp.minimum(key, m - 1), vals, over
