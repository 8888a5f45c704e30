"""The device codec engine: jitted, sharded compress/decompress steps.

This is the TPU replacement for the reference's per-box serial codec calls
(modes.cpp:100-103, 151-166).  One jit per box shape (XLA caches by shape);
batches shard their leading axis over the mesh, so the same code runs
single-chip or across a pod slice unchanged.
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import functools
import logging
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np

from wavelet_tpu.core import haar, threshold
from wavelet_tpu.core import rle
from wavelet_tpu.io import archive, bundle
from wavelet_tpu.kernels import compact_pallas
from wavelet_tpu.kernels import haar_pallas
from wavelet_tpu.runtime import mesh as mesh_lib
from wavelet_tpu.runtime import batching
from wavelet_tpu.runtime.batching import ShapeBatch
from wavelet_tpu import native

log = logging.getLogger("wavelet_tpu")

__all__ = ["CodecEngine", "HostPacker", "resolve_signed_absmax"]


@functools.partial(jax.jit, donate_argnums=(0,))
def _compress_step(batch: jax.Array):
    """[N, X, Y, Z] -> (flat coeffs [N, XYZ], signed absmax [N]).

    The transform + reduction stays fused on device; the [N]-sized maxima are
    the only scalars the host needs to finish thresholding exactly
    (core/threshold.py).

    Donated input: like the Pallas kernels (haar_pallas.py header note),
    handing XLA the input buffer lets the compiled transform run in place —
    measured 2x the HBM rate of separate in/out buffers at large working
    sets on the v5e.  Every jitted step here whose device input is NOT
    reused by its caller donates it; ``_fwd_hist_only`` and
    ``_compact_step`` keep their inputs alive (callers re-fetch them).
    """
    flat = haar.forward_flat(batch)
    return flat, threshold.signed_absmax(flat, axis=-1)


@jax.jit
def _fwd_hist_only(coeffs: jax.Array):
    return threshold.abs_exponent_histogram(coeffs)


@jax.jit
def _rmse_step(a: jax.Array, b: jax.Array):
    """Per-item RMSE on device (north star: 'the RMSE/loss estimator runs
    on-device').  Two-stage float32 summation (rows then row-sums); the
    parity-exact double-accumulation estimator (core/metrics.py) remains the
    default — this is the fast path for large estimates."""
    n = a.shape[0]
    d = (a - b).reshape(n, -1)
    m = d.shape[1]
    sq = d * d
    # chunked summation keeps f32 error ~sqrt(chunks) smaller than naive
    chunks = max(1, m // 4096)
    pad = -m % chunks
    if pad:
        sq = jnp.pad(sq, ((0, 0), (0, pad)))
    partial_sums = jnp.sum(sq.reshape(n, chunks, -1), axis=2)
    return jnp.sqrt(jnp.sum(partial_sums, axis=1) / m)


@functools.partial(jax.jit, donate_argnums=(0,))
def _fwd_hist_step(batch: jax.Array):
    """[N, X, Y, Z] -> (flat coeffs [N, XYZ], magnitude histogram [EXP_HIST_BINS]).

    Device side of the global-threshold mode: fixed float-bit bins merge by
    addition across batches, shapes, chips and hosts.
    """
    flat = haar.forward_flat(batch)
    return flat, threshold.abs_exponent_histogram(flat)


_COMPACT_CHUNK = 512


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_step(flat: jax.Array, t32: jax.Array, cap: int):
    """On-device sparsification: keep-mask -> (counts, indices, values).

    The north-star requirement that 'coefficient sparsification/packing runs
    on-device': only ~cap entries per item cross the device->host link
    instead of the full coefficient array (kept fractions on real AMR data
    are a few percent).  Items with more than ``cap`` kept entries are
    detected host-side via ``counts`` and fall back to a dense fetch.

    Strategy (probes 8/8b/8c, bench_results/kernel_probe8*.json): sort
    work scales with log^2(segment), so rows are compacted per 512-element
    CHUNK (stable argsort of ~mask within chunks) and assembled with an
    exclusive scan over per-chunk counts + a compare-all chunk lookup —
    measured 3.81 GB/s vs 2.70 for the whole-row argsort, with
    cumsum-rank scatter (17x worse, round 2), binary-search gathers
    (0.57), vmapped nonzero (0.51) and single-key u32 sorts (1.99-3.74)
    all probed and beaten.  Rows too short or indivisible take the
    whole-row argsort (identical first-``count`` output either way).
    """
    m = flat.shape[1]
    mask = jnp.abs(flat) > t32[:, None]
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    c = _COMPACT_CHUNK
    if m % c or m < 4 * c:
        order = jnp.argsort(~mask, axis=1, stable=True)[:, :cap]
        vals = jnp.take_along_axis(flat, order, axis=1)
        return counts, order.astype(jnp.int32), vals
    n, C = flat.shape[0], m // c
    mch = mask.reshape(n, C, c)
    cnt = jnp.sum(mch, axis=2, dtype=jnp.int32)          # [n, C]
    offs = jnp.cumsum(cnt, axis=1) - cnt                 # exclusive scan
    order = jnp.argsort(~mch, axis=2, stable=True)       # kept-first/chunk
    ks = jnp.arange(cap, dtype=jnp.int32)
    # chunk of output slot k = last chunk whose offset <= k (broadcasted
    # compare-all over the C offsets: no gathers from long arrays)
    ch = (jnp.sum(offs[:, None, :] <= ks[None, :, None],
                  axis=2, dtype=jnp.int32) - 1)          # [n, cap]
    ch = jnp.clip(ch, 0, C - 1)
    loc = ks[None, :] - jnp.take_along_axis(offs, ch, axis=1)
    loc = jnp.clip(loc, 0, c - 1)
    j = jnp.take_along_axis(order.reshape(n, C * c), ch * c + loc, axis=1)
    idx = ch * c + j
    vals = jnp.take_along_axis(flat, idx, axis=1)
    # slots past `counts` carry in-bounds junk, exactly like the whole-row
    # argsort's tail; consumers read only the first count entries
    return counts, idx.astype(jnp.int32), vals


@functools.partial(jax.jit, static_argnames=("total",))
def _scatter_flat(phys: jax.Array, vals: jax.Array, total: int) -> jax.Array:
    """One flat scatter of every item's (physical position, value) pairs
    into the zeroed packed coefficient array (sparse decompress fast path).
    Positions >= total (padding — distinct per slot) are dropped."""
    return jnp.zeros((total,), jnp.float32).at[phys.reshape(-1)].set(
        vals.reshape(-1), mode="drop", unique_indices=True)


@functools.partial(jax.jit, static_argnames=("m",))
def _scatter_rows(idx: jax.Array, vals: jax.Array, m: int) -> jax.Array:
    """Sparse host->device decompress: per item, scatter padded (logical
    flat position, value) pairs into a zero row of m coefficients.
    Padding slots carry positions >= m (distinct per slot — the
    unique_indices contract requires ALL indices unique, including the
    dropped ones), discarded by scatter mode="drop"."""
    def one(idx_i, vals_i):
        return jnp.zeros((m,), jnp.float32).at[idx_i].set(
            vals_i, mode="drop", unique_indices=True)

    return jax.vmap(one)(idx, vals)


def _inverse_step(flat: jax.Array, dims):
    return haar.inverse_from_flat(flat, dims)


_inverse_jit = jax.jit(_inverse_step, static_argnums=1, donate_argnums=0)

_fwd_multi_jit = jax.jit(haar.haar3d_forward_multi, static_argnums=1,
                         donate_argnums=0)
_inv_multi_jit = jax.jit(haar.haar3d_inverse_multi, static_argnums=1,
                         donate_argnums=0)
# no donation: the lowpass output is 8**depth x smaller than its input, so
# the buffer could never be reused in place (donating only produces warnings)
_lowpass_jit = jax.jit(haar.haar3d_lowpass, static_argnums=1)


@functools.partial(jax.jit, static_argnames=("pack", "z"))
def _unpack_packed_coeffs(packed: jax.Array, pack: int, z: int) -> jax.Array:
    """Lane-packed [M, X, Y, P*Z] -> item-major flat [M*P, X*Y*Z] (device)."""
    m, x, y, L = packed.shape
    v = packed.reshape(m, x, y, pack, z)
    return jnp.transpose(v, (0, 3, 1, 2, 4)).reshape(m * pack, x * y * z)


@functools.partial(jax.jit, static_argnames=("pack", "dims"))
def _unpack_interleaved_coeffs(packed: jax.Array, pack: int,
                               dims) -> jax.Array:
    """Interleaved-packed [M, X, Y, P*Z] -> LOGICAL item-major flat
    [M*P, X*Y*Z] (device): undo the in-place layout with per-axis gathers
    (sparse-transfer path; the dense path defers this to the host walk)."""
    x, y, z = dims
    m = packed.shape[0]
    v = packed.reshape(m, x, y, pack, z)
    v = jnp.transpose(v, (0, 3, 1, 2, 4)).reshape(m * pack, x, y, z)
    v = jnp.take(v, jnp.asarray(haar_pallas.interleave_perm(x)), axis=1)
    v = jnp.take(v, jnp.asarray(haar_pallas.interleave_perm(y)), axis=2)
    v = jnp.take(v, jnp.asarray(haar_pallas.interleave_perm(z)), axis=3)
    return v.reshape(m * pack, x * y * z)


@functools.partial(jax.jit, static_argnames=("pack", "dims", "scales"))
def _unpack_interleaved_coeffs_multi(packed: jax.Array, pack: int,
                                     dims, scales: int) -> jax.Array:
    """Multi-scale variant of :func:`_unpack_interleaved_coeffs`: the
    pyramid's logical->physical map is non-separable (haar_pallas.
    interleave_coords_multi), so the layout is undone with one flat gather
    per item instead of per-axis takes."""
    x, y, z = dims
    m = packed.shape[0]
    v = packed.reshape(m, x, y, pack, z)
    v = jnp.transpose(v, (0, 3, 1, 2, 4)).reshape(m * pack, x * y * z)
    amap = jnp.asarray(haar_pallas.interleave_map_multi(
        dims, scales, y * z, z, 1).astype(np.int32))
    return jnp.take(v, amap, axis=1)


@dataclasses.dataclass
class SparseCoeffs:
    """Device-sparsified coefficients: per item, the kept (index, value)
    pairs in flatten order, capacity-bounded."""

    shape: tuple
    items: list
    counts: np.ndarray        # int32 [N_pad]
    idxs: np.ndarray          # int32 [N_pad, cap]
    vals: np.ndarray          # f32  [N_pad, cap]
    cap: int
    _flat_dev: object = None  # dense device array for overflow fallback

    _flat_np: object = None   # bulk dense fallback, fetched lazily once
    _lmap: object = None      # logical->stored-order map when _flat_dev
                              # holds a permuted (interleaved) layout

    def transfer_bytes(self) -> int:
        """Actual device->host traffic this sparsification costs: the pair
        buffers PLUS the dense rows the overflow fallback fetches (a bulk
        fallback pulls the whole flat array once) — the honest number for
        the ``device_to_host_bytes`` stat."""
        n = len(self.items)
        total = self.counts.nbytes + self.idxs.nbytes + self.vals.nbytes
        n_over = int(np.sum(self.counts[:n] > self.cap))
        if not n_over:
            return total
        m = int(np.prod(self.shape))
        if n_over > max(2, n // 10) and self._flat_dev is not None:
            return total + int(np.prod(self._flat_dev.shape)) * 4
        return total + n_over * m * 4

    def item_pairs(self, i: int, t32_i: float):
        """(indices, values) of item i's kept coefficients."""
        k = int(self.counts[i])
        if k <= self.cap:
            return self.idxs[i, :k], self.vals[i, :k]
        # overflow: if it's widespread, one bulk fetch beats per-item round
        # trips (each costs a full host-link latency)
        if self._flat_np is None:
            n_over = int(np.sum(self.counts[: len(self.items)] > self.cap))
            if n_over > max(2, len(self.items) // 10):
                self._flat_np = np.asarray(self._flat_dev)
        if self._flat_np is not None:
            row = self._flat_np[i]
        else:
            row = np.asarray(self._flat_dev[i])
        if self._lmap is not None:
            row = row[self._lmap]      # permuted storage -> logical order
        idx = np.flatnonzero(np.abs(row) > t32_i)
        return idx.astype(np.int32), row[idx]


def resolve_signed_absmax(maxv: np.ndarray, minv: np.ndarray,
                          flat_dev=None, row_getter=None) -> np.ndarray:
    """Signed largest-|.| value from per-box (max, min) pairs.

    The fused Pallas kernel returns plain max/min reductions; the signed
    extremum is whichever has the larger magnitude.  The only ambiguous case
    is an exact tie ``min == -max != 0`` where the reference picks whichever
    occurs *first* in flatten order (compressor.cpp:212-215); those rare
    boxes are resolved via ``flat_dev`` (an indexable [N, m] array) or
    ``row_getter(i)`` (per-item flat rows, e.g. strided packed views).
    """
    signed = np.where(np.abs(maxv) >= np.abs(minv), maxv, minv)
    tie = (minv == -maxv) & (maxv != 0)
    if tie.any():
        for i in np.flatnonzero(tie):
            if row_getter is not None:
                row = np.asarray(row_getter(int(i)))
            elif flat_dev is not None:
                row = np.asarray(flat_dev[int(i)])
            else:
                continue
            signed[i] = row[np.argmax(np.abs(row))]
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

    def __init__(self, mesh=None, use_pallas: bool | None = None,
                 scales: int = 1, layout: str | None = None,
                 giant_box_bytes: int | None = None,
                 giant_mesh_mode: str = "local"):
        self.mesh = mesh
        self.scales = int(scales)
        # "local" (default): giant boxes shard over this process's
        # devices only; "global": over the whole multi-process mesh
        # (giantmesh=global, see _giant_mesh)
        self.giant_mesh_mode = giant_mesh_mode
        # boxes at or above this many bytes route through the X-sharded
        # giant-box transform when a multi-device mesh is present (the
        # single-chip batch path would need the whole box plus its
        # coefficients on one chip).  CLI key: giantbox=BYTES.
        if giant_box_bytes is None:
            giant_box_bytes = int(os.environ.get("WAVELET_TPU_GIANTBOX",
                                                 1 << 30))
        self.giant_box_bytes = int(giant_box_bytes)
        self._giant_fns: dict = {}
        if use_pallas is None:
            use_pallas = haar_pallas.supported()
            if os.environ.get("WAVELET_TPU_FORCE_PALLAS") == "1":
                # debug/test switch: exercise the Pallas kernels in
                # interpret mode on non-TPU backends (slow; tests only)
                use_pallas = True
        # scales > 1 is pallas-supported ONLY via the interleaved layout
        # (strided in-place stencils); the halves kernels are single-scale
        self.use_pallas = use_pallas
        # mesh > 1: Pallas calls are per-device programs XLA cannot
        # auto-partition, so they run under shard_map (batch axis sharded
        # over the data mesh); cache the wrapped jits per (kind, pack)
        self._sharded_kernels: dict = {}
        self._sharded_compacts: dict = {}
        self._sparse_cap_hint: dict = {}   # shape -> adaptive cap fraction
        # coefficient layout for the fused kernels: "halves" (round-1
        # kernels, reference order on device) or "interleaved" (in-place
        # stencil kernels, wide-lane DMA; the host packer recovers the
        # reference order via index tables).  "auto" (default) picks
        # interleaved on real TPU hardware — measured faster on the v5e
        # (fwd 164 vs 139 GB/s, inv 159 vs 142; BENCH artifacts) — and
        # halves elsewhere.  Override for A/B via WAVELET_TPU_LAYOUT;
        # archives are byte-identical either way (tests/test_interleaved).
        if layout is None:
            layout = os.environ.get("WAVELET_TPU_LAYOUT", "auto")
        if layout == "auto":
            layout = ("interleaved" if haar_pallas.supported()
                      else "halves")
        if layout not in ("halves", "interleaved"):
            raise ValueError(f"unknown kernel layout {layout!r}")
        self.layout = layout

    def eff_scales(self, dims) -> int:
        """Deepest pyramid this box shape supports, capped at the requested
        ``scales``.  AMR runs mix box sizes; a (8, 4, 2) box cannot take a
        2-scale transform (its z would recurse to an odd length), so each
        shape uses the deepest applicable pyramid.  Decompression derives
        the SAME value from dims + the meta ``scales``, so archives stay
        self-consistent."""
        s = self.scales
        while s > 1 and any(int(d) % (1 << s) for d in dims):
            s -= 1
        return s

    def coeff_layout(self, dims) -> str:
        """Layout the engine's coefficient batches use for this box shape."""
        if self.giant_ok(dims):
            # the X-sharded giant-box transform emits interleaved-layout
            # coefficients (zero-collective pyramid; distributed.py)
            return "interleaved"
        if (self.layout == "interleaved" and self.use_pallas
                and haar_pallas.interleaved_ok(dims, self.eff_scales(dims))
                and self._interleaved_block_ok(dims)):
            return "interleaved"
        return "halves"

    def giant_ok(self, dims) -> bool:
        """Whether boxes of this shape route through the X-sharded
        giant-box transform (``distributed.make_sharded_box_*_interleaved``,
        the BASELINE.json config-5 'block-boundary halos' capability): a
        single box too large for one chip's working set is laid out
        ``[X, Y, Z]`` with X sharded over the mesh, every pyramid pair
        shard-local (zero collectives).  Requires a multi-device mesh and
        X divisible by ``mesh.size * 2**scales`` (each shard's extent must
        hold whole pairs at every scale)."""
        gm = self._giant_mesh()
        if gm is None:
            return False
        if int(np.prod(dims)) * 4 < self.giant_box_bytes:
            return False
        eff = self.eff_scales(dims)
        return (haar_pallas.interleaved_ok(dims, eff)
                and int(dims[0]) % (gm.size * (1 << eff)) == 0)

    _local_giant_mesh = None   # instance cache set on first use
    _global_giant_mesh = None

    def _giant_mesh(self):
        """Mesh the giant-box transform shards over.

        Default (``giant_mesh_mode="local"``): every device must be
        addressable by THIS process (the per-item ``device_put`` ships
        host data, and the coefficient fetch reads it back), so under
        multi-host the giant path uses the process's LOCAL devices: a box
        too large for one chip shards within one host's chips with zero
        cross-process collectives — the multi-host fan-out keeps slicing
        work by whole boxes, each process sharding its own giant items
        locally.

        Opt-in (``giantmesh=global`` CLI key, round-4 verdict stretch
        item 8): giant boxes shard over the GLOBAL multi-process mesh —
        per-process X-slabs in via ``distributed.giant_from_process_
        slabs``, coefficients gathered back over DCN.  The tradeoff is
        explicit and logged: EVERY process serializes on each giant box's
        collective transform + gather, so this only pays for boxes beyond
        one host's chips (~128 GiB of HBM on a v5e host, 32x the largest
        reference box); the pipelines make giant items collective across
        processes when this mode is on."""
        if self.giant_mesh_mode == "global" and jax.process_count() > 1:
            if CodecEngine._global_giant_mesh is None:
                CodecEngine._global_giant_mesh = mesh_lib.data_mesh(
                    jax.devices())
                log.info(
                    "giantmesh=global: giant boxes shard over all %d "
                    "devices across %d processes; every process "
                    "serializes on each giant box's collective "
                    "transform + DCN gather (opt-in cross-host mode)",
                    CodecEngine._global_giant_mesh.size,
                    jax.process_count())
            return CodecEngine._global_giant_mesh
        m = self.mesh
        if m is not None and m.size > 1:
            pidx = jax.process_index()
            if all(d.process_index == pidx for d in m.devices.flat):
                return m
        if jax.process_count() > 1:
            if self._local_giant_mesh is None:
                loc = jax.local_devices()
                self._local_giant_mesh = (
                    mesh_lib.data_mesh(loc) if len(loc) > 1 else False)
            return self._local_giant_mesh or None
        return None

    def _giant_is_crosshost(self) -> bool:
        gm = self._giant_mesh()
        return (gm is not None
                and any(d.process_index != jax.process_index()
                        for d in gm.devices.flat))

    def _fetch_giant(self, c) -> np.ndarray:
        """Giant device array -> host numpy; DCN allgather when the giant
        mesh spans processes (np.asarray cannot read non-addressable
        shards), plain fetch otherwise."""
        if self._giant_is_crosshost():
            from wavelet_tpu.runtime import distributed

            return distributed.gather_giant(c)
        return np.asarray(c)

    # transfer=auto breakevens, one per link direction.  At ~1% kept the
    # sparse stream is ~2% of the dense bytes (8 B pairs vs 4 B dense), so
    # per input byte dense costs 1/B link seconds vs sparse
    # 1/device_stage + 0.02/B — sparse wins iff B < ~0.98 * device_stage:
    # - compress fetches coefficients d2h behind the compact stage
    #   (measured 23.6 GB/s sort-free rank-select at the production K=12,
    #   kernel_probe15; the round-3 argsort bound this at 3.8) ->
    #   breakeven ~23 GB/s, i.e. sparse wins on every PCIe-class host
    #   link, not just tunnels;
    # - decompress ships pairs h2d in front of the scatter rebuild
    #   (measured 30.8 GB/s, bench sparse_scatter_stage) -> ~30 GB/s.
    # These are v5e-measured stage rates; on other TPU generations they
    # differ, so both are env-overridable:
    # WAVELET_TPU_SPARSE_BELOW_{D2H,H2D}=GB/s.
    _AUTO_SPARSE_BELOW_GBPS = {
        "d2h": float(os.environ.get("WAVELET_TPU_SPARSE_BELOW_D2H", 23.0)),
        "h2d": float(os.environ.get("WAVELET_TPU_SPARSE_BELOW_H2D", 30.0)),
    }
    # links drift (this rig's tunnel measures 2-3x swings within one
    # session — BASELINE.md e2e table), so the probe re-runs on a cadence
    # instead of pinning the process to its startup measurement
    _LINK_REPROBE_S = float(os.environ.get("WAVELET_TPU_LINK_REPROBE_S",
                                           300.0))
    _measured_link_gbps: dict | None = None    # per-process, class-level
    _measured_link_at: float = 0.0

    @classmethod
    def _measure_link(cls) -> dict:
        """One link measurement, both directions: a warm-up transfer first
        (the first transfer of a process pays runtime init), then the
        median of 3 reps with FRESH random content each time — repeated
        identical transfers can be served from a cache on tunneled rigs
        (the repo-wide benchmarking rule).  The buffer GROWS until one
        transfer costs >= ~10x the measured per-dispatch latency, so fast
        co-located links are not under-measured by fixed-size probes
        (round-3 advisor finding: 8 MiB at 30 GB/s is ~0.27 ms — the same
        order as dispatch overhead)."""
        import time

        rng = np.random.default_rng()        # OS entropy, never reused
        warm = jax.device_put(rng.standard_normal(1024).astype(np.float32))
        _ = np.asarray(warm)                 # init both directions
        t0 = time.perf_counter()
        tiny = jax.device_put(rng.standard_normal(16).astype(np.float32))
        _ = np.asarray(tiny)
        dispatch_s = max(time.perf_counter() - t0, 1e-7)
        nbytes = 8 << 20
        while True:
            buf = rng.standard_normal(nbytes // 4).astype(np.float32)
            t0 = time.perf_counter()
            dev = jax.device_put(buf)
            dev.block_until_ready()
            h2d_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = np.asarray(dev)
            d2h_s = time.perf_counter() - t0
            # dispatch_s timed a ROUND TRIP (device_put + fetch = two
            # dispatches), so 5x of it is the ~10x one-way dispatch
            # margin the docstring promises
            if min(h2d_s, d2h_s) >= 5 * dispatch_s or nbytes >= 128 << 20:
                break
            nbytes *= 4
        d2h, h2d = [nbytes / 1e9 / max(d2h_s, 1e-9)], \
                   [nbytes / 1e9 / max(h2d_s, 1e-9)]
        for _rep in range(2):
            buf = rng.standard_normal(nbytes // 4).astype(np.float32)
            t0 = time.perf_counter()
            dev = jax.device_put(buf)
            dev.block_until_ready()
            h2d.append(nbytes / 1e9 / max(time.perf_counter() - t0, 1e-9))
            t0 = time.perf_counter()
            _ = np.asarray(dev)
            d2h.append(nbytes / 1e9 / max(time.perf_counter() - t0, 1e-9))
        return {"d2h": float(np.median(d2h)), "h2d": float(np.median(h2d)),
                "probe_bytes": nbytes}

    @classmethod
    def _link_gbps(cls) -> dict:
        """Cached link rates.  The FIRST measurement runs inline (pipelines
        decide transport before any device transfer is in flight); stale
        values are refreshed only via :meth:`reprobe_link_if_stale`, which
        the pipelines call at timestep boundaries — a probe that runs
        concurrently with the pipeline's own transfers (e.g. from the
        prefetch worker mid-run) would measure residual bandwidth and
        could flip the transport spuriously (round-4 review finding)."""
        import time

        if cls._measured_link_gbps is None:
            cls._measured_link_gbps = cls._measure_link()
            cls._measured_link_at = time.monotonic()
            cur = cls._measured_link_gbps
            log.info("transfer=auto: measured link d2h %.3f / h2d %.3f "
                     "GB/s (probe %d MiB)", cur["d2h"], cur["h2d"],
                     cur["probe_bytes"] >> 20)
        return cls._measured_link_gbps

    @classmethod
    def reprobe_link_if_stale(cls) -> None:
        """Re-run the link probe when the cached measurement is older than
        _LINK_REPROBE_S (0 disables re-probing).  Call ONLY when the
        device link is quiescent — the streaming pipelines call it at
        timestep boundaries on the main thread, where the previous step's
        device work has drained and the prefetch worker touches only the
        disk.  A re-probe that flips any transport decision is logged —
        the previous value was stale."""
        import time

        # _measured_link_at == 0 with a value present means the value was
        # injected (tests / explicit pinning): never re-probe over it
        if (cls._measured_link_gbps is None or cls._LINK_REPROBE_S <= 0
                or cls._measured_link_at <= 0):
            return
        if (time.monotonic() - cls._measured_link_at
                <= cls._LINK_REPROBE_S):
            return
        prev = cls._measured_link_gbps
        cls._measured_link_gbps = cls._measure_link()
        cls._measured_link_at = time.monotonic()
        cur = cls._measured_link_gbps
        log.info("transfer=auto: re-measured link d2h %.3f / h2d %.3f "
                 "GB/s (probe %d MiB)", cur["d2h"], cur["h2d"],
                 cur["probe_bytes"] >> 20)
        for d in ("d2h", "h2d"):
            b = cls._AUTO_SPARSE_BELOW_GBPS[d]
            if (prev[d] < b) != (cur[d] < b):
                log.info(
                    "transfer=auto: %s link drifted %.3f -> %.3f "
                    "GB/s across the %.0f s re-probe cadence — "
                    "transport decision flips to %s", d, prev[d],
                    cur[d], cls._LINK_REPROBE_S,
                    "sparse" if cur[d] < b else "dense")

    def transfer_mode(self, dims, transfer: str,
                      direction: str = "d2h") -> str:
        """Effective transport for this shape — the ONE place transport is
        decided: ``auto`` picks sparse exactly when the measured link (in
        the direction this pipeline uses: ``d2h`` for compress, ``h2d``
        for decompress) is slower than that direction's device-stage
        breakeven, and giant boxes always take dense (they shard WITHIN
        the box; the sharded transform fetches their coefficients whole,
        so pairs cannot save anything)."""
        if transfer == "auto":
            bw = self._link_gbps()[direction]
            transfer = ("sparse"
                        if bw < self._AUTO_SPARSE_BELOW_GBPS[direction]
                        else "dense")
        if transfer == "sparse" and self.giant_ok(dims):
            return "dense"
        return transfer

    def pad_multiple_for(self, dims) -> int:
        """Batch-axis padding quantum for this shape (feeds plan_batches):
        mesh-data-parallel shapes pad to the device count so the leading
        axis shards evenly; giant shapes shard WITHIN the box, so their
        batches must not be padded with phantom giant boxes."""
        if self.mesh is None:
            return 1
        return 1 if self.giant_ok(dims) else self.mesh.size

    def _giant(self, kind: str, eff: int):
        """Cached sharded-box jits: 'fwd' / 'inv' (zero-collective
        interleaved transforms over the mesh) and 'maxmin' (sharded
        extrema; XLA inserts the ICI all-reduce)."""
        key = (kind, eff)
        fn = self._giant_fns.get(key)
        if fn is None:
            from wavelet_tpu.runtime import distributed

            gm = self._giant_mesh()
            if kind == "fwd":
                fn = distributed.make_sharded_box_forward_interleaved(
                    gm, eff)
            elif kind == "inv":
                fn = distributed.make_sharded_box_inverse_interleaved(
                    gm, eff)
            else:
                fn = jax.jit(lambda c: (jnp.max(c), jnp.min(c)))
            self._giant_fns[key] = fn
        return fn

    def _put_giant(self, arr: np.ndarray):
        """One giant box [X, Y, Z] onto the mesh, X sharded.

        Cross-host giant mesh: every process holds the full box (the
        pipelines make giant items collective under ``giantmesh=global``)
        and contributes only its X-slab — the slab bounds come from the
        sharding's own index map, so device order never has to be
        assumed."""
        from jax.sharding import NamedSharding, PartitionSpec

        gm = self._giant_mesh()
        sh = NamedSharding(gm, PartitionSpec(mesh_lib.DATA_AXIS))
        if self._giant_is_crosshost():
            from wavelet_tpu.runtime import distributed

            pidx = jax.process_index()
            spans = [idx[0] for d, idx in
                     sh.devices_indices_map(arr.shape).items()
                     if d.process_index == pidx]
            lo = min(s.start or 0 for s in spans)
            hi = max(s.stop if s.stop is not None else arr.shape[0]
                     for s in spans)
            slab = np.ascontiguousarray(arr[lo:hi])
            return distributed.giant_from_process_slabs(gm, slab,
                                                        arr.shape)
        return jax.device_put(arr, sh)

    # one box must fit VMEM alongside the double-buffered pipeline — the
    # bound for the HALVES kernels, which stream whole boxes per grid step
    _PALLAS_MAX_BLOCK_BYTES = 4 << 20
    # the interleaved stencils stream 2**scales-row blocks instead, so
    # their bound is per BLOCK, independent of box size: probe7 measured
    # >= 4 MiB stencil blocks fail Mosaic scoped-vmem (intermediates are
    # ~4-6x block bytes vs 16 MiB VMEM); 2 MiB compiles and runs at the
    # ~325 GB/s in-place ceiling (bench_results/kernel_probe7.json)
    _MAX_STENCIL_BLOCK_BYTES = 2 << 20

    def _put(self, x):
        return mesh_lib.shard_batch(x, self.mesh)

    def _kernel(self, kind: str, pack: int, sc: int | None = None):
        """Pallas kernel entry, wrapped in shard_map when a mesh is set
        (the leading batch axis shards over the ``data`` axis; per-box
        extrema come back sharded in item order)."""
        if sc is None:
            sc = self.scales
        key = (kind, pack, sc)
        fn = self._sharded_kernels.get(key)
        if fn is not None:
            return fn
        base = {
            "fwd_interleaved":
                lambda v: haar_pallas.fused_forward_interleaved(v, pack, sc),
            "fwd_interleaved_nored":
                lambda v: haar_pallas.fused_forward_interleaved_nored(
                    v, pack, sc),
            "inv_interleaved":
                lambda v: haar_pallas.fused_inverse_interleaved(v, pack, sc),
            "fwd_packed":
                lambda v: haar_pallas.fused_forward_packed(v, pack),
            "inv_packed":
                lambda v: haar_pallas.fused_inverse_packed(v, pack),
            "fwd_plain": haar_pallas.fused_forward,
            "inv_plain": haar_pallas.fused_inverse,
        }[kind]
        if self.mesh is None or self.mesh.size == 1:
            fn = base
        else:
            from jax.sharding import PartitionSpec as P

            try:
                from jax import shard_map
            except ImportError:  # pragma: no cover
                from jax.experimental.shard_map import shard_map
            spec = P(mesh_lib.DATA_AXIS)
            n_out = 3 if (kind.startswith("fwd")
                          and not kind.endswith("nored")) else 1
            # check_vma=False: pallas_call's out_shape carries no varying-
            # mesh-axes annotation; the per-device program is trivially
            # batch-parallel (no collectives inside)
            # donate_argnums: the inner kernels alias output onto input
            # (haar_pallas.py header); without donating the OUTER jit's
            # argument XLA must preserve the caller's buffer and the
            # in-place rate is lost on the mesh path
            sharded = jax.jit(shard_map(
                base, mesh=self.mesh, in_specs=(spec,),
                out_specs=(spec, spec, spec) if n_out == 3 else spec,
                check_vma=False), donate_argnums=(0,))
            D = self.mesh.size

            def fn(v, _sharded=sharded, _base=base, _D=D):
                # public batch APIs accept any leading size; shard_map
                # needs divisibility — indivisible batches run unsharded
                if v.shape[0] % _D:
                    return _base(v)
                return _sharded(v)
        self._sharded_kernels[key] = fn
        return fn

    def _pallas_ok(self, dims) -> bool:
        """Whether the single-scale halves kernels may run for this shape
        (whole-box VMEM bound — those kernels stream one box per step)."""
        return (self.use_pallas
                and int(np.prod(dims)) * 4 <= self._PALLAS_MAX_BLOCK_BYTES)

    def _halves_ok(self, dims) -> bool:
        return self.scales == 1 and self._pallas_ok(dims)

    def _interleaved_block_ok(self, dims) -> bool:
        """Whether the interleaved stencil kernels may run for this shape.

        They block over X rows (haar_pallas._x_block picks xb within a
        1 MiB target), so the box itself can be ANY size — a 128^3 or
        256^3 AMR box streams through just like a 64^3 one (the reference
        has no box-size ceiling either, compressor.cpp:85-185).  The only
        hard requirement is that the MINIMUM legal block — 2**scales rows
        at the packed lane width — fits the stencil VMEM budget; past
        that (e.g. a 1024^3 monolith at 4 MiB/row) the jnp or sharded
        giant-box path takes over."""
        x, y, z = (int(d) for d in dims)
        eff = self.eff_scales(dims)
        pack = haar_pallas.interleaved_pack_factor(dims, scales=eff)
        q = 1 << eff
        return q * y * (pack * z) * 4 <= self._MAX_STENCIL_BLOCK_BYTES

    def forward_signed_batch(self, data: np.ndarray):
        """-> (coeffs f32 [N, XYZ], signed absmax f32 [N]): the transform
        and the keep-independent half of the threshold rule — a keep sweep
        (estimate mode) runs this once and derives each keep's exact
        thresholds from ``signed`` for free."""
        dev = self._put(jnp.asarray(data))
        eff = self.eff_scales(data.shape[1:])
        if self._halves_ok(data.shape[1:]):
            coeffs, maxv, minv = self._kernel("fwd_plain", 1)(dev)
            flat = coeffs.reshape(coeffs.shape[0], -1)
            signed = resolve_signed_absmax(np.asarray(maxv), np.asarray(minv),
                                           flat_dev=flat)
        elif eff > 1:
            c = _fwd_multi_jit(dev, eff)
            flat = c.reshape(c.shape[0], -1)
            signed = np.asarray(threshold.signed_absmax(flat, axis=-1))
        else:
            flat, signed_dev = _compress_step(dev)
            signed = np.asarray(signed_dev)
        return np.asarray(flat), signed

    def compress_batch_raw(self, data: np.ndarray, keep: float):
        """-> (coeffs f32 [N, XYZ], t32 f32 [N]): transform + exact per-item
        thresholds; masking is left to the consumer (the host packer applies
        ``|c| > t32`` during RLE, so no mask array crosses the wire)."""
        flat, signed = self.forward_signed_batch(data)
        return flat, threshold.exact_threshold32(signed, keep)

    def compress_batch(self, data: np.ndarray, keep: float):
        """-> (coeffs f32 [N, XYZ], mask bool [N, XYZ]) as NumPy arrays."""
        flat, t32 = self.compress_batch_raw(data, keep)
        return flat, np.abs(flat) > t32[:, None]

    def pack_factor(self, dims) -> int:
        """Lane-pack factor the engine wants for boxes of this shape (feeds
        batching.plan_batches): >1 only on the fused-Pallas paths."""
        if self.giant_ok(dims):
            return 1   # giant boxes shard within the box, one per row
        if self.coeff_layout(dims) == "interleaved":
            return haar_pallas.interleaved_pack_factor(
                dims, scales=self.eff_scales(dims))
        if self._halves_ok(dims):
            return haar_pallas.lane_pack_factor(dims)
        return 1

    def _compress_giant(self, batch: ShapeBatch, keep: float):
        """Giant-box compress: each item is one box X-sharded over the
        mesh, transformed with the zero-collective interleaved pyramid
        (distributed.make_sharded_box_forward_interleaved).  Coefficients,
        layout, tie resolution and thresholds are identical to the
        single-device interleaved path, so archive bytes match an
        unsharded run bit for bit (tests/test_giant_box.py)."""
        eff = self.eff_scales(batch.shape)
        fwd = self._giant("fwd", eff)
        maxmin = self._giant("maxmin", eff)
        n = batch.data.shape[0]
        log.info("Giant box path: %d box(es) of %s sharding X over %d "
                 "devices (zero collectives)", n, batch.shape,
                 self._giant_mesh().size)
        coeffs = np.empty_like(batch.data)
        maxs = np.empty(n, np.float32)
        mins = np.empty(n, np.float32)
        for i in range(n):
            c = fwd(self._put_giant(batch.data[i]))
            mx, mn = maxmin(c)
            coeffs[i] = self._fetch_giant(c)
            maxs[i], mins[i] = np.asarray(mx), np.asarray(mn)
        cb = dataclasses.replace(batch, data=coeffs, pack=1,
                                 layout="interleaved", scales=eff)
        signed = resolve_signed_absmax(
            maxs, mins, row_getter=lambda i: cb.item_view(i).reshape(-1))
        return cb, threshold.exact_threshold32(signed, keep)

    def _decompress_giant(self, coeff_batch: ShapeBatch) -> ShapeBatch:
        """Inverse of :meth:`_compress_giant`: per item, interleaved
        coefficients X-sharded onto the mesh, zero-collective inverse."""
        eff = self.eff_scales(coeff_batch.shape)
        inv = self._giant("inv", eff)
        out = np.empty_like(coeff_batch.data)
        for i in range(coeff_batch.data.shape[0]):
            out[i] = self._fetch_giant(
                inv(self._put_giant(coeff_batch.data[i])))
        return dataclasses.replace(coeff_batch, data=out, layout="halves")

    def compress_shapebatch(self, batch: ShapeBatch, keep: float):
        """-> (coeff ShapeBatch — same geometry, data = coefficients,
        and t32 f32 per item incl. padding slots)."""
        if self.giant_ok(batch.shape):
            return self._compress_giant(batch, keep)
        dev = self._put(jnp.asarray(batch.data))
        eff = self.eff_scales(batch.shape)
        use_interleaved = self.coeff_layout(batch.shape) == "interleaved"
        if use_interleaved:
            c, maxv, minv = self._kernel("fwd_interleaved", batch.pack,
                                         eff)(dev)
            coeffs = np.asarray(c)
            cb = dataclasses.replace(batch, data=coeffs,
                                     layout="interleaved", scales=eff)
            signed = resolve_signed_absmax(
                np.asarray(maxv), np.asarray(minv),
                row_getter=lambda i: cb.item_view(i).reshape(-1))
        elif batch.pack > 1:
            c, maxv, minv = self._kernel("fwd_packed", batch.pack)(dev)
            coeffs = np.asarray(c)
            cb = dataclasses.replace(batch, data=coeffs)
            signed = resolve_signed_absmax(
                np.asarray(maxv), np.asarray(minv),
                row_getter=lambda i: cb.item_view(i).reshape(-1))
        elif self._halves_ok(batch.shape):
            c, maxv, minv = self._kernel("fwd_plain", 1)(dev)
            coeffs = np.asarray(c)
            signed = resolve_signed_absmax(
                np.asarray(maxv), np.asarray(minv),
                flat_dev=c.reshape(c.shape[0], -1))
        elif eff > 1:
            c = _fwd_multi_jit(dev, eff)
            flat = c.reshape(c.shape[0], -1)
            signed = np.asarray(threshold.signed_absmax(flat, axis=-1))
            coeffs = np.asarray(c)
        else:
            flat, signed_dev = _compress_step(dev)
            coeffs = np.asarray(flat).reshape((-1,) + batch.shape)
            signed = np.asarray(signed_dev)
        t32 = threshold.exact_threshold32(signed, keep)
        if use_interleaved:
            return cb, t32
        return dataclasses.replace(batch, data=coeffs), t32

    _ILV_MAPS: dict = {}    # (dims, eff) -> (lmap, inv), process-wide
    # ~12 B/element per cached shape (a 128^3 pair is ~24 MiB): bound the
    # cache so a regridding dataset visiting many shapes cannot grow host
    # RSS without limit (the BufferArena retention class, one level up).
    # LRU eviction (touch-on-hit): recurring shapes survive when transient
    # regrid shapes churn the cache (round-4 advisor finding — FIFO
    # evicted the most-recurring shape first once >8 pairs cycled).
    # The lock makes the touch (a get→pop→reinsert read-modify-write) and
    # the eviction loop safe if two threads ever share the class-level
    # cache — the same implicit-single-caller hazard BufferArena was
    # locked against; map construction runs outside it (idempotent, so a
    # racing double-build costs one redundant compute, never corruption).
    _ILV_MAPS_MAX = 8
    _ILV_MAPS_LOCK = threading.Lock()

    @classmethod
    def _interleave_maps(cls, dims, eff):
        """(lmap, inv) for the per-item interleaved flat layout (pack=1
        strides): lmap[logical] = stored offset, inv[stored] = logical."""
        key = (tuple(dims), int(eff))
        with cls._ILV_MAPS_LOCK:
            hit = cls._ILV_MAPS.pop(key, None)
            if hit is not None:
                # touch-on-hit: reinsert so dict order = recency order
                cls._ILV_MAPS[key] = hit
                return hit
        x, y, z = dims
        lmap = np.asarray(haar_pallas.interleave_map_multi(
            dims, eff, y * z, z, 1), dtype=np.int64)
        inv = np.empty(lmap.size, np.int32)
        inv[lmap] = np.arange(lmap.size, dtype=np.int32)
        hit = (lmap, inv)
        with cls._ILV_MAPS_LOCK:
            while len(cls._ILV_MAPS) >= cls._ILV_MAPS_MAX:
                cls._ILV_MAPS.pop(next(iter(cls._ILV_MAPS)))
            cls._ILV_MAPS[key] = hit
        return hit

    def _compact_fast_call(self, flat, t32_dev, cap, dims, idx_map,
                           ilv1_dims, K, impl):
        """Invoke compact_fast, shard_map'd over the mesh when one is set.

        Like every Pallas entry (see ``_kernel``), the Mosaic custom call
        is a per-device program XLA cannot auto-partition — under a plain
        jit on a mesh-sharded batch GSPMD would replicate the whole
        coefficient array onto every chip (or reject the lowering), so
        the compact runs under shard_map with the batch axis sharded;
        rows are independent, so per-shard output equals the single-
        device result row for row.  Indivisible batches run unsharded,
        mirroring the kernel wrapper's fallback."""
        kwargs = dict(dims=dims, ilv1_dims=ilv1_dims, K=K, impl=impl,
                      assemble=impl)
        if self.mesh is None or self.mesh.size == 1 \
                or flat.shape[0] % self.mesh.size:
            return compact_pallas.compact_fast(flat, t32_dev, cap,
                                               idx_map=idx_map, **kwargs)
        key = (cap, dims, ilv1_dims, K, impl, idx_map is not None)
        fn = self._sharded_compacts.get(key)
        if fn is None:
            from jax.sharding import PartitionSpec as P

            try:
                from jax import shard_map
            except ImportError:  # pragma: no cover
                from jax.experimental.shard_map import shard_map
            spec = P(mesh_lib.DATA_AXIS)
            if idx_map is None:
                fn = jax.jit(shard_map(
                    lambda f, t: compact_pallas.compact_fast(
                        f, t, cap, idx_map=None, **kwargs),
                    mesh=self.mesh, in_specs=(spec, spec),
                    out_specs=(spec,) * 4, check_vma=False))
            else:
                # the inverse interleave table is replicated (every shard
                # translates its own kept indices through the same map)
                fn = jax.jit(shard_map(
                    lambda f, t, im: compact_pallas.compact_fast(
                        f, t, cap, idx_map=im, **kwargs),
                    mesh=self.mesh, in_specs=(spec, spec, P()),
                    out_specs=(spec,) * 4, check_vma=False))
            self._sharded_compacts[key] = fn
        if idx_map is None:
            return fn(flat, t32_dev)
        return fn(flat, t32_dev, idx_map)

    def _compact(self, flat, t32_dev, cap: int, dims=None, idx_map=None,
                 ilv1_dims=None, regather=None):
        """On-device sparsification with the sort-free fast path.

        ``compact_fast`` (kernels/compact_pallas.py) rank-selects per
        strided chunk — measured several times the round-3 chunked argsort
        (bench_results/kernel_probe11.json) — and flags rows whose
        per-chunk kept count exceeds its capacity.  Flagged batches
        (adversarially periodic data only: stride-C sampling spreads any
        natural cluster one-per-chunk) re-run through the argsort path, so
        the output is bit-identical to ``_compact_step`` on every row a
        consumer reads.  ``WAVELET_TPU_COMPACT=argsort`` forces the
        round-3 path.
        """
        m = flat.shape[1]
        mode = os.environ.get("WAVELET_TPU_COMPACT", "fast")
        # fast_ok also rejects caps past the f32-exact integer range
        # (2**24): the fast path's chunk attribution compares f32 copies
        # of integer offsets, so a giant low-threshold row would silently
        # emit wrong pairs — those batches take the integer argsort path
        if mode != "argsort" and compact_pallas.fast_ok(m, cap=cap):
            impl = "pallas" if haar_pallas.supported() else "jnp"
            # per-chunk capacity K scales with the expected kept fraction
            # (the adaptive cap reflects it): select cost is ~linear in K
            # (22.6 / 16.8 / 8.8 GB/s at K=16/32/64, kernel_probe11), and
            # realistic 1%-keep rows peak near 10 kept per skewed chunk —
            # an undersized K only costs an argsort re-run, never bytes.
            # Probe 15 (round 5): K=12 beats 16 by ~11% (23.6 vs 21.3
            # GB/s) with zero overflow on the adversarial shock fields
            # (observed per-chunk max 10); SHORTER chunks lose outright
            # (c=256: 18, c=128: 9.7 — the [c, c] triangular matmul and
            # sublane blocks underfill the MXU/VPU), so K is the only
            # knob and c stays 512.
            capf = cap / m
            K = 12 if capf <= 0.015 else (32 if capf <= 0.05 else 64)
            counts, idxs, vals, over = self._compact_fast_call(
                flat, t32_dev, cap, tuple(dims) if dims else None,
                idx_map, ilv1_dims, K, impl)
            if not bool(np.asarray(jnp.any(over))):
                return counts, idxs, vals
            log.info("compact fast path: per-chunk overflow (K=%d) — "
                     "argsort fallback for this batch", K)
        # the argsort fallback needs the LOGICAL layout: callers that
        # compacted a permuted layout supply `regather` for this rare path
        if regather is not None:
            flat = regather()
        return _compact_step(flat, t32_dev, cap)

    def compress_shapebatch_sparse(self, batch: ShapeBatch, keep: float,
                                   cap_fraction: float | None = None):
        """Sparse-transfer compression: the transform AND sparsification run
        on device; only (counts, kept indices, kept values) come back.

        -> (SparseCoeffs, t32).  Capacity = ``cap_fraction`` of the
        coefficient count; rare overflowing items fall back to a dense
        single-row fetch (handled by :class:`SparseCoeffs.item_pairs`).
        The pair buffers are trimmed on device to the observed max kept
        count before fetching, and a batch with WIDESPREAD overflow ships
        the dense array alone (pairs would only add traffic) — sparse
        transport never fetches more than dense plus the counts.

        When ``cap_fraction`` is None it ADAPTS: the first batch of a
        shape uses 25%, later batches size the buffer to 1.5x the largest
        kept fraction observed so far (real AMR data keeps a few percent,
        so the transfer shrinks toward ~8x below the dense fetch; an
        undersized cap only costs overflow fallbacks, never correctness).

        ``scales > 1`` is supported: the pyramid transform runs on device
        (interleaved kernel or the jnp multi path) and the coefficients are
        regathered to logical order on device before sparsification — the
        kept (index, value) pairs are layout-independent either way.
        """
        if self.giant_ok(batch.shape):
            # self-enforcing invariant (round-5 review): transfer_mode
            # forces giant shapes dense, and coeff_layout's "interleaved"
            # answer for them means the SHARDED giant transform — routing
            # one through the per-device kernels below would run a whole
            # giant box unsharded on one chip (the HBM blow-up the giant
            # path exists to avoid), silently
            raise ValueError(
                f"sparse transfer does not take giant shapes {batch.shape}"
                " — transfer_mode routes them dense (sharded giant path)")
        adaptive = cap_fraction is None
        if adaptive:
            cap_fraction = self._sparse_cap_hint.get(batch.shape, 0.25)
        dims = batch.shape
        eff = self.eff_scales(dims)
        m = int(np.prod(dims))
        dev = self._put(jnp.asarray(batch.data))
        idx_map = None
        ilv1 = None
        lmap = None
        regather = None
        if self.coeff_layout(dims) == "interleaved":
            c, maxv, minv = self._kernel("fwd_interleaved", batch.pack,
                                         eff)(dev)
            # compact the INTERLEAVED layout directly and translate only
            # the kept pairs to logical order — the full-array regather
            # alone runs at 12.9 GB/s and would halve the 16.8-22.6 GB/s
            # compact stage (bench_results/kernel_probe12.json); scales=1
            # translates arithmetically, deeper pyramids via the table
            flat = _unpack_packed_coeffs(c, batch.pack, dims[-1])
            lmap, inv = self._interleave_maps(dims, eff)
            if eff == 1:
                ilv1 = tuple(int(v) for v in dims)
            else:
                idx_map = self._put(jnp.asarray(inv))

            def regather():
                return (_unpack_interleaved_coeffs_multi(
                            c, batch.pack, dims, eff) if eff > 1
                        else _unpack_interleaved_coeffs(c, batch.pack,
                                                        dims))

            # tie resolution reads rows in LOGICAL order (first-occurrence
            # rule, compressor.cpp:212-215); rare, so regather per row
            signed = resolve_signed_absmax(
                np.asarray(maxv), np.asarray(minv),
                row_getter=lambda i: np.asarray(flat[i])[lmap])
        elif batch.pack > 1:
            c, maxv, minv = self._kernel("fwd_packed", batch.pack)(dev)
            flat = _unpack_packed_coeffs(c, batch.pack, dims[-1])
            signed = resolve_signed_absmax(np.asarray(maxv), np.asarray(minv),
                                           flat_dev=flat)
        elif self._halves_ok(dims):
            c, maxv, minv = self._kernel("fwd_plain", 1)(dev)
            flat = c.reshape(c.shape[0], -1)
            signed = resolve_signed_absmax(np.asarray(maxv), np.asarray(minv),
                                           flat_dev=flat)
        elif eff > 1:
            c = _fwd_multi_jit(dev, eff)
            flat = c.reshape(c.shape[0], -1)
            signed = np.asarray(threshold.signed_absmax(flat, axis=-1))
        else:
            flat, signed_dev = _compress_step(dev)
            signed = np.asarray(signed_dev)
        t32 = threshold.exact_threshold32(signed, keep)
        # cap rounded UP to a lane multiple (VPU-friendly gather width)
        cap = int(min(m, max(128, -(-int(m * cap_fraction) // 128) * 128)))
        counts, idxs, vals = self._compact(flat, self._put(jnp.asarray(t32)),
                                           cap, dims, idx_map=idx_map,
                                           ilv1_dims=ilv1,
                                           regather=regather)
        counts = np.asarray(counts)
        if adaptive and batch.n_valid:
            observed = float(counts[: batch.n_valid].max()) / m
            self._sparse_cap_hint[batch.shape] = float(
                min(0.25, max(observed * 1.5, 64 / m)))
        # the counts (tiny) land first, so the transport can adapt BEFORE
        # the expensive device->host fetch.  Trim the pair buffers to the
        # observed max NON-overflowing count (overflowers never have their
        # pair rows read — item_pairs serves them from the dense fallback,
        # so one spiky box must not pin the whole batch at the cold cap);
        # power-of-2 trim widths keep the slice-op specializations bounded.
        n = batch.n_valid
        live = counts[:n][counts[:n] <= cap] if n else counts[:0]
        n_over = n - len(live)
        needed = int(live.max()) if len(live) else 0
        trim = int(min(cap, max(128, 1 << (max(needed, 1) - 1).bit_length())))
        # ship the dense array ALONE whenever pairs + the fallback fetches
        # item_pairs would actually perform (bulk flat fetch when overflow
        # is widespread — its latency heuristic — else per-item rows)
        # would cost at least as much (widespread overflow — e.g. the
        # reference's negative-absmax keep-everything quirk on zero-mean
        # fields — or even a single overflower in a tiny bucket): the
        # never-more-than-dense transport invariant
        dense_bytes = int(np.prod(flat.shape)) * 4
        fallback_bytes = (dense_bytes if n_over > max(2, n // 10)
                          else n_over * m * 4)
        pair_bytes = len(counts) * trim * 8 + fallback_bytes
        if n and n_over and pair_bytes >= dense_bytes:
            empty = np.zeros((len(counts), 0))
            return SparseCoeffs(shape=dims, items=batch.items,
                                counts=counts,
                                idxs=empty.astype(np.int32),
                                vals=empty.astype(np.float32),
                                cap=0, _flat_dev=flat,
                                _flat_np=np.asarray(flat),
                                _lmap=lmap), t32
        if trim < cap:
            idxs, vals = idxs[:, :trim], vals[:, :trim]
            cap = trim
        return SparseCoeffs(shape=dims, items=batch.items,
                            counts=counts,
                            idxs=np.asarray(idxs), vals=np.asarray(vals),
                            cap=cap, _flat_dev=flat, _lmap=lmap), t32

    def forward_hist_shapebatch(self, batch: ShapeBatch, hist_items=None,
                                fetch_coeffs: bool = True):
        """Global-threshold pass: -> (coeff ShapeBatch, histogram int64).

        ``hist_items`` (giantmesh=global only): indices whose histogram
        contribution to COUNT — cross-host giant batches are computed by
        every process, so only the owner may count each box or the
        all-reduced quantile would see giant coefficients process_count
        times.  The transform itself always runs for every item (it is
        the collective).

        ``fetch_coeffs=False`` returns ``(None, hist)`` without moving
        the coefficients device->host — the histogram-only pass 1 for
        timesteps the globalcache will NOT retain skips a full d2h pass
        (round-4 global mode paid that fetch and discarded the result)."""
        if self.giant_ok(batch.shape):
            eff = self.eff_scales(batch.shape)
            fwd = self._giant("fwd", eff)
            # phase-neutral wording: this runs in the pass-1 histogram
            # stream AND in pass-2 re-reads of uncached timesteps (where
            # the histogram output is discarded)
            log.info("Giant box path (global threshold): %d box(es) of %s "
                     "sharding X over %d devices", batch.data.shape[0],
                     batch.shape, self._giant_mesh().size)
            coeffs = np.empty_like(batch.data) if fetch_coeffs else None
            hist = np.zeros(threshold.EXP_HIST_BINS, np.int64)
            # abs_exponent_histogram accumulates uint32 on device, exact
            # only below 2^32 elements per call — and giant boxes are
            # exactly where that can be exceeded (a 16 GiB f32 box is
            # 4.3e9 coefficients; a smooth field concentrates most of
            # them in a few bins, which would WRAP silently and derive a
            # wrong global threshold).  Segment along X so each call
            # counts < 2^31 elements; the int64 accumulation happens
            # here on host.  Segment boundaries derive from the global
            # shape, so every process launches the identical collective
            # sequence.
            x, yz = int(batch.shape[0]), int(np.prod(batch.shape[1:]))
            seg = x if x * yz < (1 << 31) else max(1, (1 << 31) // yz)
            for i in range(batch.data.shape[0]):
                c = fwd(self._put_giant(batch.data[i]))
                # the histogram over global-mesh-sharded coefficients is
                # itself a collective (the reduction crosses processes),
                # so EVERY process must launch it — ownership only gates
                # whether the result is COUNTED.  Gating the launch would
                # desynchronize the SPMD program across processes (the
                # non-owner would proceed to a different collective) and
                # deadlock the run.
                h = np.zeros(threshold.EXP_HIST_BINS, np.int64)
                for lo in range(0, x, seg):
                    h += np.asarray(
                        _fwd_hist_only(c[lo:lo + seg][None]),
                        dtype=np.int64)
                if hist_items is None or i in hist_items:
                    hist += h
                if fetch_coeffs:
                    coeffs[i] = self._fetch_giant(c)
            if not fetch_coeffs:
                return None, hist
            return dataclasses.replace(batch, data=coeffs, pack=1,
                                       layout="interleaved", scales=eff), hist
        if self.coeff_layout(batch.shape) == "interleaved":
            dev = self._put(jnp.asarray(batch.data))
            # no per-box extrema needed for the histogram pass: the
            # reduction-free variant runs at the bare stencil rate
            c = self._kernel("fwd_interleaved_nored", batch.pack,
                             self.eff_scales(batch.shape))(dev)
            hist = np.asarray(_fwd_hist_only(c), dtype=np.int64)
            n_pad = (batch.data.size // int(np.prod(batch.shape))
                     ) - batch.n_valid
            hist[0] -= n_pad * int(np.prod(batch.shape))
            if not fetch_coeffs:
                return None, hist
            cb = dataclasses.replace(batch, data=np.asarray(c),
                                     layout="interleaved",
                                     scales=self.eff_scales(batch.shape))
            return cb, hist
        if batch.pack > 1:
            dev = self._put(jnp.asarray(batch.data))
            c, _maxv, _minv = self._kernel("fwd_packed", batch.pack)(dev)
            hist = np.asarray(_fwd_hist_only(c), dtype=np.int64)
            coeffs = np.asarray(c) if fetch_coeffs else None
        elif self.scales > 1:
            dev = self._put(jnp.asarray(batch.data))
            c = _fwd_multi_jit(dev, self.eff_scales(batch.shape))
            hist = np.asarray(_fwd_hist_only(c), dtype=np.int64)
            coeffs = np.asarray(c) if fetch_coeffs else None
        else:
            flat, hist = self.forward_hist_batch(
                batch.data.reshape((-1,) + batch.shape), n_pad_rows=0)
            coeffs = (np.asarray(flat).reshape((-1,) + batch.shape)
                      if fetch_coeffs else None)
            hist = np.asarray(hist, np.int64)
        # remove padding slots' zero coefficients from the zero bin
        n_pad = (batch.data.size // int(np.prod(batch.shape))) - batch.n_valid
        hist[0] -= n_pad * int(np.prod(batch.shape))
        if not fetch_coeffs:
            return None, hist
        return dataclasses.replace(batch, data=coeffs), hist

    def rmse_batch(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Per-item RMSE [N] computed on device (float32 fast path)."""
        return np.asarray(_rmse_step(self._put(jnp.asarray(a)),
                                     self._put(jnp.asarray(b))))

    def decompress_shapebatch(self, coeff_batch: ShapeBatch) -> ShapeBatch:
        """coefficients -> reconstructed boxes, same geometry (natural
        spatial layout regardless of the coefficient layout)."""
        if (self.giant_ok(coeff_batch.shape)
                and coeff_batch.layout == "interleaved"):
            return self._decompress_giant(coeff_batch)
        dev = self._put(jnp.asarray(coeff_batch.data))
        if coeff_batch.layout == "interleaved":
            out = self._kernel("inv_interleaved", coeff_batch.pack,
                               coeff_batch.scales)(dev)
            return dataclasses.replace(coeff_batch, data=np.asarray(out),
                                       layout="halves")
        if coeff_batch.pack > 1:
            out = self._kernel("inv_packed", coeff_batch.pack)(dev)
        elif self._halves_ok(coeff_batch.shape):
            out = self._kernel("inv_plain", 1)(dev)
        elif self.scales > 1:
            out = _inv_multi_jit(dev, self.eff_scales(coeff_batch.shape))
        else:
            n = dev.shape[0]
            out = _inverse_jit(dev.reshape(n, -1),
                               tuple(int(d) for d in coeff_batch.shape))
        return dataclasses.replace(coeff_batch, data=np.asarray(out))

    def preview_shapebatch(self, batch: ShapeBatch, depth: int):
        """Low-band (LLL) preview at 1/2**depth resolution per axis.

        Extension — the reference can only regenerate full resolution
        (decompressor.cpp inverts every band unconditionally).  ``batch``
        holds LOGICAL-order coefficient rows (layout "halves", pack=1,
        as :func:`HostPacker.unpack_into` fills them).  Returns
        ``(array [N, X>>depth, Y>>depth, Z>>depth], h2d_bytes)``.

        When ``depth <= eff_scales`` the preview is a pure corner slice of
        the stored pyramid plus the remaining inverse scales — only the
        corner (8**-depth of the coefficients) ever crosses the
        host->device link, and at ``depth == eff_scales`` no device work
        happens at all.  Deeper previews reconstruct fully and re-lowpass
        (``haar.haar3d_lowpass``) on device.
        """
        dims = tuple(int(d) for d in batch.shape)
        if any(d % (1 << depth) for d in dims):
            raise ValueError(
                f"preview={depth} requires box dims divisible by "
                f"{1 << depth}; got {dims}")
        s_box = self.eff_scales(dims)
        if depth > s_box and self.giant_ok(dims):
            # a deeper-than-stored preview reconstructs the FULL box on
            # one device before re-lowpassing — exactly what a giant box
            # cannot do; the corner path (depth <= scales) stays fine
            # since only 8**-depth of the coefficients reach the device
            raise ValueError(
                f"preview={depth} on a giant box {dims} would "
                f"reconstruct the whole box on one device; use preview "
                f"<= scales ({s_box}) for giant archives")
        cx, cy, cz = (d >> depth for d in dims)
        if depth <= s_box:
            corner = np.ascontiguousarray(batch.data[:, :cx, :cy, :cz])
            rem = s_box - depth
            if rem == 0:
                return corner, 0
            out = _inv_multi_jit(self._put(jnp.asarray(corner)), rem)
            return np.asarray(out), corner.nbytes
        dev = self._put(jnp.asarray(batch.data))
        h2d = batch.data.nbytes
        if s_box > 1:
            full = _inv_multi_jit(dev, s_box)
        else:
            full = _inverse_jit(dev.reshape(dev.shape[0], -1), dims)
        return np.asarray(_lowpass_jit(full, depth)), h2d

    def decompress_shapebatch_sparse(self, batch: ShapeBatch,
                                     idx: np.ndarray,
                                     vals: np.ndarray) -> ShapeBatch:
        """Sparse-transfer decompress: (logical position, value) pairs ->
        device scatter -> inverse transform.

        Only the kept pairs cross the host->device link (the mirror of the
        compress-side ``transfer=sparse`` path; kept fractions on real AMR
        data are a few percent, and host->device bandwidth is the binding
        resource on tunneled/shared-link rigs).  On the fused-kernel path
        the scatter targets the packed interleaved layout directly (host
        translates logical positions through the layout map), so the
        inverse runs the same Pallas kernel as the dense path — sparse
        transport costs nothing on the device side.  Elsewhere the scatter
        builds plain logical rows for the jnp inverse.  Either way the
        output is bit-identical to the dense path (same coefficients, same
        inverse arithmetic).
        """
        dims = tuple(int(d) for d in batch.shape)
        m = int(np.prod(dims))
        if self.giant_ok(dims):
            # mirror of the compress-side guard: transfer_mode routes
            # giant shapes dense; the per-device scatter/inverse below
            # would run a whole giant box unsharded on one chip
            raise ValueError(
                f"sparse transfer does not take giant shapes {dims} — "
                "transfer_mode routes them dense (sharded giant path)")
        if self.coeff_layout(dims) == "interleaved":
            out = self._decompress_sparse_interleaved(batch, idx, vals)
            if out is not None:
                return out
        pad = self.mesh.size if self.mesh is not None else 1
        n = idx.shape[0]
        n_pad = (-n) % pad
        if n_pad:
            cap = idx.shape[1]
            pad_row = (m + np.arange(cap, dtype=idx.dtype))[None]
            idx = np.concatenate([idx, np.repeat(pad_row, n_pad, axis=0)])
            vals = np.concatenate(
                [vals, np.zeros((n_pad, vals.shape[1]), vals.dtype)])
        rows = _scatter_rows(self._put(jnp.asarray(idx)),
                             self._put(jnp.asarray(vals)), m)
        eff = self.eff_scales(dims)
        if eff > 1:
            out = _inv_multi_jit(rows.reshape((-1,) + dims), eff)
        else:
            out = _inverse_jit(rows, dims)
        return ShapeBatch(shape=dims, data=np.asarray(out),
                          items=batch.items, n_valid=batch.n_valid)

    def _decompress_sparse_interleaved(self, batch: ShapeBatch,
                                       idx: np.ndarray,
                                       vals: np.ndarray) -> ShapeBatch:
        """Sparse-transfer decompress on the fused-kernel path: translate
        logical positions through the interleave map on the host (cheap —
        only kept pairs), scatter once into the zeroed packed array on
        device, and run the SAME Pallas inverse as the dense path.

        Returns None when flat positions would overflow int32 (caller
        falls back to the per-row scatter + jnp inverse)."""
        dims = tuple(int(d) for d in batch.shape)
        m = int(np.prod(dims))
        pad = self.mesh.size if self.mesh is not None else 1
        eff = self.eff_scales(dims)
        x, y, z = dims
        pack = batching.cap_pack(self.pack_factor(dims), len(batch.items), z)
        n_rows = batching.pad_to_multiple(len(batch.items),
                                          pack * pad) // pack
        packed_shape = (max(n_rows, 1), x, y, pack * z)
        total = int(np.prod(packed_shape))
        if total + idx.size >= 2**31 - 1:
            # flat int32 positions would wrap (decompress buckets are
            # unbounded, unlike compress's 1 GiB batch cap): use the
            # per-row scatter path, whose positions never exceed m + cap
            return None
        # geometry-only shell (no dead host allocation): _logical_map and
        # item_offsets never touch .data
        shell = ShapeBatch(shape=dims, data=None, items=batch.items,
                           n_valid=batch.n_valid, pack=pack,
                           layout="interleaved", scales=eff)
        lmap = np.asarray(shell._logical_map(), np.int64)
        offs = np.asarray(shell.item_offsets(), np.int64)
        n, cap = idx.shape
        kept = idx < m
        # padding slots -> distinct positions past the array (dropped by
        # the scatter, unique as its unique_indices contract requires);
        # the guard above keeps every position inside int32
        phys = np.where(
            kept,
            offs[:, None] + lmap[np.where(kept, idx, 0)],
            total + np.arange(n * cap, dtype=np.int64).reshape(n, cap))
        # pair arrays are NOT mesh-sharded (their row count is the item
        # count, not mesh-divisible); only the packed array the kernel
        # consumes gets the mesh layout
        flat = _scatter_flat(jnp.asarray(phys.astype(np.int32)),
                             jnp.asarray(vals), total)
        rows = self._put(flat.reshape(packed_shape))
        out = self._kernel("inv_interleaved", pack, eff)(rows)
        return ShapeBatch(shape=dims, data=np.asarray(out),
                          items=batch.items, n_valid=batch.n_valid,
                          pack=pack, layout="halves")

    def forward_hist_batch(self, data: np.ndarray, n_pad_rows: int = 0):
        """-> (flat [N, XYZ], magnitude histogram int64[EXP_HIST_BINS]).

        ``n_pad_rows`` all-zero padding rows are removed from the zero bin so
        the global quantile only counts real coefficients.
        """
        dev = self._put(jnp.asarray(data))
        eff = self.eff_scales(data.shape[1:])
        if eff > 1:
            c = _fwd_multi_jit(dev, eff)
            flat = c.reshape(c.shape[0], -1)
            hist = _fwd_hist_only(flat)
        else:
            flat, hist = _fwd_hist_step(dev)
        hist = np.asarray(hist, dtype=np.int64)
        hist[0] -= n_pad_rows * flat.shape[1]
        return np.asarray(flat), hist

    def decompress_batch(self, flat: np.ndarray, dims) -> np.ndarray:
        """flat f32 [N, X*Y*Z] -> boxes f32 [N, X, Y, Z]."""
        dims = tuple(int(d) for d in dims)
        dev = self._put(jnp.asarray(flat))
        if self._halves_ok(dims):
            blocks = dev.reshape((dev.shape[0],) + dims)
            return np.asarray(self._kernel("inv_plain", 1)(blocks))
        if self.scales > 1:
            c = dev.reshape((dev.shape[0],) + dims)
            return np.asarray(_inv_multi_jit(c, self.eff_scales(dims)))
        return np.asarray(_inverse_jit(dev, dims))


def _atomic_write(path: str, blob: bytes) -> None:
    """Temp-name + rename so a crash mid-write never leaves a truncated
    output that a resumed run (resume=1) would skip as complete."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


class HostPacker:
    """Parallel host-side pack/unpack + file I/O.

    Two backends with identical byte output:
    - native: the C++ library (native/wtc_codec.cpp) thresholds, RLE-packs,
      xz-encodes and writes every item on a worker pool — the framework's
      native replacement for the reference's serial per-file writes
      (compressor.cpp:250-291);
    - python: NumPy RLE + stdlib ``lzma`` (releases the GIL) on a thread
      pool, used when the shared library isn't available.

    Two archive layouts with identical member bytes:
    - ``files`` (reference-compatible): one ``.xz`` per (t, lev, comp, box);
    - ``bundle`` (extension, io/bundle.py): members appended to one
      container per (timestep, process) — removes the per-file open/write/
      rename cost that dominates once the codec runs at memory speed.
      Callers must :meth:`close_bundles` after the last pack (the pipelines
      do); unclosed bundles stay ``.tmp`` and are invisible to readers.
    """

    def __init__(self, workers: int | None = None,
                 use_native: bool | None = None, payload: str = "f32",
                 codec: str = "xz", xz_preset: int = 6,
                 archive_format: str = "files", xz_delta: int = 0):
        self.workers = workers or min(32, (os.cpu_count() or 4))
        if payload not in ("f32", "q16"):
            raise ValueError(f"unknown payload format {payload!r}")
        if codec not in ("xz", "raw"):
            raise ValueError(f"unknown payload codec {codec!r}")
        if archive_format not in ("files", "bundle"):
            raise ValueError(f"unknown archive format {archive_format!r}")
        self.payload = payload
        self.codec = codec
        # the preset word packs the optional delta-filter distance (high
        # byte); both encode backends unpack it — decode needs nothing
        # (the xz stream declares its filter chain)
        self.xz_preset = archive.pack_preset(xz_preset, xz_delta)
        self.archive_format = archive_format
        self._writers = {}          # (dir, t) -> BundleWriter
        self._bundle_sets = {}      # dir -> BundleSet (read side, lazy)
        if use_native is None:
            use_native = native.available()
        self.use_native = use_native and native.available()

    def _paths(self, dir_, items):
        return [os.path.join(dir_, archive.payload_filename(
            it.t, it.level, it.comp_idx, it.box)) for it in items]

    # ---- bundle plumbing ----

    def _writer(self, dir_: str, t: int) -> bundle.BundleWriter:
        key = (dir_, int(t))
        w = self._writers.get(key)
        if w is None:
            proc = jax.process_index()
            gen = 0
            while True:
                path = os.path.join(dir_, bundle.bundle_name(t, proc, gen))
                if not os.path.exists(path):
                    break
                # resume: finished bundles are immutable — append the
                # remaining items as a new generation
                gen += 1
            w = self._writers[key] = bundle.BundleWriter(path)
        return w

    def _append_members(self, dir_: str, items, blobs) -> int:
        """Append (item, blob) pairs in item order (deterministic bytes)."""
        total = 0
        for it, blob in zip(items, blobs):
            total += self._writer(dir_, it.t).add(
                it.t, it.level, it.comp_idx, it.box, blob)
        return total

    def close_bundles(self, t: int | None = None) -> int:
        """Finalize open bundles (index + trailer + atomic rename) — all of
        them, or only timestep ``t``'s (the streaming pipeline closes each
        timestep as it completes, so a crash costs one timestep, matching
        the per-file mode's resume granularity).  Returns total container
        bytes written."""
        total = 0
        for key in list(self._writers):
            if t is None or key[1] == int(t):
                total += self._writers.pop(key).close()
        return total

    def _bundle_set(self, dir_: str) -> bundle.BundleSet:
        bs = self._bundle_sets.get(dir_)
        if bs is None:
            bs = self._bundle_sets[dir_] = bundle.BundleSet(dir_)
        return bs

    @staticmethod
    def _geometry(batch: ShapeBatch):
        """(rows, row_len, row_stride) of one item inside batch.data."""
        x, y, z = batch.shape
        if batch.pack == 1:
            n = x * y * z
            return 1, n, n
        return x * y, z, batch.pack * z

    @staticmethod
    def _index_tables(batch: ShapeBatch):
        """Per-axis element-offset tables for the indexed native walk:
        logical (a, b, c) of an item lives at offsets[i] + ix[a] + iy[b]
        + iz[c] (covers the interleaved layout's per-axis permutation)."""
        from wavelet_tpu.kernels.haar_pallas import interleave_perm

        x, y, z = batch.shape
        L = batch.pack * z
        ix = interleave_perm(x) * (y * L)
        iy = interleave_perm(y) * L
        iz = interleave_perm(z)
        return ix, iy, iz

    def pack(self, out_dir: str, coeff_batch: ShapeBatch,
             t32: np.ndarray, subset=None) -> int:
        """Threshold+RLE+xz+write items of a coefficient ShapeBatch
        (padding slots ignored).  ``subset`` restricts to those item
        indices (global-mode resume: the histogram must cover every item,
        but already-written outputs are skipped here).  Returns total
        compressed bytes."""
        items = coeff_batch.items
        rows, row_len, row_stride = self._geometry(coeff_batch)
        sel = list(range(len(items))) if subset is None else list(subset)
        bundled = self.archive_format == "bundle"
        if self.use_native:
            if not sel:
                return 0
            offsets = coeff_batch.item_offsets()
            if coeff_batch.layout == "interleaved":
                if coeff_batch.scales > 1:
                    # multi-scale map is non-separable: full flat-map walk
                    if bundled:
                        blobs = native.encode_mapped(
                            coeff_batch.data, np.asarray(t32)[sel],
                            coeff_batch.shape, coeff_batch._logical_map(),
                            offsets[sel], self.workers,
                            payload=self.payload, codec=self.codec,
                            preset=self.xz_preset)
                        return self._append_members(
                            out_dir, [items[i] for i in sel], blobs)
                    return native.pack_mapped(
                        coeff_batch.data, np.asarray(t32)[sel],
                        coeff_batch.shape,
                        self._paths(out_dir, [items[i] for i in sel]),
                        coeff_batch._logical_map(), offsets[sel],
                        self.workers, payload=self.payload,
                        codec=self.codec, preset=self.xz_preset)
                ix, iy, iz = self._index_tables(coeff_batch)
                if bundled:
                    blobs = native.encode_indexed(
                        coeff_batch.data, np.asarray(t32)[sel],
                        coeff_batch.shape, ix, iy, iz, offsets[sel],
                        self.workers, payload=self.payload,
                        codec=self.codec, preset=self.xz_preset)
                    return self._append_members(
                        out_dir, [items[i] for i in sel], blobs)
                return native.pack_indexed(
                    coeff_batch.data, np.asarray(t32)[sel],
                    coeff_batch.shape,
                    self._paths(out_dir, [items[i] for i in sel]),
                    ix, iy, iz,
                    offsets[sel], self.workers, payload=self.payload,
                    codec=self.codec, preset=self.xz_preset)
            if bundled:
                blobs = native.encode_strided(
                    coeff_batch.data, np.asarray(t32)[sel],
                    coeff_batch.shape, rows, row_len, row_stride,
                    offsets[sel], self.workers, payload=self.payload,
                    codec=self.codec, preset=self.xz_preset)
                return self._append_members(
                    out_dir, [items[i] for i in sel], blobs)
            return native.pack_strided(
                coeff_batch.data, np.asarray(t32)[sel], coeff_batch.shape,
                self._paths(out_dir, [items[i] for i in sel]),
                rows, row_len, row_stride,
                offsets[sel], self.workers, payload=self.payload,
                codec=self.codec, preset=self.xz_preset)

        serialize = (archive.serialize_payload_q16 if self.payload == "q16"
                     else archive.serialize_payload)
        paths = None if bundled else self._paths(out_dir, items)

        def one(i):
            flat = np.ascontiguousarray(coeff_batch.item_view(i)).reshape(-1)
            mask = np.abs(flat) > t32[i]
            runs, vals = rle.rle_encode_mask(mask, flat)
            blob = archive.encode_blob(
                serialize(coeff_batch.shape, runs, vals),
                self.codec, self.xz_preset)
            if bundled:
                return blob
            _atomic_write(paths[i], blob)
            return len(blob)

        with cf.ThreadPoolExecutor(self.workers) as ex:
            results = list(ex.map(one, sel))
        if bundled:
            return self._append_members(
                out_dir, [items[i] for i in sel], results)
        return sum(results)

    def pack_sparse(self, out_dir: str, sparse: "SparseCoeffs",
                    t32: np.ndarray) -> int:
        """Pack from device-sparsified (index, value) pairs — no dense
        coefficient array ever reaches the host.  Bytes identical to the
        dense path (same mask, same RLE)."""
        bundled = self.archive_format == "bundle"
        paths = None if bundled else self._paths(out_dir, sparse.items)
        serialize = (archive.serialize_payload_q16 if self.payload == "q16"
                     else archive.serialize_payload)

        def one(i):
            idx, vals = sparse.item_pairs(i, float(t32[i]))
            runs = rle.rle_encode_pairs(idx)
            blob = archive.encode_blob(serialize(sparse.shape, runs, vals),
                                       self.codec, self.xz_preset)
            if bundled:
                return blob
            _atomic_write(paths[i], blob)
            return len(blob)

        with cf.ThreadPoolExecutor(self.workers) as ex:
            results = list(ex.map(one, range(len(sparse.items))))
        if bundled:
            return self._append_members(out_dir, sparse.items, results)
        return sum(results)

    def unpack_sparse(self, in_dir: str, batch: ShapeBatch):
        """Decode payloads to padded (logical position, value) pair arrays
        for the sparse-transfer decompress path: returns
        ``(idx int32 [n_items, cap], vals f32 [n_items, cap])`` where
        padding slots carry distinct positions >= X*Y*Z (dropped by the
        device scatter; distinct because the scatter asserts
        unique_indices).  Only kept pairs ever materialize — no dense rows
        on the host and only ~kept bytes over the host->device link.

        Decoding runs the Python codec path (lzma releases the GIL, so the
        thread pool still parallelizes) rather than the native dense walks
        — the mode targets rigs where the host->device LINK binds, not
        host decode; on fast-link hosts the dense path's native unpack is
        the faster choice."""
        items = batch.items
        dims = tuple(batch.shape)
        m = int(np.prod(dims))
        bundled = self.archive_format == "bundle"
        bs = self._bundle_set(in_dir) if bundled else None
        paths = None if bundled else self._paths(in_dir, items)
        deserialize = (archive.deserialize_payload_q16
                       if self.payload == "q16"
                       else archive.deserialize_payload)

        def one(i):
            if bundled:
                it = items[i]
                blob = bs.blob(it.t, it.level, it.comp_idx, it.box)
            else:
                with open(paths[i], "rb") as f:
                    blob = f.read()
            payload = archive.decode_blob(blob, self.codec)
            shape, total, runs, vals = deserialize(payload)
            if tuple(shape) != dims:
                raise ValueError(
                    f"payload shape {tuple(shape)} disagrees with "
                    f"dimensions.raw {dims}")
            if int(total) != m:
                # the dense path hits this as a reshape failure; reject the
                # corrupt header with the same clean-error contract instead
                # of silently dropping the out-of-range coefficients
                raise ValueError(
                    f"payload total {int(total)} disagrees with "
                    f"dimensions.raw volume {m}")
            # shared helper = the single home of the malformed-stream
            # semantics (reference's skip-increment rule), so sparse and
            # dense decompress can never drift apart on corrupt payloads
            pos, v = rle.rle_decode_pairs(runs, vals, total)
            return pos.astype(np.int32), v

        with cf.ThreadPoolExecutor(self.workers) as ex:
            pairs = list(ex.map(one, range(len(items))))
        cap = max([len(p) for p, _ in pairs] + [1])
        # round the pad capacity up so jit specializations are shared
        # across batches with similar kept counts — but never past the box
        # volume (a 256 floor on an m=64 box would ship MORE bytes than
        # the dense row)
        cap = min(max(256, 1 << (cap - 1).bit_length()),
                  1 << (m - 1).bit_length())
        # padding slots get distinct out-of-range positions m, m+1, ... —
        # all dropped by the device scatter, but unique as its
        # unique_indices contract requires
        idx = np.tile(m + np.arange(cap, dtype=np.int32),
                      (len(items), 1))
        vals = np.zeros((len(items), cap), np.float32)
        for i, (p, v) in enumerate(pairs):
            idx[i, :len(p)] = p
            vals[i, :len(p)] = v
        return idx, vals

    def unpack_into(self, in_dir: str, batch: ShapeBatch) -> None:
        """Read + xz-decode + RLE-scatter every item into ``batch.data``."""
        dims = batch.shape
        rows, row_len, row_stride = self._geometry(batch)
        bundled = self.archive_format == "bundle"
        if bundled:
            bs = self._bundle_set(in_dir)
            blobs = [bs.blob(it.t, it.level, it.comp_idx, it.box)
                     for it in batch.items]
        else:
            paths = self._paths(in_dir, batch.items)
        if self.use_native:
            if batch.layout == "interleaved" and batch.scales > 1:
                if bundled:
                    shapes = native.unpack_mapped_mem(
                        blobs, batch.data, batch._logical_map(),
                        batch.item_offsets(), self.workers,
                        payload=self.payload, codec=self.codec)
                else:
                    shapes = native.unpack_mapped(
                        paths, batch.data, batch._logical_map(),
                        batch.item_offsets(), self.workers,
                        payload=self.payload, codec=self.codec)
            elif batch.layout == "interleaved":
                ix, iy, iz = self._index_tables(batch)
                if bundled:
                    shapes = native.unpack_indexed_mem(
                        blobs, batch.data, ix, iy, iz,
                        batch.item_offsets(), self.workers,
                        payload=self.payload, codec=self.codec)
                else:
                    shapes = native.unpack_indexed(
                        paths, batch.data, ix, iy, iz, batch.item_offsets(),
                        self.workers, payload=self.payload,
                        codec=self.codec)
            else:
                if bundled:
                    shapes = native.unpack_strided_mem(
                        blobs, batch.data, rows, row_len, row_stride,
                        batch.item_offsets(), self.workers,
                        payload=self.payload, codec=self.codec)
                else:
                    shapes = native.unpack_strided(
                        paths, batch.data, rows, row_len, row_stride,
                        batch.item_offsets(), self.workers,
                        payload=self.payload, codec=self.codec)
            if not np.all(shapes == np.asarray(dims, np.int32)):
                raise ValueError(
                    f"payload shapes disagree with dimensions.raw {dims}")
            return

        deserialize = (archive.deserialize_payload_q16
                       if self.payload == "q16"
                       else archive.deserialize_payload)

        def one(i):
            if bundled:
                payload = archive.decode_blob(blobs[i], self.codec)
            else:
                with open(paths[i], "rb") as f:
                    payload = archive.decode_blob(f.read(), self.codec)
            shape, total, runs, vals = deserialize(payload)
            if tuple(shape) != tuple(dims):
                raise ValueError(
                    f"payload shape {shape} disagrees with dimensions.raw "
                    f"{dims}")
            batch.item_write(i, rle.rle_decode(
                runs, vals, total).reshape(dims))

        with cf.ThreadPoolExecutor(self.workers) as ex:
            list(ex.map(one, range(len(batch.items))))
