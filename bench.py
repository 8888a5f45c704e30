"""Benchmark: device codec throughput on dense AMR blocks (one real chip).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Headline: end-to-end *compress* throughput per chip on dense [128, 64^3]
float32 AMR blocks — fused single-HBM-pass Pallas forward (3D Haar + min/max
reduction) plus exact-parity threshold masking — against the BASELINE.json
north star of 10 GB/s/chip (the C++ reference is serial CPU-only and
publishes no numbers; see BASELINE.md).

Methodology notes (this rig tunnels to the TPU through axon):
- repeated identical executions can be served from a cache, so every timed
  region uses a device-side ``fori_loop`` whose carry chains iterations;
- per-call dispatch overhead (~30 ms here) is removed by two-point timing:
  slope between a K1-iteration and a K2-iteration call;
- inputs are synced onto the device before timing;
- the reported figure is the MEDIAN of 5 fresh-input reps (not the min:
  one cache-contaminated rep would poison a min in the optimistic
  direction), with the min/max spread recorded in the artifact;
- hard plausibility guard: any rep whose implied HBM traffic exceeds the
  v5e's ~819 GB/s physical bandwidth is discarded — a reported number can
  never again be faster than the hardware.
"""

import json
import sys
import time

import numpy as np


# Speed of light: a v5e chip has ~819 GB/s of HBM bandwidth.  Any stage
# whose implied HBM traffic rate exceeds this is NOT a measurement — it is
# cache contamination (the axon layer can serve repeated executions from a
# cache) or timer noise, and must never become a reported number.
HBM_BYTES_PER_S = 819e9


def _two_point(many_k, make_x, k1, k2, nbytes, traffic_mult,
               reps: int = 5):
    """Per-iteration seconds via slope between k1- and k2-iteration calls.

    Repeated ``reps`` times with a FRESH input each rep (the axon runtime
    caches identical (executable, input) executions, which would fake
    near-zero times).  The reported figure is the MEDIAN plausible slope:
    any rep whose implied HBM traffic (``nbytes * traffic_mult`` per
    iteration) exceeds the chip's physical bandwidth is discarded as
    contaminated, and the min/max spread of the surviving reps is returned
    alongside so the variance is visible in the artifact.

    Returns ``(median_dt, spread_dict)``.
    """
    floor_dt = nbytes * traffic_mult / HBM_BYTES_PER_S if nbytes else 0.0
    slopes = []
    dropped = 0
    for _ in range(reps):
        x = make_x()
        t0 = time.perf_counter()
        _ = np.asarray(many_k(x, k1).ravel()[0])
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(many_k(x, k2).ravel()[0])
        tb = time.perf_counter() - t0
        dt = (tb - ta) / (k2 - k1)
        if dt < floor_dt:          # faster than the hardware can move bytes
            dropped += 1
            continue
        slopes.append(dt)
    if not slopes:
        # every rep was implausible — report the physical floor and say so
        # rather than publishing fiction
        return floor_dt, {"min_gbps_dt": floor_dt, "max_gbps_dt": floor_dt,
                          "reps_used": 0, "reps_dropped_implausible": dropped,
                          "all_reps_implausible": True}
    med = float(np.median(slopes))
    return med, {"min_gbps_dt": float(min(slopes)),
                 "max_gbps_dt": float(max(slopes)),
                 "reps_used": len(slopes),
                 "reps_dropped_implausible": dropped}


def _device_alive(timeout_s: float = 120.0, retries: int = 3) -> bool:
    """Probe the default backend with a bounded wait: the axon TPU tunnel
    has multi-hour outages during which ANY device op (including backend
    enumeration) hangs indefinitely — a bench that hangs records nothing.
    The probe runs on a daemon thread so a hung init can't block exit."""
    import threading
    import time as _time

    ok: list = []

    def probe():
        import jax
        import numpy as _np

        ok.append(float(jax.numpy.sum(jax.device_put(_np.ones(4)))))

    for attempt in range(retries):
        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout_s)
        if ok:
            return True
        if attempt + 1 < retries:
            _time.sleep(120)
    return False


def _fail_line(reason: str):
    # an explicit failure line beats an indefinite hang: the driver
    # records the outage instead of nothing, and the artifact can never
    # be mistaken for a measurement
    print(json.dumps({
        "metric": "device_compress_throughput_per_chip",
        "value": 0, "unit": "GB/s", "vs_baseline": 0,
        "extra": {"error": reason + "; see bench_results/ for the last "
                                    "recorded run"}}))


def main():
    if not _device_alive():
        _fail_line("TPU backend unresponsive (axon tunnel outage)")
        import os
        os._exit(0)   # a hung device thread must not block exit
    # the tunnel can ALSO die mid-run (multi-hour outages observed);
    # run the measurement on a watchdog thread so a hang mid-bench still
    # produces a line instead of hanging the driver's bench step
    import threading

    done: list = []
    failed: list = []

    def work():
        try:
            done.append(_measure())
        except BaseException as e:  # noqa: BLE001 — recorded, not hidden
            failed.append(f"{type(e).__name__}: {e}")
            raise

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(2400)       # generous: a cached hot run takes ~10-12 min
    import os

    if failed:
        # distinguish a real exception from a hang — a fabricated
        # "timed out" cause would mislead the artifact's reader
        _fail_line(f"bench raised: {failed[0][:300]}")
        os._exit(1)
    if not done:
        # the watchdog can lose a race with a measurement that finishes
        # right at the join deadline: re-check once before declaring a
        # timeout (round-3 advisor finding)
        t.join(5)
        if not done:
            _fail_line("bench timed out after 40 min (tunnel died mid-run "
                       "or compile storm)")
            os._exit(0)
    print(json.dumps(done[0]))
    os._exit(0)        # hung device threads must not block exit


def _measure() -> dict:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from wavelet_tpu.runtime import debug

    debug.enable_compilation_cache()

    from wavelet_tpu.core import haar, threshold
    from wavelet_tpu.kernels import haar_pallas as hp
    from wavelet_tpu.runtime import engine

    dev = jax.devices()[0]
    platform = dev.platform
    on_tpu = platform == "tpu"

    n, d = 128, 64
    rng = np.random.default_rng(0)
    orig_np = rng.standard_normal((n, d, d, d)).astype(np.float32)
    batch_np = orig_np
    nbytes = batch_np.nbytes
    keep = 0.999
    K1, K2 = 10, 40

    # the production TPU path is lane-packed: P boxes' Z-axes fill the
    # 128-lane dim (see kernels/haar_pallas.py); bench what the pipeline runs
    pack = hp.lane_pack_factor((d, d, d)) if on_tpu else 1
    if pack > 1:
        packed_np = (batch_np.reshape(n // pack, pack, d, d, d)
                     .transpose(0, 2, 3, 1, 4)
                     .reshape(n // pack, d, d, pack * d))
        batch_np = np.ascontiguousarray(packed_np)

    fwd_one = ((lambda v: hp.fused_forward_packed(v, pack)[0]) if on_tpu
               else (lambda v: haar.haar3d_forward(v)))
    inv_one = ((lambda v: hp.fused_inverse_packed(v, pack)) if on_tpu
               else haar.haar3d_inverse)

    # round-2 interleaved layout (same bytes on disk, different kernels):
    # benched alongside; the headline takes whichever forward is faster.
    # Its packed shape differs (wide lanes), so it gets its own inputs.
    ipack = hp.interleaved_pack_factor((d, d, d)) if on_tpu else 1
    i_shape = (n // ipack, d, d, ipack * d) if on_tpu else batch_np.shape
    ifwd_one = ((lambda v: hp.fused_forward_interleaved(v, ipack)[0])
                if on_tpu else fwd_one)
    iinv_one = (hp.fused_inverse_interleaved if on_tpu else inv_one)

    @partial(jax.jit, static_argnums=1)
    def ifwd_many(v, k):
        return jax.lax.fori_loop(0, k, lambda i, u: ifwd_one(u), v)

    @partial(jax.jit, static_argnums=1)
    def iinv_many(v, k):
        return jax.lax.fori_loop(0, k, lambda i, u: iinv_one(u), v)

    _seed_pool = [100]

    def make_x_shape(shape):
        """Fresh-input factory (cache-proof: the axon layer can serve
        repeated (executable, input) executions from a cache)."""

        def make():
            _seed_pool[0] += 1
            rr = np.random.default_rng(_seed_pool[0])
            arr = jax.device_put(
                rr.standard_normal(shape).astype(np.float32), dev)
            _ = np.asarray(arr.ravel()[0])  # ensure transfer complete
            return arr
        return make

    @partial(jax.jit, static_argnums=1)
    def fwd_many(v, k):
        return jax.lax.fori_loop(0, k, lambda i, u: fwd_one(u), v)

    @partial(jax.jit, static_argnums=2)
    def mask_many(v, t32, k):
        # per-item thresholds broadcast over lanes: [M, 1, 1, P] -> P*Z lanes
        tl = jnp.repeat(t32.reshape(v.shape[0], pack), d, axis=1)
        def body(i, u):
            m = jnp.abs(u) > tl[:, None, None, :]
            return jnp.where(m, u, jnp.zeros_like(u))
        return jax.lax.fori_loop(0, k, body, v)

    @partial(jax.jit, static_argnums=1)
    def inv_many(v, k):
        return jax.lax.fori_loop(0, k, lambda i, u: inv_one(u), v)

    make_x = make_x_shape(batch_np.shape)

    x = jax.device_put(batch_np, dev)
    _ = np.asarray(x[0, 0, 0, 0])  # ensure transfer complete

    # warm/compile all three
    _ = np.asarray(fwd_many(x, 2).ravel()[0])
    if on_tpu:
        # fresh buffer: the fused kernels donate their input (in-place
        # aliasing), so x must not be passed to a top-level kernel call
        xf = jax.device_put(batch_np, dev)
        _, maxv, minv = hp.fused_forward_packed(xf, pack)
        maxv, minv = np.asarray(maxv), np.asarray(minv)
        signed = np.where(np.abs(maxv) >= np.abs(minv), maxv, minv)
    else:
        signed = np.asarray(threshold.signed_absmax(
            haar.forward_flat(x), axis=-1))
    t32 = jax.device_put(jnp.asarray(
        threshold.exact_threshold32(signed, keep)), dev)
    _ = np.asarray(mask_many(x, t32, 2).ravel()[0])
    _ = np.asarray(inv_many(x, 2).ravel()[0])

    # traffic multiplier: each stage reads its input once and writes its
    # output once -> ~2x the input bytes of HBM traffic per iteration
    guard_bytes = nbytes if on_tpu else 0   # SoL guard is a v5e property
    dt_fwd, sp_fwd = _two_point(fwd_many, make_x, K1, K2, guard_bytes, 2.0)
    dt_mask, sp_mask = _two_point(lambda v, k: mask_many(v, t32, k),
                                  make_x, K1, K2, guard_bytes, 2.0)
    dt_inv, sp_inv = _two_point(inv_many, make_x, K1, K2, guard_bytes, 2.0)

    # interleaved-layout kernels (TPU only; compile + measure guarded so a
    # Mosaic regression can never take down the whole bench)
    dt_ifwd = dt_iinv = None
    sp_ifwd = sp_iinv = None
    if on_tpu:
        try:
            imake = make_x_shape(i_shape)
            _ = np.asarray(ifwd_many(imake(), 2).ravel()[0])
            _ = np.asarray(iinv_many(imake(), 2).ravel()[0])
            dt_ifwd, sp_ifwd = _two_point(ifwd_many, imake, K1, K2,
                                          guard_bytes, 2.0)
            dt_iinv, sp_iinv = _two_point(iinv_many, imake, K1, K2,
                                          guard_bytes, 2.0)
        except Exception as e:  # noqa: BLE001
            sp_ifwd = {"error": str(e)[:200]}
            dt_ifwd = dt_iinv = None

    # --- large AMR boxes (VERDICT r3 item 1): the lifted whole-box gate
    # must show up as measured throughput — fused interleaved at 128^3 vs
    # the jnp multi-pass fallback those boxes used to take (TPU only)
    large = None
    if on_tpu:
        try:
            dL, nL = 128, 32                       # 256 MiB per rep
            packL = hp.interleaved_pack_factor((dL, dL, dL))
            lshape = (nL // packL, dL, dL, packL * dL)
            lbytes = nL * dL ** 3 * 4

            @partial(jax.jit, static_argnums=1)
            def lfwd_many(v, k):
                return jax.lax.fori_loop(
                    0, k, lambda i, u: hp.fused_forward_interleaved(
                        u, packL)[0], v)

            @partial(jax.jit, static_argnums=1)
            def ljnp_many(v, k):
                return jax.lax.fori_loop(
                    0, k, lambda i, u: haar.haar3d_forward(u), v)

            lmake = make_x_shape(lshape)
            jmake = make_x_shape((nL, dL, dL, dL))
            _ = np.asarray(lfwd_many(lmake(), 2).ravel()[0])
            _ = np.asarray(ljnp_many(jmake(), 2).ravel()[0])
            dt_lf, sp_lf = _two_point(lfwd_many, lmake, K1, K2,
                                      lbytes if on_tpu else 0, 2.0)
            # the jnp fallback makes ~3 passes (one per axis), ~6x traffic
            dt_lj, sp_lj = _two_point(ljnp_many, jmake, K1, K2,
                                      lbytes if on_tpu else 0, 6.0)
            lgb = lbytes / 1e9
            large = {
                "block_shape": [nL, dL, dL, dL],
                "pack": packL,
                "fused_interleaved_gbps": round(lgb / dt_lf, 3),
                "fused_spread": {k: sp_lf[k] for k in
                                 ("reps_used", "reps_dropped_implausible")},
                "jnp_fallback_gbps": round(lgb / dt_lj, 3),
                "fused_vs_jnp": round(dt_lj / dt_lf, 3),
            }
        except Exception as e:  # noqa: BLE001
            large = {"error": str(e)[:200]}

    # --- sparse compact step: the sort-free rank-select fast path
    # (kernels/compact_pallas.py, VERDICT r4 item 1) measured at its
    # production regime, plus the round-3 argsort for the delta
    compact = None
    if on_tpu:
        try:
            from wavelet_tpu.runtime.engine import _compact_step
            from wavelet_tpu.kernels import compact_pallas

            m = d ** 3
            # P(|N(0,1)| > 2.6) ~= 0.93%: the ~1% kept fraction real AMR
            # data sits in.  The adaptive cap settles at 1.5x the
            # observed kept fraction (engine.compress_shapebatch_sparse),
            # so the steady-state capf is ~0.014 — which is also what
            # makes engine._compact pick K=12 (capf <= 0.015; probe 15
            # adopted 12 over 16, +11%).  Using a 2% cap here with a
            # mismatched K would measure a (cap, K) pair the engine
            # never runs (round-4 review finding).
            cap = int(np.ceil(1.5 * 0.0093 * m / 128) * 128)
            t32c = jax.device_put(
                jnp.full((n,), 2.6, jnp.float32), dev)

            @partial(jax.jit, static_argnums=1)
            def compact_many(v, k):
                def body(i, u):
                    cnt, idxs, vals = _compact_step(u, t32c, cap)
                    # thread every output back into the carry so no row of
                    # the argsort can be dead-code-eliminated
                    return u + (jnp.sum(vals) + jnp.sum(cnt).astype(
                        jnp.float32) + jnp.sum(idxs).astype(
                        jnp.float32)) * jnp.float32(1e-30)
                return jax.lax.fori_loop(0, k, body, v)

            # production steady-state config: the adaptive cap settles at
            # ~1.5x the observed ~0.93% kept -> K=12, and the interleaved
            # layout is compacted directly with the closed-form scales=1
            # index translation (engine.compress_shapebatch_sparse)
            @partial(jax.jit, static_argnums=1)
            def compact_fast_many(v, k):
                def body(i, u):
                    cnt, idxs, vals, over = compact_pallas.compact_fast(
                        u, t32c, cap, dims=(d, d, d), ilv1_dims=(d, d, d),
                        K=12, impl="pallas", assemble="pallas")
                    return u + (jnp.sum(vals) + jnp.sum(cnt).astype(
                        jnp.float32) + jnp.sum(idxs).astype(
                        jnp.float32) + jnp.sum(over).astype(
                        jnp.float32)) * jnp.float32(1e-30)
                return jax.lax.fori_loop(0, k, body, v)

            cmake = make_x_shape((n, m))
            _ = np.asarray(compact_fast_many(cmake(), 2).ravel()[0])
            dt_f, sp_f = _two_point(compact_fast_many, cmake, K1, K2,
                                    nbytes, 2.0)
            _ = np.asarray(compact_many(cmake(), 2).ravel()[0])
            dt_c, sp_c = _two_point(compact_many, cmake, K1, K2,
                                    nbytes, 2.0)
            compact = {
                "gbps": round(nbytes / 1e9 / dt_f, 3),
                "argsort_gbps": round(nbytes / 1e9 / dt_c, 3),
                "cap_fraction": cap / m,
                "reps_used": sp_f["reps_used"],
                "reps_dropped_implausible":
                    sp_f["reps_dropped_implausible"],
            }
        except Exception as e:  # noqa: BLE001
            compact = {"error": str(e)[:200]}

    # --- sparse decompress device stage: the vmapped scatter that
    # rebuilds dense coefficient rows from (position, value) pairs
    # (engine._scatter_rows) — the mirror of the compact stage above;
    # rate normalized to the DENSE bytes it reconstructs
    scatter = None
    if on_tpu:
        try:
            from wavelet_tpu.runtime.engine import _scatter_rows

            m = d ** 3
            cap = int(np.ceil(0.02 * m / 128) * 128)

            def make_pairs():
                _seed_pool[0] += 1
                rr = np.random.default_rng(_seed_pool[0])
                # unique_indices contract: every slot distinct per row,
                # padding slots distinct positions >= m (dropped)
                idx = np.empty((n, cap), np.int32)
                for i in range(n):
                    idx[i, : cap // 2] = np.sort(rr.choice(
                        m, cap // 2, replace=False)).astype(np.int32)
                idx[:, cap // 2:] = m + np.arange(cap - cap // 2,
                                                  dtype=np.int32)
                vals = rr.standard_normal((n, cap)).astype(np.float32)
                a = jax.device_put(idx, dev)
                b = jax.device_put(vals, dev)
                _ = np.asarray(a.ravel()[0]), np.asarray(b.ravel()[0])
                return a, b

            @partial(jax.jit, static_argnums=1)
            def scatter_many(pair, k):
                idx, vals = pair

                def body(i, u):
                    iv, vv = u
                    out = _scatter_rows(iv, vv, m)
                    # feed the result back so no iteration can be DCE'd
                    return (iv, vv + jnp.sum(out) * jnp.float32(1e-30))
                return jax.lax.fori_loop(0, k, body, (idx, vals))[1]

            _ = np.asarray(scatter_many(make_pairs(), 2).ravel()[0])
            dt_s, sp_s = _two_point(scatter_many, make_pairs, K1, K2,
                                    nbytes, 1.0)
            scatter = {
                "gbps_dense_rebuilt": round(nbytes / 1e9 / dt_s, 3),
                "cap_fraction": cap / m,
                "reps_used": sp_s["reps_used"],
                "reps_dropped_implausible":
                    sp_s["reps_dropped_implausible"],
            }
        except Exception as e:  # noqa: BLE001
            scatter = {"error": str(e)[:200]}

    gb = nbytes / 1e9
    best_fwd = dt_fwd
    best_inv = dt_inv
    layout = "halves"
    inv_layout = "halves"
    if dt_ifwd is not None and dt_ifwd < dt_fwd:
        best_fwd = dt_ifwd
        layout = "interleaved"
    if dt_iinv is not None and dt_iinv < dt_inv:
        best_inv = dt_iinv
        inv_layout = "interleaved"
    compress_gbps = gb / (best_fwd + dt_mask)
    decompress_gbps = gb / best_inv
    roundtrip_gbps = gb / (best_fwd + dt_mask + best_inv)

    def _stage(name, dt, sp):
        """Per-stage report: median GB/s + spread + plausibility evidence."""
        d = {"gbps": round(gb / dt, 3),
             "gbps_max": round(gb / sp["min_gbps_dt"], 3),
             "gbps_min": round(gb / sp["max_gbps_dt"], 3),
             "reps_used": sp["reps_used"],
             "reps_dropped_implausible": sp["reps_dropped_implausible"]}
        if sp.get("all_reps_implausible"):
            d["all_reps_implausible"] = True
        return d

    # quality on a real (non-chained) round trip through the engine
    eng = engine.CodecEngine()
    flat, mask = eng.compress_batch(orig_np, keep)
    recon = eng.decompress_batch(np.where(mask, flat, 0.0), (d, d, d))
    rmse = float(np.sqrt(np.mean(
        (recon.astype(np.float64) - orig_np.astype(np.float64)) ** 2)))
    kept_frac = float(mask.mean())

    # the end-to-end rows (VERDICT r3 item 3) are recorded by
    # scripts/bench_e2e.py (full pipeline on a >= 1 GiB tmpfs dataset with
    # link-time decomposition — this rig's axon tunnel moves ~0.03-0.05
    # GB/s per direction, so e2e wall here is ~75-98% tunnel); the bench
    # embeds that artifact's summary so BOTH numbers appear side by side
    # and the device-stage headline can't be mistaken for the e2e target.
    e2e = None
    try:
        with open("bench_results/e2e_compress.json") as f:
            ed = json.load(f)
        pick = ed.get("cube128", ed.get("cube64", {}))
        coll = pick.get("collected", {})
        e2e = {
            "artifact": "bench_results/e2e_compress.json",
            "semantics": ed.get("semantics"),
            "e2e_measured_gbps_this_rig": coll.get("e2e_measured_gbps"),
            "link_share_of_wall": coll.get("link_share_of_wall"),
            "e2e_link_normalized_gbps": coll.get(
                "e2e_link_normalized_gbps"),
            "reconciliation": coll.get("reconciliation"),
            "projected_colocated_gbps": coll.get(
                "projected_colocated_gbps"),
        }
    except (OSError, ValueError):
        pass

    baseline = 10.0  # GB/s/chip north star (BASELINE.json)
    return {
        # renamed from compress_throughput_per_chip (round <= 2): this is
        # the DEVICE-STAGE rate (fused forward + threshold masking), not
        # the end-to-end figure the 10 GB/s baseline targets — see
        # extra.e2e for the end-to-end rows and their decomposition
        "metric": "device_compress_throughput_per_chip",
        "value": round(compress_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(compress_gbps / baseline, 3),
        "extra": {
            "vs_baseline_note": ("baseline 10 GB/s is an END-TO-END "
                                 "target; this headline is the device "
                                 "stage alone — e2e rows in extra.e2e"),
            "e2e": e2e,
            "large_box_128": large,
            "sparse_compact_stage": compact,
            "sparse_scatter_stage": scatter,
            "platform": platform,
            "block_shape": [n, d, d, d],
            "bytes": nbytes,
            "methodology": ("median of 5 fresh-input two-point slopes; "
                            "reps implying > 819 GB/s HBM traffic (v5e "
                            "speed of light) are dropped as cache-"
                            "contaminated"),
            "headline_layout": layout,
            "decompress_layout": inv_layout,
            "forward": _stage("forward", dt_fwd, sp_fwd),
            "mask": _stage("mask", dt_mask, sp_mask),
            "inverse": _stage("inverse", dt_inv, sp_inv),
            "forward_interleaved": (
                _stage("fwd_i", dt_ifwd, sp_ifwd) if dt_ifwd else sp_ifwd),
            "inverse_interleaved": (
                _stage("inv_i", dt_iinv, sp_iinv) if dt_iinv else None),
            "decompress_gbps": round(decompress_gbps, 3),
            "roundtrip_gbps": round(roundtrip_gbps, 3),
            # in the real pipeline the host packer applies the threshold
            # during RLE, so the device compress stage is the forward pass
            # alone; the headline includes the mask stage as a conservative
            # "device does transform + masking" definition kept from r1
            "pipeline_device_stage_gbps": round(gb / best_fwd, 3),
            "keep": keep,
            "kept_coeff_fraction": round(kept_frac, 6),
            "roundtrip_rmse": rmse,
        },
    }


if __name__ == "__main__":
    sys.exit(main())
