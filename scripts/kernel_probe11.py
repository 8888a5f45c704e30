"""Probe 11: sort-free rank-select compact (jnp-fused + Pallas) vs the
round-3 production chunked argsort.

Round-3 verdict: the compact stage (3.8 GB/s) never tried a Pallas kernel
despite a measured 43 GB/s cumsum ceiling.  kernels/compact_pallas.py drops
the sort for an exclusive-prefix rank + one-hot select; this probe measures
both implementations on the chip at the bench regime (n=128 x 64^3, ~0.9%
kept), sweeps K (per-chunk capacity), isolates the rank-select vs assembly
split, and records chunk-overflow statistics on realistic clustered
coefficients (actual Haar transforms of smooth+shock fields).

Writes bench_results/kernel_probe11.json.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wavelet_tpu.runtime import debug

debug.enable_compilation_cache()

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

from wavelet_tpu.kernels import compact_pallas as cp       # noqa: E402
from wavelet_tpu.runtime.engine import _compact_step       # noqa: E402
from wavelet_tpu.core import haar                          # noqa: E402

HBM_BYTES_PER_S = 819e9


def two_point(fn, make_x, k1, k2, nbytes, reps=5):
    floor_dt = nbytes * 2.0 / HBM_BYTES_PER_S
    slopes, dropped = [], 0
    for _ in range(reps):
        x = make_x()
        t0 = time.perf_counter()
        _ = np.asarray(fn(x, k1).ravel()[0])
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(fn(x, k2).ravel()[0])
        tb = time.perf_counter() - t0
        dt = (tb - ta) / (k2 - k1)
        if dt < floor_dt:
            dropped += 1
            continue
        slopes.append(dt)
    if not slopes:
        return None, {"all_implausible": True, "dropped": dropped}
    return (float(np.median(slopes)),
            {"min": float(min(slopes)), "max": float(max(slopes)),
             "used": len(slopes), "dropped": dropped})


def check_equal(n=8, m=8192, cap=512, seed=3):
    rng = np.random.default_rng(seed)
    flat = rng.standard_normal((n, m)).astype(np.float32)
    sp = rng.random((n, m)) < 0.01
    flat[sp] *= 100
    t32 = np.full(n, 5.0, np.float32)
    ref = [np.asarray(x) for x in _compact_step(
        jnp.asarray(flat), jnp.asarray(t32), cap)]
    for impl in ("jnp", "pallas"):
        for asm in ("jnp", "pallas"):
            got = [np.asarray(x) for x in cp.compact_fast(
                jnp.asarray(flat), jnp.asarray(t32), cap, impl=impl,
                assemble=asm)]
            assert not got[3].any(), (impl, asm)
            np.testing.assert_array_equal(got[0], ref[0], err_msg=impl)
            for i in range(n):
                if int(ref[0][i]) > cap:
                    continue
                k = int(ref[0][i])
                np.testing.assert_array_equal(got[1][i, :k], ref[1][i, :k])
                np.testing.assert_array_equal(got[2][i, :k], ref[2][i, :k])
    return True


def overflow_stats(K_values, n=32, dim=64, keep=0.01, seed=11):
    """Chunk-overflow rates on REAL coefficient layouts: Haar transforms of
    smooth fields with sharp shock fronts (worst case for local kept
    clustering), thresholded at `keep` row-wide."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(0, 1, dim, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    boxes = []
    for i in range(n):
        cx, cy, cz = rng.random(3)
        smooth = np.sin(6 * (X - cx)) * np.cos(5 * (Y - cy)) + 2 * Z
        shock = np.tanh(60 * (X + 0.7 * Y - cx - 0.5)) * rng.random()
        boxes.append((smooth + shock).astype(np.float32))
    batch = jnp.asarray(np.stack(boxes))
    flat = np.asarray(haar.forward_flat(batch))
    m = flat.shape[1]
    kth = int(max(1, keep * m))
    t32 = np.partition(np.abs(flat), m - kth, axis=1)[:, m - kth - 1]
    import jax.numpy as _jnp
    sk = np.asarray(cp._skew_view(_jnp.asarray(flat), (dim, dim, dim)))
    mask = np.abs(sk) > t32[:, None, None]       # NaN pads compare false
    cnt = mask.sum(axis=1)
    stats = {"kept_fraction": float(mask.mean()),
             "max_chunk_count": int(cnt.max()),
             "p99_chunk_count": float(np.percentile(cnt, 99))}
    for K in K_values:
        stats[f"row_overflow_rate_K{K}"] = float((cnt > K).any(axis=1).mean())
    return stats


def main():
    out = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}
    check_equal()
    out["bitwise_equal_small"] = True
    dev = jax.devices()[0]
    out["platform"] = dev.platform

    n, m = 128, 64 ** 3
    cap = int(np.ceil(0.02 * m / 128) * 128)
    nbytes = n * m * 4
    t32 = jax.device_put(jnp.full((n,), 2.0, jnp.float32), dev)
    seeds = [90]

    def make_x():
        seeds[0] += 1
        rng = np.random.default_rng(seeds[0])
        flat = rng.standard_normal((n, m)).astype(np.float32)
        sp = rng.random((n, m)) < 0.01
        flat[sp] *= 100
        a = jax.device_put(flat, dev)
        _ = np.asarray(a.ravel()[0])
        return a

    def full(impl, K):
        def fn(f, t, c):
            cnt, idx, vals, over = cp.compact_fast(f, t, c, K=K, impl=impl)
            return cnt, idx, vals, over
        return fn

    def select_only(impl, K):
        sel = (cp._rank_select_pallas if impl == "pallas"
               else cp._rank_select_jnp)
        def fn(f, t, c):
            cnt, jloc, vc = sel(cp._skew_view(f, (64, 64, 64)), t, K)
            return cnt, jloc, vc, cnt
        return fn

    dims = (64, 64, 64)

    def full2(impl, asm, K):
        def fn(f, t, c):
            return cp.compact_fast(f, t, c, dims=dims, K=K, impl=impl,
                                   assemble=asm)
        return fn

    cases = {
        "baseline_argsort_chunked": lambda f, t, c: (
            *_compact_step(f, t, c), jnp.zeros((n,), bool)),
        "jnp_jnp_K32": full2("jnp", "jnp", 32),
        "pallas_jnp_K32": full2("pallas", "jnp", 32),
        "jnp_pallas_K32": full2("jnp", "pallas", 32),
        "pallas_pallas_K32": full2("pallas", "pallas", 32),
        "pallas_pallas_K16": full2("pallas", "pallas", 16),
        "pallas_pallas_K64": full2("pallas", "pallas", 64),
        "select_only_jnp_K32": select_only("jnp", 32),
        "select_only_pallas_K32": select_only("pallas", 32),
    }
    results = {}
    for name, fn in cases.items():
        @functools.partial(jax.jit, static_argnums=1)
        def many(v, k, fn=fn):
            def body(i, u):
                cnt, idxs, vals, over = fn(u, t32, cap)
                return u + (jnp.sum(vals) + jnp.sum(cnt).astype(jnp.float32)
                            + jnp.sum(idxs).astype(jnp.float32)
                            ) * jnp.float32(1e-30)
            return jax.lax.fori_loop(0, k, body, v)

        try:
            _ = np.asarray(many(make_x(), 2).ravel()[0])
            dt, spread = two_point(many, make_x, 4, 16, nbytes)
            results[name] = {
                "gbps": round(nbytes / 1e9 / dt, 3) if dt else None,
                "spread": spread}
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:300]}
        print(name, results[name], flush=True)
    out["shape"] = [n, m]
    out["cap_fraction"] = cap / m
    out["results"] = results
    out["overflow_stats_shock64"] = overflow_stats([16, 32, 64])
    with open("bench_results/kernel_probe11.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
