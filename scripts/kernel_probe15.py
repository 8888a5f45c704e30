"""Probe 15: (chunk length c, per-chunk capacity K) sweep of the compact
chain (round-4 verdict item 7 — one more bounded compact experiment).

The rank-select stage's one-hot select does K compare+reduce passes over
every element ([c, kb, Cb] intermediates tiled over the whole array), so
its cost is ~linear in K and INDEPENDENT of c at fixed total size; the
assembly matmul is ~(2K+1) x C x cap, so K and C trade off there.  The
production point is (c=512, K=16) at ~1%-kept caps.  A SHORTER chunk
needs a smaller K for the same overflow probability (per-chunk kept ~
Binomial(c, p): mean p*c halves with c, but the safety margin shrinks
slower than linearly — the sweep measures both the chain rate and the
realistic-data overflow rate so the (c, K) choice is a measured
frontier, not a guess).

Positional-scatter select (the verdict's other candidate) reduces to the
same K one-hot passes on TPU — within-kernel scatter does not exist and
the per-column one-hot matrices are data-dependent, so no stationary-
weight MXU form applies; the (c, K) sweep is the implementable version
of "do less work per element".

Methodology identical to probe 13: fresh inputs per rep, two-point
slopes through lax.fori_loop, HBM speed-of-light rejection.  Decision
recorded in BASELINE.md; adopt only if a config beats production >=10%
with ~zero overflow on the shock-field layouts.

Writes bench_results/kernel_probe15.json.
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

from wavelet_tpu.core import haar                          # noqa: E402
from wavelet_tpu.kernels import compact_pallas as cp       # noqa: E402

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


def overflow_stats(configs, n=32, dim=64, keep=0.01, seed=11):
    """Per-(c, K) chunk-overflow rates on REAL coefficient layouts (Haar
    transforms of smooth+shock fields, probe 11's generator)."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(0, 1, dim, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    boxes = []
    for _ in range(n):
        cx, cy, _cz = rng.random(3)
        smooth = np.sin(6 * (X - cx)) * np.cos(5 * (Y - cy)) + 2 * Z
        shock = np.tanh(60 * (X + 0.7 * Y - cx - 0.5)) * rng.random()
        boxes.append((smooth + shock).astype(np.float32))
    batch = jnp.asarray(np.stack(boxes))
    flat = np.asarray(haar.forward_flat(batch))
    m = flat.shape[1]
    kth = int(max(1, keep * m))
    t32 = np.partition(np.abs(flat), m - kth, axis=1)[:, m - kth - 1]
    out = {}
    for c, K in configs:
        sk = np.asarray(cp._skew_view(jnp.asarray(flat), (dim, dim, dim),
                                      c=c))
        mask = np.abs(sk) > t32[:, None, None]
        cnt = mask.sum(axis=1)
        out[f"c{c}_K{K}"] = {
            "max_chunk_count": int(cnt.max()),
            "p999_chunk_count": float(np.percentile(cnt, 99.9)),
            "row_overflow_rate": float((cnt > K).any(axis=1).mean()),
        }
    return out


def main():
    out = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}
    dev = jax.devices()[0]
    out["platform"] = dev.platform

    d = 64
    n, m = 128, d ** 3
    dims = (d, d, d)
    nbytes = n * m * 4
    cap = int(np.ceil(0.02 * m / 128) * 128)
    t32 = jax.device_put(jnp.full((n,), 2.6, jnp.float32), dev)
    seeds = [1500]

    def make_flat():
        seeds[0] += 1
        rng = np.random.default_rng(seeds[0])
        a = jax.device_put(
            rng.standard_normal((n, m)).astype(np.float32), dev)
        _ = np.asarray(a.ravel()[0])
        return a

    carry = jnp.float32(1e-30)
    # (c, K): production point first; shorter chunks with the smallest K
    # the shock-field overflow stats admit, plus a longer-chunk control
    configs = [(512, 16), (512, 12), (256, 12), (256, 10), (128, 10),
               (128, 8), (1024, 24)]

    cases = {}
    for c, K in configs:
        @functools.partial(jax.jit, static_argnums=1)
        def full_many(v, k, c=c, K=K):
            def body(i, u):
                cnt, idxs, vals, over = cp.compact_fast(
                    u, t32, cap, dims=dims, ilv1_dims=dims, K=K, c=c,
                    impl="pallas", assemble="pallas")
                return u + (jnp.sum(vals) + jnp.sum(cnt).astype(jnp.float32)
                            + jnp.sum(over).astype(jnp.float32)) * carry
            return jax.lax.fori_loop(0, k, body, v)

        name = f"c{c}_K{K}"
        try:
            _ = np.asarray(full_many(make_flat(), 2).ravel()[0])
            dt, spread = two_point(full_many, make_flat, 4, 16, nbytes)
            cases[name] = {"gbps": round(nbytes / 1e9 / dt, 3) if dt
                           else None, "spread": spread}
        except Exception as e:  # noqa: BLE001
            cases[name] = {"error": str(e)[:300]}
        print(name, cases[name], flush=True)

    out["shape"] = [n, d, d, d]
    out["cap"] = cap
    out["chain_rates"] = cases
    out["overflow_stats_shock64"] = overflow_stats(configs)
    print(json.dumps(out["overflow_stats_shock64"], indent=2))
    with open("bench_results/kernel_probe15.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
