"""Probe 12: the sparse-path regather (interleaved -> logical) and the
combined sparse device chain.

The compress-side sparse chain is fwd_interleaved (300+ GB/s) ->
_unpack_interleaved_coeffs (3 axis-takes) -> compact_fast (16.8 GB/s).
If the regather is slow it caps the chain no matter how fast compact got.
Measures each stage and the chain at the bench regime.

Writes bench_results/kernel_probe12.json.
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
from wavelet_tpu.runtime import engine                     # noqa: E402

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
    seeds = [70]

    def make_pk():
        seeds[0] += 1
        rng = np.random.default_rng(seeds[0])
        a = jax.device_put(
            rng.standard_normal((n, d, d, d)).astype(np.float32), dev)
        _ = np.asarray(a.ravel()[0])
        return a

    cases = {}

    # regather alone (pack=1 geometry: [n, X, Y, Z] -> [n, XYZ] logical)
    @functools.partial(jax.jit, static_argnums=1)
    def regather_many(v, k):
        def body(i, u):
            flat = engine._unpack_interleaved_coeffs(u, 1, dims)
            return u + jnp.sum(flat) * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, k, body, v)

    # full chain A (round-4 first cut): regather + skewed compact
    @functools.partial(jax.jit, static_argnums=1)
    def chain_many(v, k):
        def body(i, u):
            flat = engine._unpack_interleaved_coeffs(u, 1, dims)
            cnt, idxs, vals, over = cp.compact_fast(
                flat, t32, cap, dims=dims, K=16,
                impl="pallas", assemble="pallas")
            return u + (jnp.sum(vals) + jnp.sum(cnt).astype(jnp.float32)
                        + jnp.sum(over).astype(jnp.float32)
                        ) * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, k, body, v)

    # full chain B (production): compact the interleaved layout directly,
    # translate only the kept pairs via idx_map — no full-array regather
    _, inv = engine.CodecEngine._interleave_maps(dims, 1)
    inv_dev = jax.device_put(jnp.asarray(inv), dev)

    @functools.partial(jax.jit, static_argnums=1)
    def direct_many(v, k):
        def body(i, u):
            cnt, idxs, vals, over = cp.compact_fast(
                u.reshape(n, m), t32, cap, dims=dims, ilv1_dims=dims,
                K=16, impl="pallas", assemble="pallas")
            return u + (jnp.sum(vals) + jnp.sum(cnt).astype(jnp.float32)
                        + jnp.sum(over).astype(jnp.float32)
                        ) * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, k, body, v)

    for name, fn in (("regather_only", regather_many),
                     ("regather_plus_compact", chain_many),
                     ("direct_ilv1_compact", direct_many)):
        try:
            _ = np.asarray(fn(make_pk(), 2).ravel()[0])
            dt, spread = two_point(fn, make_pk, 4, 16, nbytes)
            cases[name] = {"gbps": round(nbytes / 1e9 / dt, 3) if dt
                           else None, "spread": spread}
        except Exception as e:  # noqa: BLE001
            cases[name] = {"error": str(e)[:300]}
        print(name, cases[name], flush=True)

    out["shape"] = [n, d, d, d]
    out["results"] = cases
    with open("bench_results/kernel_probe12.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
