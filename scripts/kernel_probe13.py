"""Probe 13: stage split of the production sparse compact chain.

The direct interleaved compact (probe 12) lands at ~22 GB/s.  Where does
the time go?  Candidates: the skew-view pad copy (a separate-output copy
pass), the Pallas rank-select (whose one-hot select does K compare+reduce
passes over every VMEM block — work linear in K, matching probe 11's
22.6/16.8/8.8 GB/s at K=16/32/64), the matmul-gather assembly, and the
final cap-pair keysort.  Each prefix of the chain is measured so the
deltas attribute cost per stage; a jnp cumsum over the same array is
re-measured as the "prefix-sum ceiling" reference (43 GB/s in round 3).

Writes bench_results/kernel_probe13.json.
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
    K = int(os.environ.get("PROBE13_K", "16"))
    t32 = jax.device_put(jnp.full((n,), 2.6, jnp.float32), dev)
    seeds = [700]

    def make_flat():
        seeds[0] += 1
        rng = np.random.default_rng(seeds[0])
        a = jax.device_put(
            rng.standard_normal((n, m)).astype(np.float32), dev)
        _ = np.asarray(a.ravel()[0])
        return a

    carry = jnp.float32(1e-30)

    @functools.partial(jax.jit, static_argnums=1)
    def cumsum_many(v, k):
        def body(i, u):
            return u + jnp.cumsum(u, axis=-1)[:, -1:] * carry
        return jax.lax.fori_loop(0, k, body, v)

    @functools.partial(jax.jit, static_argnums=1)
    def skew_many(v, k):
        def body(i, u):
            f3 = cp._skew_view(u, dims)
            return u + jnp.sum(f3[:, 0, 0]) * carry
        return jax.lax.fori_loop(0, k, body, v)

    @functools.partial(jax.jit, static_argnums=1)
    def rank_many(v, k):
        def body(i, u):
            f3 = cp._skew_view(u, dims)
            cnt, jloc, vc = cp._rank_select_pallas(f3, t32, K)
            return u + (jnp.sum(vc[:, 0, 0]) + jnp.sum(cnt[:, 0]).astype(
                jnp.float32)) * carry
        return jax.lax.fori_loop(0, k, body, v)

    @functools.partial(jax.jit, static_argnums=1)
    def assemble_many(v, k):
        def body(i, u):
            f3 = cp._skew_view(u, dims)
            cnt, jloc, vc = cp._rank_select_pallas(f3, t32, K)
            C = f3.shape[2]
            offs = (jnp.cumsum(cnt, axis=1) - cnt).astype(jnp.float32)
            tt = jnp.concatenate(
                [jloc.astype(jnp.float32), vc, offs[:, None, :]], axis=1)
            idx, vals = cp._assemble_pallas(offs, tt, cap, C, K)
            return u + (jnp.sum(vals) + jnp.sum(idx).astype(
                jnp.float32)) * carry
        return jax.lax.fori_loop(0, k, body, v)

    @functools.partial(jax.jit, static_argnums=1)
    def full_many(v, k):
        def body(i, u):
            cnt, idxs, vals, over = cp.compact_fast(
                u, t32, cap, dims=dims, ilv1_dims=dims, K=K,
                impl="pallas", assemble="pallas")
            return u + (jnp.sum(vals) + jnp.sum(cnt).astype(jnp.float32)
                        + jnp.sum(over).astype(jnp.float32)) * carry
        return jax.lax.fori_loop(0, k, body, v)

    cases = {}
    for name, fn in (("prefix_sum_ceiling", cumsum_many),
                     ("skew_view_only", skew_many),
                     ("through_rank_select", rank_many),
                     ("through_assembly", assemble_many),
                     ("full_compact", full_many)):
        try:
            _ = np.asarray(fn(make_flat(), 2).ravel()[0])
            dt, spread = two_point(fn, make_flat, 4, 16, nbytes)
            cases[name] = {"gbps": round(nbytes / 1e9 / dt, 3) if dt
                           else None, "spread": spread}
        except Exception as e:  # noqa: BLE001
            cases[name] = {"error": str(e)[:300]}
        print(name, cases[name], flush=True)

    out["shape"] = [n, d, d, d]
    out["cap"] = cap
    out["K"] = K
    out["results"] = cases
    with open(os.environ.get("PROBE13_OUT", "bench_results/kernel_probe13.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
