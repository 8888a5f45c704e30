"""Probe 14: the padless (direct) rank select on hardware.

Probe 13 split the compact chain: the skew-view build alone (two
sequential pad copies) takes 27% of it, and probe 13b showed no XLA-level
one-copy form wins.  `_rank_select_pallas_direct` fuses the skew INTO the
kernel — unpadded [n, x, yz] slabs stream through plain affine blocks and
one dynamic lane rotation (tpu.dynamic_rotate) aligns each slab to its
chunk frame in VMEM; validity is positional (no NaN pads).  This probe
(a) asserts the direct kernel bit-identical to the production skew-view
path ON HARDWARE (Mosaic lowering is exactly what interpret mode cannot
check), (b) measures rank-select alone and the full compact chain both
ways at the bench regime.

Writes bench_results/kernel_probe14.json.
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
    K = 16
    t32_np = np.full((n,), 2.6, np.float32)
    t32 = jax.device_put(jnp.asarray(t32_np), dev)
    seeds = [1400]

    def make_flat():
        seeds[0] += 1
        rng = np.random.default_rng(seeds[0])
        a = jax.device_put(
            rng.standard_normal((n, m)).astype(np.float32), dev)
        _ = np.asarray(a.ravel()[0])
        return a

    # ---- (a) hardware bitwise check, several geometries incl. odd dims
    bit = {}
    rng = np.random.default_rng(5)
    for mm, dd in [(64 ** 3, (64, 64, 64)), (24 * 32 * 16, (24, 32, 16)),
                   (128 ** 3, (128, 128, 128))]:
        assert cp.direct_ok(mm, dd), (mm, dd)
        nn = 4
        fl = rng.standard_normal((nn, mm)).astype(np.float32)
        fl[rng.random((nn, mm)) < 0.01] *= 100
        tt = np.full(nn, 5.0, np.float32)
        capm = int(np.ceil(0.02 * mm / 128) * 128)
        ref = cp.compact_fast(jnp.asarray(fl), jnp.asarray(tt), capm,
                              dims=dd, K=K, impl="pallas",
                              assemble="pallas")
        got = cp.compact_fast(jnp.asarray(fl), jnp.asarray(tt), capm,
                              dims=dd, K=K, impl="direct",
                              assemble="pallas")
        ref = [np.asarray(v) for v in ref]
        got = [np.asarray(v) for v in got]
        ok = bool(np.array_equal(got[0], ref[0])
                  and np.array_equal(got[3], ref[3]))
        for i in range(nn):
            k = min(int(ref[0][i]), capm)
            ok = ok and np.array_equal(got[1][i, :k], ref[1][i, :k]) \
                and np.array_equal(got[2][i, :k], ref[2][i, :k])
        bit[str(dd)] = ok
        print("bitwise", dd, ok, flush=True)
    out["bitwise_vs_pallas_on_hw"] = bit
    if not all(bit.values()):
        out["results"] = {"error": "bitwise mismatch - not measuring"}
        with open("bench_results/kernel_probe14.json", "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out, indent=2))
        return

    # ---- (b) rates: rank-select alone and the full chain, both impls
    carry = jnp.float32(1e-30)
    cases = {}

    def rank_many(impl):
        @functools.partial(jax.jit, static_argnums=1)
        def many(v, k):
            def body(i, u):
                if impl == "direct":
                    cnt, jloc, vc = cp._rank_select_pallas_direct(
                        u, t32, K, dims)
                else:
                    f3 = cp._skew_view(u, dims)
                    cnt, jloc, vc = cp._rank_select_pallas(f3, t32, K)
                return u + (jnp.sum(vc[:, 0, 0]) + jnp.sum(
                    cnt[:, 0]).astype(jnp.float32)) * carry
            return jax.lax.fori_loop(0, k, body, v)
        return many

    def chain_many(impl):
        @functools.partial(jax.jit, static_argnums=1)
        def many(v, k):
            def body(i, u):
                cnt, idxs, vals, over = cp.compact_fast(
                    u, t32, cap, dims=dims, ilv1_dims=dims, K=K,
                    impl=impl, assemble="pallas")
                return u + (jnp.sum(vals) + jnp.sum(cnt).astype(
                    jnp.float32) + jnp.sum(over).astype(
                    jnp.float32)) * carry
            return jax.lax.fori_loop(0, k, body, v)
        return many

    for name, fn in (("rank_select_skew", rank_many("pallas")),
                     ("rank_select_direct", rank_many("direct")),
                     ("chain_skew", chain_many("pallas")),
                     ("chain_direct", chain_many("direct"))):
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
    with open("bench_results/kernel_probe14.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
