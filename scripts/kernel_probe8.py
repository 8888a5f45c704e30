"""Probe 8: on-device sparsification (compact) strategies.

The sparse-transport compact step — keep-mask -> (counts, kept indices,
kept values) — measured 2.707 GB/s with the round-2 argsort design
(bench_tpu_r3_trial.json sparse_compact_stage), ~113x below the ~306 GB/s
dense forward stage.  The sort is overkill: compaction only needs, per
row, the ascending indices of kept elements, i.e. the inverse of the
kept-rank function — computable with a prefix sum plus a vectorized
binary search (all gathers, no sorts, no scatters; scatters measured 17x
worse than even the argsort in round 2).

Candidates, all bitwise-equal on the first ``count`` entries:
  A. argsort (round-2 production): stable argsort of ~mask floats kept
     indices to the front.
  B. cumsum + searchsorted: rank = cumsum(mask); the k-th kept index is
     searchsorted(rank, k+1) — cap * log2(m) gathered comparisons per row
     after an m-length scan.
  C. B with the prefix sum built on the MXU: reshape to 512-wide chunks,
     multiply by a lower-triangular ones matrix (exact in f32 for counts
     <= 2^24), tiny exclusive scan over chunk sums — in case XLA's native
     cumsum lowering is the bottleneck of B.

Usage: nohup /opt/venv/bin/python scripts/kernel_probe8.py &
Writes bench_results/kernel_probe8.json.
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

HBM_BYTES_PER_S = 819e9


# --- candidate A: production argsort (mirror of engine._compact_step) ----
@functools.partial(jax.jit, static_argnames=("cap",))
def compact_argsort(flat, t32, cap):
    mask = jnp.abs(flat) > t32[:, None]
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    order = jnp.argsort(~mask, axis=1, stable=True)[:, :cap]
    vals = jnp.take_along_axis(flat, order, axis=1)
    return counts, order.astype(jnp.int32), vals


# --- candidate B: cumsum + vectorized binary search ----------------------
@functools.partial(jax.jit, static_argnames=("cap",))
def compact_searchsorted(flat, t32, cap):
    m = flat.shape[1]
    mask = jnp.abs(flat) > t32[:, None]
    cum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    counts = cum[:, -1]
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)
    idxs = jax.vmap(
        lambda c: jnp.searchsorted(c, targets, side="left"))(cum)
    vals = jnp.take_along_axis(flat, jnp.minimum(idxs, m - 1), axis=1)
    # padding slots (k >= count) carry the sentinel m, like the host-side
    # pair padding convention (positions >= total are dropped)
    return counts.astype(jnp.int32), idxs.astype(jnp.int32), vals


# --- candidate C: B with an MXU prefix sum --------------------------------
def _cumsum_mxu(mask, chunk: int = 512):
    n, m = mask.shape
    c = min(chunk, m)
    f = mask.reshape(n, m // c, c).astype(jnp.float32)
    tril = jnp.tril(jnp.ones((c, c), jnp.float32))
    within = jax.lax.dot_general(
        f, tril, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # inclusive scan per chunk
    sums = within[:, :, -1]
    offs = jnp.cumsum(sums, axis=1) - sums       # exclusive over chunks
    return (within + offs[:, :, None]).reshape(n, m).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap",))
def compact_mxu(flat, t32, cap):
    m = flat.shape[1]
    mask = jnp.abs(flat) > t32[:, None]
    cum = _cumsum_mxu(mask)
    counts = cum[:, -1]
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)
    idxs = jax.vmap(
        lambda c: jnp.searchsorted(c, targets, side="left"))(cum)
    vals = jnp.take_along_axis(flat, jnp.minimum(idxs, m - 1), axis=1)
    return counts.astype(jnp.int32), idxs.astype(jnp.int32), vals


CANDIDATES = {"argsort": compact_argsort,
              "searchsorted": compact_searchsorted,
              "mxu_scan": compact_mxu}


def check_equal(n=8, m=4096, cap=256, seed=0):
    rng = np.random.default_rng(seed)
    flat = rng.standard_normal((n, m)).astype(np.float32)
    spikes = rng.random((n, m)) < 0.01
    flat[spikes] *= 100
    t32 = np.full(n, 5.0, np.float32)
    ref = [np.asarray(x) for x in compact_argsort(flat, t32, cap)]
    for name, fn in CANDIDATES.items():
        got = [np.asarray(x) for x in fn(flat, t32, cap)]
        np.testing.assert_array_equal(got[0], ref[0], err_msg=name)
        for i in range(n):
            k = min(int(ref[0][i]), cap)
            np.testing.assert_array_equal(got[1][i, :k], ref[1][i, :k],
                                          err_msg=f"{name} idx row {i}")
            np.testing.assert_array_equal(got[2][i, :k], ref[2][i, :k],
                                          err_msg=f"{name} val row {i}")
    return True


def two_point(fn, make_x, k1, k2, nbytes, reps=5):
    floor_dt = nbytes * 2.0 / HBM_BYTES_PER_S
    slopes = []
    dropped = 0
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
    check_equal()
    out["bitwise_equal_small"] = True
    dev = jax.devices()[0]
    out["platform"] = dev.platform

    n, m = 128, 64 ** 3
    cap = int(np.ceil(0.02 * m / 128) * 128)
    nbytes = n * m * 4
    t32 = jax.device_put(jnp.full((n,), 2.0, jnp.float32), dev)
    seeds = [0]

    def make_x():
        seeds[0] += 1
        rng = np.random.default_rng(seeds[0])
        flat = rng.standard_normal((n, m)).astype(np.float32)
        sp = rng.random((n, m)) < 0.01
        flat[sp] *= 100
        a = jax.device_put(flat, dev)
        _ = np.asarray(a.ravel()[0])
        return a

    results = {}
    for name, fn in CANDIDATES.items():
        @functools.partial(jax.jit, static_argnums=1)
        def many(v, k, fn=fn):
            def body(i, u):
                cnt, idxs, vals = fn(u, t32, cap)
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
    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/kernel_probe8.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
