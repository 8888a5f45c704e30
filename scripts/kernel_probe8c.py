"""Probe 8c: compact via single-key u32 sort.

The production argsort sorts a (bool key, int32 iota payload) pair; XLA's
variadic sort moves both operands through every comparator stage.  Packing
the mask into the TOP BIT of the index — key = idx | (!kept << 31) —
turns it into a single-u32 sort whose ascending order is exactly
"kept indices ascending, then non-kept ascending", halving the sorted
bytes.  Chunked variant composes with probe 8b's assembly.

Writes bench_results/kernel_probe8c.json.
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


@functools.partial(jax.jit, static_argnames=("cap",))
def compact_keysort(flat, t32, cap):
    m = flat.shape[1]
    mask = jnp.abs(flat) > t32[:, None]
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 1)
    keys = jnp.where(mask, iota, iota + jnp.int32(m))   # kept sort first
    idx = jax.lax.sort(keys, dimension=1)[:, :cap]
    idx = jnp.where(idx >= m, idx - m, idx)
    vals = jnp.take_along_axis(flat, idx, axis=1)
    return counts, idx.astype(jnp.int32), vals


@functools.partial(jax.jit, static_argnames=("cap", "c"))
def compact_keysort_chunked(flat, t32, cap, c=512):
    n, m = flat.shape
    C = m // c
    mask = jnp.abs(flat) > t32[:, None]
    mch = mask.reshape(n, C, c)
    cnt = jnp.sum(mch, axis=2, dtype=jnp.int32)
    counts = jnp.sum(cnt, axis=1)
    offs = jnp.cumsum(cnt, axis=1) - cnt
    iota = jax.lax.broadcasted_iota(jnp.int32, mch.shape, 2)
    keys = jnp.where(mch, iota, iota + jnp.int32(c))
    order = jax.lax.sort(keys, dimension=2)              # [n, C, c]
    order = jnp.where(order >= c, order - c, order)
    ks = jnp.arange(cap, dtype=jnp.int32)
    ch = (jnp.sum(offs[:, None, :] <= ks[None, :, None],
                  axis=2, dtype=jnp.int32) - 1)
    ch = jnp.clip(ch, 0, C - 1)
    loc = ks[None, :] - jnp.take_along_axis(offs, ch, axis=1)
    loc = jnp.clip(loc, 0, c - 1)
    j = jnp.take_along_axis(order.reshape(n, C * c), ch * c + loc, axis=1)
    idx = ch * c + j
    vals = jnp.take_along_axis(flat, idx, axis=1)
    return counts, idx.astype(jnp.int32), vals


def reference(flat, t32, cap):
    mask = jnp.abs(flat) > t32[:, None]
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    order = jnp.argsort(~mask, axis=1, stable=True)[:, :cap]
    vals = jnp.take_along_axis(flat, order, axis=1)
    return counts, order.astype(jnp.int32), vals


def check_equal(n=8, m=8192, cap=512, seed=3):
    rng = np.random.default_rng(seed)
    flat = rng.standard_normal((n, m)).astype(np.float32)
    sp = rng.random((n, m)) < 0.01
    flat[sp] *= 100
    t32 = np.full(n, 5.0, np.float32)
    ref = [np.asarray(x) for x in reference(flat, t32, cap)]
    for name, fn in (("keysort", compact_keysort),
                     ("keysort_chunked",
                      lambda f, t, c: compact_keysort_chunked(f, t, c, 512))):
        got = [np.asarray(x) for x in fn(flat, t32, cap)]
        np.testing.assert_array_equal(got[0], ref[0], err_msg=name)
        for i in range(n):
            k = min(int(ref[0][i]), cap)
            np.testing.assert_array_equal(got[1][i, :k], ref[1][i, :k],
                                          err_msg=f"{name} idx {i}")
            np.testing.assert_array_equal(got[2][i, :k], ref[2][i, :k],
                                          err_msg=f"{name} val {i}")
    return True


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

    cases = {
        "keysort": compact_keysort,
        "keysort_chunked_c512": lambda f, t, c: compact_keysort_chunked(
            f, t, c, 512),
        "keysort_chunked_c2048": lambda f, t, c: compact_keysort_chunked(
            f, t, c, 2048),
    }
    results = {}
    for name, fn in cases.items():
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
    with open("bench_results/kernel_probe8c.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
