"""Probe 13b: faster skew-view construction for the sparse compact.

Probe 13 attributed 27% of the compact chain to `_skew_view` alone
(81 GB/s): it is TWO separate jnp.pad copies (slab pad, then tail pad),
each a full read+write pass.  Candidates measured here, all asserted
bitwise-identical to the current view:

  A. current: jnp.pad(axis2) -> reshape -> jnp.pad(tail)
  B. fill+set: one NaN jnp.full, then per-slab .at[].set straight from
     the UNPADDED flat (XLA lowers the chain to in-place dynamic-update
     -slices: one fill write + one data read + one data write, no
     second full copy)
  C. fill+set-rows: like B but updating [n, x, yz] as one strided set
     via reshape trickery is impossible (w != yz), so B's per-slab loop
     is the one-copy form.

Writes bench_results/kernel_probe13b.json.
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


def skew_view_fill_set(flat, dims, c=cp.CHUNK):
    """One-copy skew view: NaN-fill the final buffer, then write each
    x-slab's yz run at its skewed offset (in-place DUS chain)."""
    n, m = flat.shape
    x, yz, w, cc, ct = cp._skew_params(m, dims, c)
    a3 = flat.reshape(n, x, yz)
    buf = jnp.full((n, cc * ct), jnp.nan, jnp.float32)
    for s in range(x):
        buf = jax.lax.dynamic_update_slice(buf, a3[:, s], (0, s * w))
    return buf.reshape(n, cc, ct)


def skew_view_fill_set_scan(flat, dims, c=cp.CHUNK):
    """Like fill_set but the slab loop is a lax.scan (compile-size-safe
    for large x; dynamic offsets s*w)."""
    n, m = flat.shape
    x, yz, w, cc, ct = cp._skew_params(m, dims, c)
    a3 = flat.reshape(n, x, yz)
    buf = jnp.full((n, cc * ct), jnp.nan, jnp.float32)

    def body(b, sv):
        s, v = sv
        return jax.lax.dynamic_update_slice(b, v, (0, s * w)), None

    buf, _ = jax.lax.scan(
        body, buf, (jnp.arange(x, dtype=jnp.int32),
                    jnp.moveaxis(a3, 1, 0)))
    return buf.reshape(n, cc, ct)


def main():
    out = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}
    dev = jax.devices()[0]
    out["platform"] = dev.platform

    d = 64
    n, m = 128, d ** 3
    dims = (d, d, d)
    nbytes = n * m * 4
    seeds = [900]

    def make_flat():
        seeds[0] += 1
        rng = np.random.default_rng(seeds[0])
        a = jax.device_put(
            rng.standard_normal((n, m)).astype(np.float32), dev)
        _ = np.asarray(a.ravel()[0])
        return a

    # bitwise equality of every variant vs the current view (NaN == NaN
    # by bit pattern: compare raw uint32 views)
    probe = np.asarray(jax.device_get(make_flat()))
    ref = np.asarray(jax.jit(
        lambda v: cp._skew_view(v, dims))(probe))
    for name, fn in (("fill_set", skew_view_fill_set),
                     ("fill_set_scan", skew_view_fill_set_scan)):
        got = np.asarray(jax.jit(
            functools.partial(fn, dims=dims))(probe))
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        np.testing.assert_array_equal(got.view(np.uint32),
                                      ref.view(np.uint32), err_msg=name)
    out["bitwise_equal"] = True
    print("bitwise OK", flush=True)

    carry = jnp.float32(1e-30)
    cases = {}

    def measure(name, view_fn):
        @functools.partial(jax.jit, static_argnums=1)
        def many(v, k):
            def body(i, u):
                f3 = view_fn(u, dims)
                return u + jnp.sum(f3[:, 0, 0]) * carry
            return jax.lax.fori_loop(0, k, body, v)

        try:
            _ = np.asarray(many(make_flat(), 2).ravel()[0])
            dt, spread = two_point(many, make_flat, 4, 16, nbytes)
            cases[name] = {"gbps": round(nbytes / 1e9 / dt, 3) if dt
                           else None, "spread": spread}
        except Exception as e:  # noqa: BLE001
            cases[name] = {"error": str(e)[:300]}
        print(name, cases[name], flush=True)

    measure("current_two_pads", cp._skew_view)
    measure("fill_set", skew_view_fill_set)
    measure("fill_set_scan", skew_view_fill_set_scan)

    # the winner through the full compact chain (rank-select + assembly
    # + keysort unchanged) is measured by editing _skew_view and re-
    # running probe 13; here we at least chain fill_set inline
    from wavelet_tpu.runtime import engine  # noqa: F401

    cap = int(np.ceil(0.02 * m / 128) * 128)
    t32 = jax.device_put(jnp.full((n,), 2.6, jnp.float32), dev)

    def chain_with(view_fn):
        @functools.partial(jax.jit, static_argnums=1)
        def many(v, k):
            def body(i, u):
                f3 = view_fn(u, dims)
                cnt, jloc, vc = cp._rank_select_pallas(f3, t32, 16)
                C = f3.shape[2]
                offs = (jnp.cumsum(cnt, axis=1) - cnt).astype(jnp.float32)
                tt = jnp.concatenate(
                    [jloc.astype(jnp.float32), vc, offs[:, None, :]],
                    axis=1)
                idx, vals = cp._assemble_pallas(offs, tt, cap, C, 16)
                return u + (jnp.sum(vals) + jnp.sum(idx).astype(
                    jnp.float32)) * carry
            return jax.lax.fori_loop(0, k, body, v)
        return many

    for name, vf in (("chain_current", cp._skew_view),
                     ("chain_fill_set", skew_view_fill_set)):
        try:
            fn = chain_with(vf)
            _ = np.asarray(fn(make_flat(), 2).ravel()[0])
            dt, spread = two_point(fn, make_flat, 4, 16, nbytes)
            cases[name] = {"gbps": round(nbytes / 1e9 / dt, 3) if dt
                           else None, "spread": spread}
        except Exception as e:  # noqa: BLE001
            cases[name] = {"error": str(e)[:300]}
        print(name, cases[name], flush=True)

    out["shape"] = [n, d, d, d]
    out["results"] = cases
    with open("bench_results/kernel_probe13b.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
