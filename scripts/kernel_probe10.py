"""Probe 10: fused interleaved kernels at 256^3 and 512^3 on the chip.

The round-3 gate lift (engine._interleaved_block_ok) claims box size is
unbounded for the interleaved stencils — only the 2**scales-row minimum
block must fit VMEM.  tpu_smoke proves 128^3/256^3 bitwise; this probe
adds measured GB/s at 256^3 and runs a SINGLE 512^3 box (512 MiB — an
entire max-size AMReX domain as one box) bitwise vs the jnp oracle, plus
its rate.  Writes bench_results/kernel_probe10.json.
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

from wavelet_tpu.core import haar            # noqa: E402
from wavelet_tpu.kernels import haar_pallas as hp   # noqa: E402

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
    seeds = [400]

    def rate(dims, n):
        x, y, z = dims
        pack = hp.interleaved_pack_factor(dims)
        shape = (n // pack, x, y, pack * z)
        nbytes = n * x * y * z * 4

        @functools.partial(jax.jit, static_argnums=1)
        def many(v, k):
            return jax.lax.fori_loop(
                0, k, lambda i, u: hp.fused_forward_interleaved(u, pack)[0],
                v)

        def make_x():
            seeds[0] += 1
            rr = np.random.default_rng(seeds[0])
            a = jax.device_put(rr.standard_normal(shape).astype(np.float32),
                               dev)
            _ = np.asarray(a.ravel()[0])
            return a

        _ = np.asarray(many(make_x(), 2).ravel()[0])
        dt, spread = two_point(many, make_x, 4, 12, nbytes)
        return {"pack": pack, "packed_shape": list(shape),
                "nbytes": nbytes,
                "fwd_gbps": round(nbytes / 1e9 / dt, 3) if dt else None,
                "spread": spread}

    out["cube256_x4"] = rate((256, 256, 256), 4)
    print("cube256", out["cube256_x4"], flush=True)

    # single 512^3 box (512 MiB): bitwise vs the jnp oracle + rate
    dims = (512, 512, 512)
    rng = np.random.default_rng(7)
    box = rng.standard_normal(dims).astype(np.float32)
    ref = np.asarray(haar.haar3d_forward(jnp.asarray(box[None])))[0]
    got, mx, mn = hp.fused_forward_interleaved(
        jax.device_put(box[None], dev), 1)
    # interleaved layout -> logical order via the host walk the packer uses
    from wavelet_tpu.runtime import batching
    from wavelet_tpu.runtime.engine import CodecEngine

    eng = CodecEngine(use_pallas=True, layout="interleaved")
    assert eng.coeff_layout(dims) == "interleaved", "gate must admit 512^3"
    cb = batching.ShapeBatch(shape=dims, data=np.asarray(got), items=[
        batching.WorkItem(0, 0, 0, 0)], n_valid=1, pack=1,
        layout="interleaved", scales=1)
    logical = cb.item_view(0)
    bitwise = bool(np.array_equal(logical.reshape(-1).view(np.int32),
                                  ref.reshape(-1).view(np.int32)))
    extrema = bool(np.asarray(mx)[0] == ref.max()
                   and np.asarray(mn)[0] == ref.min())
    out["cube512_single_box"] = {"bitwise_vs_jnp": bitwise,
                                 "extrema_exact": extrema}
    print("cube512 bitwise:", bitwise, "extrema:", extrema, flush=True)
    assert bitwise and extrema
    out["cube512_x1_rate"] = rate((512, 512, 512), 1)
    print("cube512 rate", out["cube512_x1_rate"], flush=True)

    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/kernel_probe10.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
