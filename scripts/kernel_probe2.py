"""Round-2b kernel probe: block-size / lane-width sweep + cheaper reductions.

Open questions after the (noise-contaminated) kernel_lab run:
1. What is the TRUE copy ceiling with dimension_semantics=("parallel",)
   at wide lanes?  (The lab's copy kernels lacked the hint.)
2. Does a bigger VMEM block target (2/4 MiB vs the production 1 MiB)
   lift the interleaved stencil?
3. Do the fused extrema reductions get cheaper when max and min share ONE
   output tile (sublanes 0-3 = max, 4-7 = min) instead of two separate
   (1, 8, L) outputs?  (Measured cost of the current pair: ~16%.)
4. Wider lanes: L=2048/4096 previously produced NaN under tunnel noise.

Methodology: fresh inputs per rep, device-side fori_loop chaining,
two-point slope (K=8 vs 24), median of 5, reject any rep implying >819
GB/s HBM traffic (v5e speed of light).  Run on the real TPU:

    /opt/venv/bin/python scripts/kernel_probe2.py

Writes bench_results/kernel_probe2.json.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM = 819e9


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from wavelet_tpu.runtime import debug

    debug.enable_compilation_cache()
    import wavelet_tpu.kernels.haar_pallas as hp

    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"run on TPU (got {dev.platform})"
    results = {}
    PAR = pltpu.CompilerParams(dimension_semantics=("parallel",))

    def bench(name, fn, shape, traffic_mult=2.0, k1=8, k2=56, reps=7):
        """Fresh-input two-point slopes WITHOUT per-rep uploads: each rep's
        input is the previous rep's k2-call OUTPUT (already on device, and
        byte-distinct from every earlier input, so the axon execution cache
        cannot serve it).  Uploading 256 MiB through the tunnel per rep
        costs more wall clock than the measurement itself and amplifies
        round-trip jitter; a 48-iteration delta keeps the real compute well
        above that jitter."""
        nbytes = int(np.prod(shape)) * 4

        @functools.partial(jax.jit, static_argnums=1)
        def many(v, k):
            return jax.lax.fori_loop(0, k, lambda i, u: fn(u), v)

        def sync(arr):
            # block_until_ready does NOT block through the axon tunnel;
            # fetching a scalar is the only reliable completion barrier
            # (same trick as bench.py)
            np.asarray(arr.ravel()[0])
            return arr

        r = np.random.default_rng(1234)
        try:
            x = sync(jax.device_put(
                r.standard_normal(shape).astype(np.float32), dev))
            sync(many(x, k1))   # compile both programs
            x = sync(many(x, k2))  # timed calls never see a warmup input
        except Exception as e:  # noqa: BLE001
            print(f"{name:52s} FAILED: {str(e)[:120]}", flush=True)
            results[name] = {"input_gbps": None,
                             "error": str(e)[:300], "shape": list(shape)}
            return None
        slopes = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(many(x, k1))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = sync(many(x, k2))
            tb = time.perf_counter() - t0
            x = out                      # fresh bytes for the next rep
            dt = (tb - ta) / (k2 - k1)
            if dt < nbytes * traffic_mult / HBM:
                continue           # faster than the hardware: cache-served
            slopes.append(dt)
        if not slopes:
            results[name] = {"input_gbps": float("nan"), "reps_kept": 0,
                             "shape": list(shape)}
            print(f"{name:52s}      nan GB/s  (reps 0)  {shape}", flush=True)
            return None
        dt = float(np.median(slopes))
        nrep = len(slopes)
        gbps = nbytes / 1e9 / dt
        results[name] = {"input_gbps": round(gbps, 2), "reps_kept": nrep,
                         "spread_gbps": [round(nbytes / 1e9 / max(slopes), 2),
                                         round(nbytes / 1e9 / min(slopes), 2)],
                         "shape": list(shape)}
        print(f"{name:52s} {gbps:8.2f} GB/s  (reps {nrep})  {shape}",
              flush=True)
        return gbps

    # ------------------------------------------------------------------
    # 1. copy ceilings WITH the parallel hint
    # ------------------------------------------------------------------
    def copy_kernel(xb, L):
        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 1.0001

        def f(v):
            return pl.pallas_call(
                kern, grid=(v.shape[0] // xb,),
                in_specs=[pl.BlockSpec((xb, L), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((xb, L), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                compiler_params=PAR)(v)
        return f

    total = 64 << 20          # 256 MiB of f32
    for L in (1024, 4096):
        rows = total // L
        for mib in (1, 2, 4):
            xb = (mib << 20) // (L * 4)
            if rows % xb:
                continue
            bench(f"copy+hint L={L} blk={mib}MiB", copy_kernel(xb, L),
                  (rows, L))

    # ------------------------------------------------------------------
    # 2. interleaved stencil (no reductions) — block-size / lane sweep
    # ------------------------------------------------------------------
    y = 64

    def stencil_kernel(xb, L):
        def kern(x_ref, o_ref):
            o_ref[:] = hp._fwd_interleaved_block(x_ref[:])

        def f(v):
            return pl.pallas_call(
                kern, grid=(v.shape[0] // xb,),
                in_specs=[pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                compiler_params=PAR)(v)
        return f

    for L in (512, 1024, 2048, 4096):
        rows = total // (y * L)
        for mib in (1, 2, 4):
            xb = max(2, (mib << 20) // (y * L * 4))
            if rows % xb or xb % 2:
                continue
            bench(f"stencil L={L} blk~{mib}MiB xb={xb}",
                  stencil_kernel(xb, L), (rows, y, L))

    # ------------------------------------------------------------------
    # 3. reductions: current dual outputs vs combined single tile
    # ------------------------------------------------------------------
    L = 1024
    rows = total // (y * L)

    def fwd_dual(xb):
        def kern(x_ref, o_ref, mx_ref, mn_ref):
            c = hp._fwd_interleaved_block(x_ref[:])
            o_ref[:] = c
            mx_ref[0] = jnp.broadcast_to(jnp.max(c, axis=(0, 1)), (8, L))
            mn_ref[0] = jnp.broadcast_to(jnp.min(c, axis=(0, 1)), (8, L))

        def f(v):
            g = v.shape[0] // xb
            c, _, _ = pl.pallas_call(
                kern, grid=(g,),
                in_specs=[pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=(
                    pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)),
                out_shape=(
                    jax.ShapeDtypeStruct(v.shape, v.dtype),
                    jax.ShapeDtypeStruct((g, 8, L), v.dtype),
                    jax.ShapeDtypeStruct((g, 8, L), v.dtype)),
                compiler_params=PAR)(v)
            return c
        return f

    def fwd_combined(xb):
        # ONE (1, 8, L) extrema tile per block: sublanes 0-3 carry the
        # max (repeated), 4-7 the min — half the reduction write traffic
        # and one fewer output stream than the dual variant.
        def kern(x_ref, o_ref, ext_ref):
            c = hp._fwd_interleaved_block(x_ref[:])
            o_ref[:] = c
            mx = jnp.broadcast_to(jnp.max(c, axis=(0, 1)), (4, L))
            mn = jnp.broadcast_to(jnp.min(c, axis=(0, 1)), (4, L))
            ext_ref[0] = jnp.concatenate([mx, mn], axis=0)

        def f(v):
            g = v.shape[0] // xb
            c, _ = pl.pallas_call(
                kern, grid=(g,),
                in_specs=[pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=(
                    pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)),
                out_shape=(
                    jax.ShapeDtypeStruct(v.shape, v.dtype),
                    jax.ShapeDtypeStruct((g, 8, L), v.dtype)),
                compiler_params=PAR)(v)
            return c
        return f

    for mib in (1, 2, 4):
        xb = max(2, (mib << 20) // (y * L * 4))
        if rows % xb or xb % 2:
            continue
        bench(f"fwd dual-red blk~{mib}MiB xb={xb}", fwd_dual(xb),
              (rows, y, L))
        bench(f"fwd combined-red blk~{mib}MiB xb={xb}", fwd_combined(xb),
              (rows, y, L))

    # ------------------------------------------------------------------
    # 4. inverse stencil at the same sweep points
    # ------------------------------------------------------------------
    def inv_kernel(xb, L):
        def kern(x_ref, o_ref):
            o_ref[:] = hp._inv_interleaved_block(x_ref[:])

        def f(v):
            return pl.pallas_call(
                kern, grid=(v.shape[0] // xb,),
                in_specs=[pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((xb, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                compiler_params=PAR)(v)
        return f

    for mib in (1, 2):
        xb = max(2, (mib << 20) // (y * 1024 * 4))
        rows = total // (y * 1024)
        if rows % xb or xb % 2:
            continue
        bench(f"inv stencil blk~{mib}MiB xb={xb}", inv_kernel(xb, 1024),
              (rows, y, 1024))

    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/kernel_probe2.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
