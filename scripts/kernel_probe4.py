"""Probe 4: is the pallas 163 GB/s wall an in-place/aliasing effect?

probe3 findings: at 256 MiB, plain-XLA elementwise sustains ~650 GB/s of
HBM traffic while EVERY pallas variant (auto pipeline, manual DMA, any
block size) caps at ~326; yet the same pallas copy at 64 MiB total hits
~710.  The XLA loop body runs IN PLACE (the fori_loop carry is donated,
so XLA reuses one buffer); pallas writes a distinct output buffer.
Hypothesis: separate in/out streams at large power-of-2 sizes halve the
achievable bandwidth (channel phase aliasing or write-allocate traffic),
and ``input_output_aliases`` should recover the XLA rate.

Run on the real TPU: /opt/venv/bin/python scripts/kernel_probe4.py
Writes bench_results/kernel_probe4.json.
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

    def bench(name, fn, shape, traffic_mult=2.0, k1=8, k2=56, reps=7,
              donate=False):
        nbytes = int(np.prod(shape)) * 4

        @functools.partial(jax.jit, static_argnums=1,
                           donate_argnums=(0,) if donate else ())
        def many(v, k):
            return jax.lax.fori_loop(0, k, lambda i, u: fn(u), v)

        def sync(arr):
            np.asarray(arr.ravel()[0])
            return arr

        r = np.random.default_rng(1234)
        try:
            x = sync(jax.device_put(
                r.standard_normal(shape).astype(np.float32), dev))
            sync(many(x, k1))
            x = sync(many(x, k2))
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
            x = out
            dt = (tb - ta) / (k2 - k1)
            if dt < nbytes * traffic_mult / HBM:
                continue
            slopes.append(dt)
        if not slopes:
            results[name] = {"input_gbps": float("nan"), "reps_kept": 0,
                             "shape": list(shape)}
            print(f"{name:52s}      nan GB/s  (reps 0)  {shape}", flush=True)
            return None
        dt = float(np.median(slopes))
        gbps = nbytes / 1e9 / dt
        results[name] = {
            "input_gbps": round(gbps, 2), "reps_kept": len(slopes),
            "spread_gbps": [round(nbytes / 1e9 / max(slopes), 2),
                            round(nbytes / 1e9 / min(slopes), 2)],
            "shape": list(shape)}
        print(f"{name:52s} {gbps:8.2f} GB/s  (reps {len(slopes)})  {shape}",
              flush=True)
        return gbps

    L = 1024
    y = 64

    def copy_kernel(xb, aliased):
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
                input_output_aliases={0: 0} if aliased else {},
                compiler_params=PAR)(v)
        return f

    xb = (1 << 20) // (L * 4)
    for mib_total in (256, 512):
        rows = (mib_total << 18) // L
        bench(f"pallas copy {mib_total}MiB aliased",
              copy_kernel(xb, True), (rows, L), donate=True)

    # non-power-of-2 total, NOT aliased: distinguishes channel-phase
    # aliasing (would recover) from write-allocate-style overhead (would
    # not)
    rows_np2 = ((192 << 18) // L)
    bench("pallas copy 192MiB not aliased", copy_kernel(xb, False),
          (rows_np2, L))
    rows_np2 = ((320 << 18) // L)
    bench("pallas copy 320MiB not aliased", copy_kernel(xb, False),
          (rows_np2, L))

    # the full interleaved forward stencil, aliased, 256 MiB
    def stencil_kernel(xb3, aliased):
        def kern(x_ref, o_ref):
            o_ref[:] = hp._fwd_interleaved_block(x_ref[:])

        def f(v):
            return pl.pallas_call(
                kern, grid=(v.shape[0] // xb3,),
                in_specs=[pl.BlockSpec((xb3, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((xb3, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                input_output_aliases={0: 0} if aliased else {},
                compiler_params=PAR)(v)
        return f

    rows3 = (256 << 18) // (y * L)
    xb3 = max(2, (1 << 20) // (y * L * 4))
    bench("stencil 256MiB aliased", stencil_kernel(xb3, True),
          (rows3, y, L), donate=True)

    # full production forward (reductions) with aliasing on the coeff out
    def fwd_red_aliased(xb3):
        def kern(x_ref, o_ref, mx_ref, mn_ref):
            c = hp._fwd_interleaved_block(x_ref[:])
            o_ref[:] = c
            mx_ref[0] = jnp.broadcast_to(jnp.max(c, axis=(0, 1)), (8, L))
            mn_ref[0] = jnp.broadcast_to(jnp.min(c, axis=(0, 1)), (8, L))

        def f(v):
            g = v.shape[0] // xb3
            c, _, _ = pl.pallas_call(
                kern, grid=(g,),
                in_specs=[pl.BlockSpec((xb3, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=(
                    pl.BlockSpec((xb3, y, L), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)),
                out_shape=(
                    jax.ShapeDtypeStruct(v.shape, v.dtype),
                    jax.ShapeDtypeStruct((g, 8, L), v.dtype),
                    jax.ShapeDtypeStruct((g, 8, L), v.dtype)),
                input_output_aliases={0: 0},
                compiler_params=PAR)(v)
            return c
        return f

    bench("fwd+reductions 256MiB aliased", fwd_red_aliased(xb3),
          (rows3, y, L), donate=True)

    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/kernel_probe4.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
