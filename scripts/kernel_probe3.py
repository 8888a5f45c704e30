"""Probe 3: where does the pallas 163 GB/s wall come from?

kernel_probe2 (scalar-fetch sync, chained fresh inputs) showed EVERY
pallas_call variant — pure copy, Haar stencil, full forward with
reductions — saturating at ~160-165 GB/s input rate (~326 GB/s HBM
traffic), independent of block size (1-4 MiB) and lane width (512-4096).
Meanwhile bench.py's mask stage (plain XLA elementwise) measured ~329
GB/s input (~658 GB/s traffic) with the same sync methodology.

Hypotheses tested here:
A. XLA elementwise really does ~2x the pallas traffic (re-measure copy,
   mask, and one roll+parity stencil pass in plain XLA, proper sync).
B. The pallas wall is the automatic BlockSpec pipeline's DMA depth —
   test manual DMA variants: one whole-array HBM->HBM copy, chunked
   HBM->HBM with K outstanding copies, and a manually double-buffered
   HBM->VMEM->HBM staging kernel with 2 and 4 buffers.
C. Rule out a fixed per-fori-iteration cost: repeat the pallas copy at
   64 MiB and 512 MiB totals — a fixed cost would show as
   size-dependent rate; a bandwidth wall is size-independent.

Run on the real TPU: /opt/venv/bin/python scripts/kernel_probe3.py
Writes bench_results/kernel_probe3.json.
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

    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"run on TPU (got {dev.platform})"
    results = {}
    PAR = pltpu.CompilerParams(dimension_semantics=("parallel",))

    def bench(name, fn, shape, traffic_mult=2.0, k1=8, k2=56, reps=7):
        nbytes = int(np.prod(shape)) * 4

        @functools.partial(jax.jit, static_argnums=1)
        def many(v, k):
            return jax.lax.fori_loop(0, k, lambda i, u: fn(u), v)

        def sync(arr):
            np.asarray(arr.ravel()[0])   # the only reliable axon barrier
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

    # ---------------- A. plain-XLA rates ----------------
    total = 64 << 20                       # 256 MiB f32
    shp = (total // 1024, 1024)
    bench("xla eltwise x*1.0001", jax.jit(lambda v: v * 1.0001), shp)
    bench("xla mask where(|u|>t)", jax.jit(
        lambda v: jnp.where(jnp.abs(v) > 0.5, v, jnp.zeros_like(v))), shp)

    def xla_one_pass(v):
        left = jnp.roll(v, -1, 1)
        right = jnp.roll(v, 1, 1)
        parity = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) % 2
        return jnp.where(parity == 0, (v + left) * 0.5, (right - v) * 0.5)

    bench("xla 1-axis roll stencil", jax.jit(xla_one_pass), shp)

    # ---------------- C. pallas copy, size scaling ----------------
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

    xb = (1 << 20) // (1024 * 4)
    for mib_total in (64, 256, 512):
        rows = (mib_total << 18) // 1024
        bench(f"pallas copy {mib_total}MiB total", copy_kernel(xb, 1024),
              (rows, 1024))

    # ---------------- B. manual DMA variants ----------------
    L = 1024
    rows = total // L                       # 256 MiB

    def hbm2hbm_whole(v):
        def kern(x_ref, o_ref, sem):
            dma = pltpu.make_async_copy(x_ref, o_ref, sem)
            dma.start()
            dma.wait()

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        )(v)

    bench("manual dma hbm->hbm whole-array", hbm2hbm_whole, (rows, L),
          traffic_mult=2.0)

    def hbm2hbm_chunked(n_out, chunk_rows):
        n_chunks = rows // chunk_rows

        def kern(x_ref, o_ref, sems):
            def body(i, _):
                slot = jax.lax.rem(i, n_out)

                @pl.when(i >= n_out)
                def _():
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds((i - n_out) * chunk_rows,
                                       chunk_rows)],
                        o_ref.at[pl.ds((i - n_out) * chunk_rows,
                                       chunk_rows)],
                        sems.at[slot]).wait()

                pltpu.make_async_copy(
                    x_ref.at[pl.ds(i * chunk_rows, chunk_rows)],
                    o_ref.at[pl.ds(i * chunk_rows, chunk_rows)],
                    sems.at[slot]).start()
                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)
            def tail(i, _):
                slot = jax.lax.rem(n_chunks - n_out + i, n_out)
                pltpu.make_async_copy(
                    x_ref.at[pl.ds((n_chunks - n_out + i) * chunk_rows,
                                   chunk_rows)],
                    o_ref.at[pl.ds((n_chunks - n_out + i) * chunk_rows,
                                   chunk_rows)],
                    sems.at[slot]).wait()
                return 0
            jax.lax.fori_loop(0, min(n_out, n_chunks), tail, 0)

        def f(v):
            return pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                scratch_shapes=[pltpu.SemaphoreType.DMA((n_out,))],
            )(v)
        return f

    for n_out in (2, 4, 8):
        bench(f"manual dma hbm->hbm chunked x{n_out} outstanding",
              hbm2hbm_chunked(n_out, (1 << 20) // (L * 4)), (rows, L))

    def staged_double_buffered(n_buf, chunk_rows):
        n_chunks = rows // chunk_rows

        def kern(x_ref, o_ref):
            def body(scratch, in_sems, out_sems):
                def get_in(slot, i):
                    return pltpu.make_async_copy(
                        x_ref.at[pl.ds(i * chunk_rows, chunk_rows)],
                        scratch.at[slot], in_sems.at[slot])

                def get_out(slot, i):
                    return pltpu.make_async_copy(
                        scratch.at[slot],
                        o_ref.at[pl.ds(i * chunk_rows, chunk_rows)],
                        out_sems.at[slot])

                for s in range(n_buf):
                    get_in(s, s).start()

                def loop(i, _):
                    slot = jax.lax.rem(i, n_buf)
                    get_in(slot, i).wait()

                    @pl.when(i >= n_buf)
                    def _():
                        get_out(slot, i - n_buf).wait()
                    scratch[slot] = scratch[slot] * 1.0001
                    get_out(slot, i).start()

                    @pl.when(i + n_buf < n_chunks)
                    def _():
                        get_in(slot, i + n_buf).start()
                    return 0

                jax.lax.fori_loop(0, n_chunks, loop, 0)

                def tail(i, _):
                    j = jnp.maximum(0, n_chunks - n_buf) + i
                    @pl.when(j < n_chunks)
                    def _():
                        get_out(jax.lax.rem(j, n_buf), j).wait()
                    return 0
                jax.lax.fori_loop(0, min(n_buf, n_chunks), tail, 0)

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((n_buf, chunk_rows, L), jnp.float32),
                in_sems=pltpu.SemaphoreType.DMA((n_buf,)),
                out_sems=pltpu.SemaphoreType.DMA((n_buf,)),
            )

        def f(v):
            return pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            )(v)
        return f

    for n_buf in (2, 4):
        bench(f"staged vmem copy x{n_buf} buffers (manual)",
              staged_double_buffered(n_buf, (1 << 20) // (L * 4)),
              (rows, L))

    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/kernel_probe3.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
