"""Probe 7: block-size sweep on the ALIASED interleaved stencils.

Round-2 finding (kernel_probe3-5): separate-output pallas kernels cap at
~163 GB/s input past ~96 MiB/buffer; input_output_aliases + donation
sustains ~325 GB/s at any size.  All production kernels now alias.  The
block target has stayed at 1 MiB since the (pre-aliasing) halves-kernel
sweep — this probe asks whether the aliased in-place stencils want wider
blocks (fewer grid steps, longer DMA bursts) and where the machine's
in-place ceiling actually is:

- aliased pure copy at xb targets 0.5/1/2/4/8 MiB (the ceiling);
- the production forward stencil pattern (roll+parity, no reductions) at
  the same targets;
- the inverse stencil pattern;
- the reduced forward (extrema outputs) at 1 vs 2 MiB.

All at a 256 MiB working set (the aliased regime covers all sizes), on the
production packed geometry (y=64, L=1024 -> 256 KiB contiguous rows).

Run on the real TPU: /opt/venv/bin/python scripts/kernel_probe7.py
Writes bench_results/kernel_probe7.json.
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

    from wavelet_tpu.kernels.haar_pallas import (_fwd_interleaved_block,
                                                 _inv_interleaved_block)
    from wavelet_tpu.runtime import debug

    debug.enable_compilation_cache()

    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"run on TPU (got {dev.platform})"
    results = {}
    PAR = pltpu.CompilerParams(dimension_semantics=("parallel",))

    Y, L = 64, 1024
    ROW = Y * L * 4                       # 256 KiB per x-row
    TOTAL_ROWS = (256 << 20) // ROW       # 256 MiB working set

    def bench(name, call, k1=8, k2=40, reps=7):
        shape = (TOTAL_ROWS, Y, L)
        nbytes = int(np.prod(shape)) * 4

        @functools.partial(jax.jit, static_argnums=1, donate_argnums=(0,))
        def many(v, k):
            return jax.lax.fori_loop(0, k, lambda i, u: call(u), v)

        def sync(arr):
            np.asarray(jax.tree_util.tree_leaves(arr)[0].ravel()[0])
            return arr

        r = np.random.default_rng(99)
        try:
            x = sync(jax.device_put(
                r.standard_normal(shape).astype(np.float32), dev))
            x = sync(many(x, k1))
            x = sync(many(x, k2))
        except Exception as e:  # noqa: BLE001
            print(f"{name:44s} FAILED: {str(e)[:140]}", flush=True)
            results[name] = {"input_gbps": None, "error": str(e)[:300]}
            return
        slopes = []
        for _ in range(reps):
            t0 = time.perf_counter()
            x = sync(many(x, k1))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            x = sync(many(x, k2))
            tb = time.perf_counter() - t0
            dt = (tb - ta) / (k2 - k1)
            if dt < nbytes * 2.0 / HBM:   # speed-of-light guard (2x traffic)
                continue
            slopes.append(dt)
        if not slopes:
            results[name] = {"input_gbps": float("nan"), "reps_kept": 0}
            print(f"{name:44s}      nan", flush=True)
            return
        dt = float(np.median(slopes))
        gbps = nbytes / 1e9 / dt
        results[name] = {
            "input_gbps": round(gbps, 2), "reps_kept": len(slopes),
            "spread_gbps": [round(nbytes / 1e9 / max(slopes), 2),
                            round(nbytes / 1e9 / min(slopes), 2)]}
        print(f"{name:44s} {gbps:8.2f} GB/s  (reps {len(slopes)})",
              flush=True)

    def aliased_call(kern_body, xb, n_out_rows=None):
        """pallas_call factory on (rows, Y, L) with (xb, Y, L) blocks,
        output aliased onto input."""
        def call(v):
            rows = v.shape[0]
            return pl.pallas_call(
                kern_body,
                grid=(rows // xb,),
                in_specs=[pl.BlockSpec((xb, Y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((xb, Y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                input_output_aliases={0: 0},
                compiler_params=PAR)(v)
        return call

    def copy_kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.0001

    def fwd_kern(x_ref, o_ref):
        o_ref[:] = _fwd_interleaved_block(x_ref[:], 1, seg=None)

    def inv_kern(c_ref, o_ref):
        o_ref[:] = _inv_interleaved_block(c_ref[:], 1, seg=None)

    # xb targets: rows per block (1 row = 256 KiB)
    for mib4 in (2, 4, 8, 16, 32):        # 0.5, 1, 2, 4, 8 MiB blocks
        xb = mib4
        label = f"{xb * ROW / (1 << 20):.1f}MiB"
        bench(f"aliased copy xb={label}", aliased_call(copy_kern, xb))
    for mib4 in (2, 4, 8, 16, 32):
        xb = mib4
        label = f"{xb * ROW / (1 << 20):.1f}MiB"
        bench(f"fwd stencil xb={label}", aliased_call(fwd_kern, xb))
    for mib4 in (4, 8, 16):
        xb = mib4
        label = f"{xb * ROW / (1 << 20):.1f}MiB"
        bench(f"inv stencil xb={label}", aliased_call(inv_kern, xb))

    # reduced forward (extrema tiles like production) at 1 vs 2 MiB
    def fwd_red_call(xb):
        def kern(x_ref, o_ref, maxv_ref, minv_ref):
            c = _fwd_interleaved_block(x_ref[:], 1, seg=None)
            o_ref[:] = c
            maxv_ref[0] = jnp.broadcast_to(jnp.max(c, axis=(0, 1)), (8, L))
            minv_ref[0] = jnp.broadcast_to(jnp.min(c, axis=(0, 1)), (8, L))

        def call(v):
            rows = v.shape[0]
            g = rows // xb
            c, _mx, _mn = pl.pallas_call(
                kern,
                grid=(g,),
                in_specs=[pl.BlockSpec((xb, Y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=(
                    pl.BlockSpec((xb, Y, L), lambda i: (i, 0, 0),
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
        return call

    for xb in (4, 8, 16):
        label = f"{xb * ROW / (1 << 20):.1f}MiB"
        bench(f"fwd+extrema xb={label}", fwd_red_call(xb))

    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/kernel_probe7.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
