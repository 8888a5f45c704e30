"""Probe 5: locate the pallas size knee; test slab-splitting + aliasing.

probe3/4: pallas copy runs ~355 GB/s input at 64 MiB total but ~163 at
>= 192 MiB (any DMA strategy, any block size, power-of-2 or not), while
plain XLA elementwise holds ~325 at 256 MiB.  Here:
- sweep 64..256 MiB to find the knee;
- XLA eltwise at 64 MiB (is the fast regime pallas-specific?);
- SLAB SPLIT: one jit that runs the pallas copy as sequential
  pallas_calls over 64 MiB slices of a 256 MiB array — if the slow mode
  is per-call working-set size, this recovers the fast rate and is
  directly deployable in the production kernels;
- aliased (in-place) pallas copy with a donation-safe harness.

Run on the real TPU: /opt/venv/bin/python scripts/kernel_probe5.py
Writes bench_results/kernel_probe5.json.
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
            x = sync(many(x, k1))       # compile k1 (consumes x if donated)
            x = sync(many(x, k2))       # compile k2
        except Exception as e:  # noqa: BLE001
            print(f"{name:52s} FAILED: {str(e)[:120]}", flush=True)
            results[name] = {"input_gbps": None,
                             "error": str(e)[:300], "shape": list(shape)}
            return None
        slopes = []
        for _ in range(reps):
            t0 = time.perf_counter()
            x = sync(many(x, k1))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            x = sync(many(x, k2))
            tb = time.perf_counter() - t0
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
    xb = (1 << 20) // (L * 4)

    def copy_call(v, aliased=False):
        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 1.0001

        return pl.pallas_call(
            kern, grid=(v.shape[0] // xb,),
            in_specs=[pl.BlockSpec((xb, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((xb, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            input_output_aliases={0: 0} if aliased else {},
            compiler_params=PAR)(v)

    # knee sweep
    for mib in (64, 96, 128, 160, 192, 256):
        rows = (mib << 18) // L
        bench(f"pallas copy {mib}MiB", copy_call, (rows, L))

    # XLA at 64 MiB
    bench("xla eltwise 64MiB", jax.jit(lambda v: v * 1.0001),
          ((64 << 18) // L, L))
    bench("xla eltwise 256MiB", jax.jit(lambda v: v * 1.0001),
          ((256 << 18) // L, L))

    # slab split: 256 MiB processed as 4 sequential 64 MiB pallas_calls
    def slab_copy(n_slabs):
        def f(v):
            rows = v.shape[0]
            s = rows // n_slabs
            outs = [copy_call(jax.lax.slice_in_dim(v, i * s, (i + 1) * s))
                    for i in range(n_slabs)]
            return jnp.concatenate(outs, axis=0)
        return f

    rows256 = (256 << 18) // L
    for n_slabs in (2, 4, 8):
        bench(f"pallas copy 256MiB as {n_slabs} slabs",
              slab_copy(n_slabs), (rows256, L))

    # aliased in-place copy, donation-safe harness
    for mib in (64, 256):
        rows = (mib << 18) // L
        bench(f"pallas copy {mib}MiB aliased",
              functools.partial(copy_call, aliased=True), (rows, L),
              donate=True)

    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/kernel_probe5.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
