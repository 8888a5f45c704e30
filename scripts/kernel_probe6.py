"""Probe 6: block-size sweep on the PRODUCTION interleaved kernels now
that in-place aliasing removed the large-working-set cliff.

probe3-5 established: separate-output pallas caps at ~163 GB/s input past
~96 MiB/buffer; `input_output_aliases` sustains ~325 at any size.  The
production `_x_block` target (1 MiB) was tuned pre-aliasing; this sweeps
targets on the real forward/inverse kernels at a 256 MiB working set to
see if larger blocks buy any of the remaining ~325 -> 410 GB/s headroom.

Run on the real TPU: /opt/venv/bin/python scripts/kernel_probe6.py
Writes bench_results/kernel_probe6.json.
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

    from wavelet_tpu.runtime import debug

    debug.enable_compilation_cache()

    from wavelet_tpu.kernels import haar_pallas as hp

    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"run on TPU (got {dev.platform})"
    results = {}

    def bench(name, fn, shape, traffic_mult=2.0, k1=8, k2=40, reps=7):
        nbytes = int(np.prod(shape)) * 4

        @functools.partial(jax.jit, static_argnums=1, donate_argnums=(0,))
        def many(v, k):
            return jax.lax.fori_loop(0, k, lambda i, u: fn(u), v)

        def sync(arr):
            np.asarray(arr.ravel()[0])
            return arr

        r = np.random.default_rng(1234)
        try:
            x = sync(jax.device_put(
                r.standard_normal(shape).astype(np.float32), dev))
            x = sync(many(x, k1))
            x = sync(many(x, k2))
        except Exception as e:  # noqa: BLE001
            print(f"{name:46s} FAILED: {str(e)[:140]}", flush=True)
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
            results[name] = {"input_gbps": float("nan"), "reps_kept": 0}
            print(f"{name:46s}      nan", flush=True)
            return None
        dt = float(np.median(slopes))
        gbps = nbytes / 1e9 / dt
        results[name] = {
            "input_gbps": round(gbps, 2), "reps_kept": len(slopes),
            "spread_gbps": [round(nbytes / 1e9 / max(slopes), 2),
                            round(nbytes / 1e9 / min(slopes), 2)],
            "shape": list(shape)}
        print(f"{name:46s} {gbps:8.2f} GB/s  (reps {len(slopes)})",
              flush=True)
        return gbps

    d = 64
    pack = hp.interleaved_pack_factor((d, d, d))
    n = 512 // pack * pack          # 256 MiB working set
    m = n // pack
    shape = (m, d, d, pack * d)

    def set_target(tb):
        hp._x_block.__defaults__ = (tb, 1)
        hp._fwd_interleaved_call.clear_cache()
        hp._fwd_interleaved_nored_call.clear_cache()
        hp._inv_interleaved_call.clear_cache()

    orig = hp._x_block.__defaults__
    try:
        for kib in (512, 1024, 2048, 4096):
            set_target(kib << 10)
            bench(f"fwd_interleaved target={kib}KiB",
                  lambda v: hp.fused_forward_interleaved(v, pack)[0], shape)
            bench(f"fwd_nored target={kib}KiB",
                  lambda v: hp.fused_forward_interleaved_nored(v, pack),
                  shape)
            bench(f"inv_interleaved target={kib}KiB",
                  lambda v: hp.fused_inverse_interleaved(v, pack), shape)
    finally:
        hp._x_block.__defaults__ = orig

    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/kernel_probe6.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
