"""Kernel experiment lab: close the fused-forward gap (142 -> 250+ GB/s).

Hypotheses (from the round-1 findings recorded in docs/ARCHITECTURE.md):
- the current fused kernels' transposes + pair-split reshapes cap them at
  ~86% of a packed-layout copy ceiling (~152 GB/s) while a (512, 4096) 2D
  copy hits 354 GB/s — DMA wants >= 4 KiB contiguous runs (lane dim >=
  1024 f32), which the L=128 packed layout can't give;
- an IN-PLACE INTERLEAVED Haar pass (out[2l] = (v[2l]+v[2l+1])/2,
  out[2l+1] = (v[2l]-v[2l+1])/2 — a roll + parity-select stencil) needs no
  transposes and no pair reshapes, so it works at ANY lane width and can
  be X-blocked (pairs are adjacent, they never straddle an even block
  boundary).  The low/high-halves deinterleave the archive order needs is
  a fixed per-axis index permutation, deferred to the host packer.

Each variant is timed cache-proof (fresh inputs, two-point fori_loop
slope, median of 3, 819 GB/s speed-of-light rejection).  Writes
bench_results/kernel_lab.json.  Run on the real TPU.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM = 819e9


def two_point(many_k, make_x, k1=8, k2=24, reps=3, traffic_mult=2.0,
              nbytes=None):
    import jax

    slopes = []
    for r in range(reps):
        x = make_x(r)
        t0 = time.perf_counter()
        jax.block_until_ready(many_k(x, k1))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(many_k(x, k2))
        tb = time.perf_counter() - t0
        dt = (tb - ta) / (k2 - k1)
        if nbytes and dt < nbytes * traffic_mult / HBM:
            continue
        slopes.append(dt)
    return float(np.median(slopes)) if slopes else float("nan")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from wavelet_tpu.runtime import debug

    debug.enable_compilation_cache()
    from wavelet_tpu.kernels import haar_pallas as hp

    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"run on TPU (got {dev.platform})"
    results = {}

    def bench(name, fn, shape, traffic_mult=2.0, **kw):
        nbytes = int(np.prod(shape)) * 4

        @functools.partial(jax.jit, static_argnums=1)
        def many(v, k):
            return jax.lax.fori_loop(0, k, lambda i, u: fn(u), v)

        def make_x(seed):
            r = np.random.default_rng(1234 + seed)
            arr = jax.device_put(
                r.standard_normal(shape).astype(np.float32), dev)
            jax.block_until_ready(arr)
            return arr

        jax.block_until_ready(many(make_x(99), 2))  # compile
        dt = two_point(many, make_x, nbytes=nbytes,
                       traffic_mult=traffic_mult, **kw)
        gbps = nbytes / 1e9 / dt
        results[name] = {"input_gbps": round(gbps, 2),
                         "shape": list(shape)}
        print(f"{name:46s} {gbps:8.2f} GB/s  {shape}", flush=True)
        return gbps

    # ---- in-place interleaved passes (stencil, no transposes) ----

    def _interleave_pass(v, axis):
        """out[2l] = (v[2l]+v[2l+1])/2 ; out[2l+1] = (v[2l]-v[2l+1])/2."""
        left = jnp.roll(v, -1, axis)       # partner of even positions
        right = jnp.roll(v, 1, axis)       # partner of odd positions
        n = v.shape[axis]
        parity = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis) % 2
        even_out = (v + left) * 0.5
        odd_out = (right - v) * 0.5
        return jnp.where(parity == 0, even_out, odd_out)

    def fwd_interleaved(v):
        # v: (bX, Y, L); Z, Y, X passes all in place
        t = _interleave_pass(v, 2)
        t = _interleave_pass(t, 1)
        return _interleave_pass(t, 0)

    # ---- variants ----

    n, d = 128, 64
    L128 = 128

    # current production kernel (reference point)
    pack = hp.lane_pack_factor((d, d, d))
    packed_shape = (n // pack, d, d, pack * d)
    bench("fused_forward_packed (current)",
          lambda v: hp.fused_forward_packed(v, pack)[0], packed_shape)

    # pure copy ceilings at different lane widths
    def make_copy_kernel(blk_shape, grid_m):
        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 1.0001

        def f(v):
            return pl.pallas_call(
                kern, grid=(grid_m,),
                in_specs=[pl.BlockSpec(blk_shape,
                                       lambda i: (i,) + (0,) * (len(blk_shape) - 1),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(blk_shape,
                                       lambda i: (i,) + (0,) * (len(blk_shape) - 1),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype))(v)
        return f

    total = n * d * d * d                       # elements
    for L in (128, 1024, 4096):
        rows = total // L
        blk_rows = max(1, (1 << 20) // (L * 4))
        while rows % blk_rows:
            blk_rows -= 1
        bench(f"pallas copy 2D L={L}",
              make_copy_kernel((blk_rows, L), rows // blk_rows),
              (rows, L))

    # interleaved stencil inside pallas at various widths, X-blocked
    def make_interleaved_kernel(b, x_b, y, L):
        def kern(x_ref, o_ref):
            o_ref[:] = fwd_interleaved(x_ref[:])

        def f(v):
            m = v.shape[0]
            return pl.pallas_call(
                kern, grid=(m // x_b,),
                in_specs=[pl.BlockSpec((x_b, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((x_b, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype))(v)
        return f

    # layout: rows = all boxes' X stacked; (X_total, Y, L) with P boxes on
    # lanes. X pass within one box needs pairs adjacent in the row axis —
    # adjacent rows of the same box, so x_b must divide X (64) evenly.
    for L, x_b in ((128, 8), (128, 16), (1024, 8), (2048, 4), (4096, 2)):
        P = L // d
        x_total = (n // P) * d
        if x_total % x_b:
            continue
        bench(f"interleaved fwd L={L} xb={x_b}",
              make_interleaved_kernel(1, x_b, d, L), (x_total, d, L))

    # the PRODUCTION interleaved path incl. fused max/min reductions
    for tl in (512, 1024, 2048):
        P = tl // d
        if n % P:
            continue
        shape = (n // P, d, d, P * d)
        bench(f"production fused_forward_interleaved L={tl}",
              lambda v, P=P: hp.fused_forward_interleaved(v, P)[0], shape)
        bench(f"production fused_inverse_interleaved L={tl}",
              hp.fused_inverse_interleaved, shape)

    # compiler hints on the interleaved kernel
    def make_interleaved_hinted(x_b, y, L, semantics):
        def kern(x_ref, o_ref):
            o_ref[:] = fwd_interleaved(x_ref[:])

        def f(v):
            m = v.shape[0]
            return pl.pallas_call(
                kern, grid=(m // x_b,),
                in_specs=[pl.BlockSpec((x_b, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((x_b, y, L), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(semantics,)))(v)
        return f

    for sem in ("parallel", "arbitrary"):
        try:
            bench(f"interleaved fwd L=1024 hint={sem}",
                  make_interleaved_hinted(8, d, 1024, sem),
                  ((n // 16) * d, d, 1024))
        except Exception as e:  # noqa: BLE001
            print(f"hint={sem} failed: {e}")

    # halves packed kernel with a bigger block target (4 MiB)
    try:
        import wavelet_tpu.kernels.haar_pallas as hp2
        orig = hp2.block_rows

        def big_rows(x, y, L, m=None, target_bytes=4 << 20):
            return orig(x, y, L, m, target_bytes)

        hp2.block_rows = big_rows
        hp2._fused_forward_packed_call.clear_cache()
        bench("fused_forward_packed 4MiB blocks",
              lambda v: hp2.fused_forward_packed(v, pack)[0], packed_shape)
        hp2.block_rows = orig
        hp2._fused_forward_packed_call.clear_cache()
    except Exception as e:  # noqa: BLE001
        print(f"4MiB variant failed: {e}")

    # interleaved via plain XLA (no pallas) — does XLA fuse rolls well?
    bench("interleaved fwd XLA L=1024",
          jax.jit(fwd_interleaved), ((n // 16) * d, d, 1024))
    bench("interleaved fwd XLA packedL128",
          jax.jit(fwd_interleaved), ((n // 2) * d, d, 128))

    # XLA elementwise reference (the 384 GB/s ceiling claim)
    bench("xla elementwise x*1.0001", jax.jit(lambda v: v * 1.0001),
          (n, d, d, d))

    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/kernel_lab.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
