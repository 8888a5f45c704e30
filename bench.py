"""Benchmark: device codec throughput on dense AMR blocks (one real chip).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

The headline metric is end-to-end *compress* throughput per chip on dense
[N, 64, 64, 64] float32 AMR blocks — forward 3D Haar + signed-absmax +
exact-parity thresholding/masking on device — measured against the
BASELINE.json north star of 10 GB/s/chip (the C++ reference publishes no
numbers and is serial CPU-only; see BASELINE.md).  Decompress (inverse
transform) throughput and the lossy round-trip RMSE are reported alongside
in "extra".
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from wavelet_tpu.core import haar, threshold

    dev = jax.devices()[0]
    platform = dev.platform

    # ~128 MiB of 64^3 blocks — representative dense AMR boxes
    n, d = 128, 64
    rng = np.random.default_rng(0)
    batch_np = rng.standard_normal((n, d, d, d)).astype(np.float32)
    nbytes = batch_np.nbytes
    keep = 0.999

    @jax.jit
    def fwd(batch):
        flat = haar.forward_flat(batch)
        return flat, threshold.signed_absmax(flat, axis=-1)

    @jax.jit
    def mask_apply(flat, t32):
        m = jnp.abs(flat) > t32[:, None]
        return jnp.where(m, flat, jnp.zeros_like(flat))

    @jax.jit
    def inv(flat):
        return haar.inverse_from_flat(flat, (d, d, d))

    batch = jax.device_put(batch_np, dev)

    def compress_once():
        flat, maxv = fwd(batch)
        t32 = threshold.exact_threshold32(np.asarray(maxv), keep)
        return mask_apply(flat, jax.device_put(jnp.asarray(t32), dev))

    # warmup / compile
    masked = compress_once()
    recon = inv(masked)
    jax.block_until_ready(recon)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        masked = compress_once()
    jax.block_until_ready(masked)
    t_compress = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    for _ in range(iters):
        recon = inv(masked)
    jax.block_until_ready(recon)
    t_decompress = (time.perf_counter() - t0) / iters

    gb = nbytes / 1e9
    compress_gbps = gb / t_compress
    decompress_gbps = gb / t_decompress
    roundtrip_gbps = gb / (t_compress + t_decompress)

    rmse = float(np.sqrt(np.mean(
        (np.asarray(recon, dtype=np.float64) - batch_np.astype(np.float64)) ** 2)))

    baseline = 10.0  # GB/s/chip north star (BASELINE.json)
    print(json.dumps({
        "metric": "compress_throughput_per_chip",
        "value": round(compress_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(compress_gbps / baseline, 3),
        "extra": {
            "platform": platform,
            "block_shape": [n, d, d, d],
            "bytes": nbytes,
            "decompress_gbps": round(decompress_gbps, 3),
            "roundtrip_gbps": round(roundtrip_gbps, 3),
            "keep": keep,
            "roundtrip_rmse": rmse,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
