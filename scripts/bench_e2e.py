"""One defensible END-TO-END compress GB/s/chip measurement (VERDICT r2 #3).

Measures the full pipeline — plotfile read -> device codec -> d2h ->
native pack (codec=raw) -> bundle write — on a tmpfs dataset >= 1 GiB at
64^3 and 128^3 box sizes, against the BASELINE.json north star whose
"compress time" semantics follow the reference (modes.cpp:97-109: the
timed region starts AFTER the data is in memory; the reference reads
everything in its preprocess phase).  Two variants per config:

- ``collected``: ``compress_collected`` on in-memory boxes — exactly the
  reference's compress-time window (read excluded);
- ``streaming``: ``compress_run`` through the real CLI path with
  ``prefetch=1`` (read included, overlapped).

This rig tunnels to its one v5e chip through axon at ~0.03-0.05 GB/s per
direction (measured below, interleaved in time with the pipeline runs) —
two to three orders of magnitude below a co-located PCIe/DMA host link —
so the raw wall number is ~95+% tunnel time.  The artifact therefore
records THREE numbers per row, most defensible first:

1. ``e2e_measured_gbps``: input bytes / wall seconds.  A true
   measurement; on this rig it is a measurement OF THE TUNNEL.
2. ``e2e_link_normalized_gbps``: input / (wall - transferred_bytes/bw),
   with an uncertainty band propagated from the link-bandwidth spread.
   When the link share of the wall exceeds ~80%, the subtraction is
   ill-conditioned and the band is reported wide — the artifact says so
   rather than publishing a point value as fact.
3. ``reconciliation``: predicted wall from independently measured stage
   rates (link bytes/bw + device stage at the bench.py rate + host pack
   at the host_codec.json rate + per-dispatch latency x dispatch count)
   vs the measured wall.  Agreement within ~20% is the evidence that the
   stage rates — and therefore the min(device, host_pack) co-located
   projection — describe this pipeline, not a model of it.

Usage: nohup /opt/venv/bin/python scripts/bench_e2e.py &
Writes bench_results/e2e_compress.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wavelet_tpu.runtime import debug

debug.enable_compilation_cache()

OUT = "bench_results/e2e_compress.json"
SHM = "/dev/shm/wtc_e2e"


def smooth_spiky_boxes(n_boxes: int, dim: int, seed: int):
    """~1%-kept boxes (the sparse design regime real AMR fields sit in,
    cf. measure_baseline.spiky_plotfile): smooth low-amplitude background
    + sparse strong positive spikes."""
    rng = np.random.default_rng(seed)
    out = np.empty((n_boxes, dim, dim, dim), np.float32)
    ax = np.arange(dim, dtype=np.float32)
    base = (np.sin(0.11 * ax)[:, None, None]
            + np.cos(0.07 * ax)[None, :, None] * np.sin(0.05 * ax)[None, None, :])
    for b in range(n_boxes):
        a = base * 1e-3 + rng.standard_normal((dim, dim, dim)).astype(np.float32) * 1e-3
        mask = rng.random((dim, dim, dim)) < 0.00125
        a[mask] = np.abs(rng.standard_normal(int(mask.sum()))).astype(np.float32) * 100
        a.flat[0] = 1000.0
        out[b] = a
    return out


def write_dataset(root: str, name: str, boxes: np.ndarray, dim: int):
    from wavelet_tpu.io import plotfile as pf

    n = boxes.shape[0]
    locs = [(b * dim, 0, 0) for b in range(n)]
    dims = [(dim, dim, dim)] * n
    pf.write_plotfile(os.path.join(root, name), [[bx[None] for bx in boxes]],
                      [locs], [dims], ["f"], 0.25, [0., 0., 0.],
                      [1., 1., 1.], (2, 2, 2), (n * dim, dim, dim), [60])


def measure_link(dev, mib: int = 128, reps: int = 3):
    """Tunnel bandwidths + per-dispatch latency, fresh buffers every rep
    (the axon layer caches repeated identical executions)."""
    import jax
    import jax.numpy as jnp

    h2d, d2h = [], []
    nbytes = mib << 20
    for rep in range(reps):
        arr = np.random.default_rng(1000 + rep).standard_normal(
            nbytes // 4).astype(np.float32)
        t0 = time.perf_counter()
        y = jax.device_put(arr, dev)
        y.block_until_ready()
        h2d.append(nbytes / (time.perf_counter() - t0))
        z = jnp.sin(y)        # fresh device-side content for the fetch
        z.block_until_ready()
        t0 = time.perf_counter()
        _ = np.asarray(z)
        d2h.append(nbytes / (time.perf_counter() - t0))
    f = jax.jit(lambda v: v + 1.0)
    lat = []
    for i in range(6):
        x = jax.device_put(np.float32(i), dev)
        t0 = time.perf_counter()
        _ = np.asarray(f(x))
        lat.append(time.perf_counter() - t0)
    lat = sorted(lat)[1:-1]   # drop warmup/outlier ends
    stat = lambda v: {"median": float(np.median(v)), "min": float(min(v)),
                      "max": float(max(v))}
    return {"h2d_bps": stat(h2d), "d2h_bps": stat(d2h),
            "dispatch_s": stat(lat), "probe_mib": mib, "reps": reps}


class _StageClock:
    """Instrument the pipeline's real stage times (cumulative wall inside
    each call) so the artifact carries a MEASURED decomposition, not just
    a model: `device_link` = compress_shapebatch (device_put + kernels +
    coefficient fetch, serial in the main loop), `pack` = HostPacker.pack
    (runs on the overlap worker), `prep` = plan_batches (host packing
    copies)."""

    def __init__(self):
        from wavelet_tpu.runtime import batching, engine

        self.t = {"device_link": 0.0, "pack": 0.0, "prep": 0.0}
        self._orig = (engine.CodecEngine.compress_shapebatch,
                      engine.HostPacker.pack, batching.plan_batches)
        self._mods = (engine, batching)

    def _wrap(self, key, fn):
        def timed(*a, **k):
            t0 = time.perf_counter()
            try:
                return fn(*a, **k)
            finally:
                self.t[key] += time.perf_counter() - t0
        return timed

    def __enter__(self):
        from wavelet_tpu.pipeline import compress as compress_mod
        from wavelet_tpu.runtime import batching, engine

        engine.CodecEngine.compress_shapebatch = self._wrap(
            "device_link", self._orig[0])
        engine.HostPacker.pack = self._wrap("pack", self._orig[1])
        batching.plan_batches = self._wrap("prep", self._orig[2])
        compress_mod.batching.plan_batches = batching.plan_batches
        self.t = {k: 0.0 for k in self.t}
        return self

    def __exit__(self, *exc):
        from wavelet_tpu.pipeline import compress as compress_mod
        from wavelet_tpu.runtime import batching, engine

        engine.CodecEngine.compress_shapebatch = self._orig[0]
        engine.HostPacker.pack = self._orig[1]
        batching.plan_batches = self._orig[2]
        compress_mod.batching.plan_batches = self._orig[2]
        return False

    def snapshot(self):
        return {k: round(v, 3) for k, v in self.t.items()}


class _DecompressClock:
    """In-run decompress stage decomposition (round-4 verdict item 3 —
    the compress rows had this since round 3, the decompress rows only
    had a rate model).  Cumulative busy seconds per stage:
    `unpack` = HostPacker.unpack_into/unpack_sparse (payload read + RLE
    decode; runs on the prefetch worker), `device_link` =
    CodecEngine.decompress_shapebatch[_sparse] (h2d put + inverse kernels
    + result fetch, serial in the main loop), `write` =
    plotfile.write_plotfile (prep + file write; on the prefetch worker).
    Stages overlap under prefetch=1, so the reconciliation model is
    max(host chain, device chain), not a sum."""

    def __init__(self):
        import threading

        from wavelet_tpu.io import plotfile
        from wavelet_tpu.runtime import engine

        self.t = {"unpack": 0.0, "device_link": 0.0, "write": 0.0}
        self._lock = threading.Lock()
        self._spec = [
            (engine.HostPacker, "unpack_into", "unpack"),
            (engine.HostPacker, "unpack_sparse", "unpack"),
            (engine.CodecEngine, "decompress_shapebatch", "device_link"),
            (engine.CodecEngine, "decompress_shapebatch_sparse",
             "device_link"),
            (plotfile, "write_plotfile", "write"),
        ]
        self._orig = [(obj, name, getattr(obj, name))
                      for obj, name, _key in self._spec]

    def _wrap(self, key, fn):
        def timed(*a, **k):
            t0 = time.perf_counter()
            try:
                return fn(*a, **k)
            finally:
                dt = time.perf_counter() - t0
                with self._lock:
                    self.t[key] += dt
        return timed

    def __enter__(self):
        for (obj, name, key), (_o, _n, fn) in zip(self._spec, self._orig):
            setattr(obj, name, self._wrap(key, fn))
        self.t = {k: 0.0 for k in self.t}
        return self

    def __exit__(self, *exc):
        for obj, name, fn in self._orig:
            setattr(obj, name, fn)
        return False

    def snapshot(self):
        return {k: round(v, 3) for k, v in self.t.items()}


def run_config(label: str, dim: int, n_boxes: int, n_times: int,
               link_before: dict, results: dict):
    import shutil

    from wavelet_tpu.pipeline import Config, common, compress_run
    from wavelet_tpu.pipeline import compress as compress_mod
    from wavelet_tpu.runtime import engine

    root = os.path.join(SHM, label)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    # distinct data per variant: the axon layer can serve repeated
    # identical (executable, input) device executions from a cache
    for t in range(n_times):
        write_dataset(os.path.join(root, "data_c"), f"plt{600 + t:05d}",
                      smooth_spiky_boxes(n_boxes, dim, seed=10 * t + 1), dim)
        write_dataset(os.path.join(root, "data_s"), f"plt{600 + t:05d}",
                      smooth_spiky_boxes(n_boxes, dim, seed=10 * t + 2), dim)
    input_bytes = n_times * n_boxes * dim ** 3 * 4
    row = {"dim": dim, "boxes_per_timestep": n_boxes, "timesteps": n_times,
           "input_bytes": input_bytes, "codec": "raw", "archive": "bundle",
           "keep": 0.999}

    # --- collected variant: reference compress-time semantics ------------
    t0 = time.perf_counter()
    run = common.collect_run(
        [os.path.join(root, "data_c", f"plt{600 + t:05d}")
         for t in range(n_times)], ["f"], [0])
    read_s = time.perf_counter() - t0
    packer = engine.HostPacker(payload="f32", codec="raw",
                               archive_format="bundle")
    os.makedirs(os.path.join(root, "arch_c"), exist_ok=True)
    with _StageClock() as clk_c:
        t0 = time.perf_counter()
        stats = compress_mod.compress_collected(
            run, 0.999, os.path.join(root, "arch_c") + os.sep,
            packer=packer)
        wall_c = time.perf_counter() - t0
    stats["measured_stage_seconds"] = clk_c.snapshot()
    del run
    row["read_standalone"] = {"seconds": round(read_s, 3),
                              "gbps": round(input_bytes / 1e9 / read_s, 3)}
    row["collected"] = {"wall_seconds": round(wall_c, 3), **stats}

    # --- streaming variant: the real CLI path, read included -------------
    cfg = Config(data_dir=os.path.join(root, "data_s"),
                 min_time=f"plt{600:05d}", max_time=f"plt{600 + n_times - 1:05d}",
                 min_level=0, max_level=0, components=["f"], keep=0.999,
                 compressed_dir=os.path.join(root, "arch_s") + os.sep,
                 codec="raw", archive="bundle", prefetch=1)
    with _StageClock() as clk_s:
        t0 = time.perf_counter()
        sstats = compress_run(cfg)
        wall_s = time.perf_counter() - t0
    sstats["measured_stage_seconds"] = clk_s.snapshot()
    row["streaming"] = {"wall_seconds": round(wall_s, 3), **sstats}

    # --- decompress e2e: archive -> device inverse -> plotfile write -----
    from wavelet_tpu.pipeline import decompress_run

    with _DecompressClock() as dclk:
        t0 = time.perf_counter()
        dstats = decompress_run(Config(
            compressed_dir=os.path.join(root, "arch_s") + os.sep,
            out_dir=os.path.join(root, "regen") + os.sep, prefetch=1,
            out_precision="f32"))
        dwall = time.perf_counter() - t0
    dstats["measured_stage_seconds"] = dclk.snapshot()
    row["decompress_streaming"] = {
        "wall_seconds": round(dwall, 3),
        "e2e_measured_gbps": round(input_bytes / 1e9 / dwall, 4),
        "outprec": "f32", **dstats}

    # --- link measured again AFTER (tunnel state drifts) -----------------
    import jax

    link_after = measure_link(jax.devices()[0])
    row["link_before"] = link_before
    row["link_after"] = link_after

    # --- normalization + reconciliation ----------------------------------
    host_pack_gbps = 12.9        # bench_results/host_codec.json, raw 4 thr
    device_gbps = results.get("device_stage_gbps", 164.0)
    # decompress moves BOTH directions: decoded coefficients h2d, then the
    # reconstructed boxes d2h before the plotfile write
    dlink = (dstats.get("host_to_device_bytes") or input_bytes,
             input_bytes)
    for variant, wall, st in (("collected", wall_c, stats),
                              ("streaming", wall_s, sstats),
                              ("decompress_streaming", dwall, dstats)):
        v = row[variant]
        if variant == "decompress_streaming":
            h2d_b, d2h = dlink
        else:
            h2d_b = input_bytes
            d2h = st.get("device_to_host_bytes", input_bytes)
        v["e2e_measured_gbps"] = round(input_bytes / 1e9 / wall, 4)
        lt = {}
        for tag, link in (("before", link_before), ("after", link_after)):
            lt[tag] = (h2d_b / link["h2d_bps"]["median"]
                       + d2h / link["d2h_bps"]["median"])
        link_s = float(np.mean([lt["before"], lt["after"]]))
        link_lo = min(h2d_b / lb["h2d_bps"]["max"]
                      + d2h / lb["d2h_bps"]["max"]
                      for lb in (link_before, link_after))
        link_hi = max(h2d_b / lb["h2d_bps"]["min"]
                      + d2h / lb["d2h_bps"]["min"]
                      for lb in (link_before, link_after))
        resid = wall - link_s
        v["link_seconds_est"] = {"mean": round(link_s, 2),
                                 "lo": round(link_lo, 2),
                                 "hi": round(link_hi, 2)}
        v["link_share_of_wall"] = round(link_s / wall, 3)
        norm = (input_bytes / 1e9 / resid) if resid > 0 else None
        # propagate the bandwidth spread through the subtraction
        lo = (input_bytes / 1e9 / (wall - link_lo)) if wall > link_lo else None
        hi = (input_bytes / 1e9 / (wall - link_hi)) if wall > link_hi else None
        v["e2e_link_normalized_gbps"] = {
            "point": round(norm, 3) if norm else None,
            "band_lo": round(lo, 3) if lo else None,
            "band_hi": round(hi, 3) if hi else None,
            "caveat": ("ill-conditioned: link is {:.0%} of wall; the band, "
                       "not the point, is the claim".format(link_s / wall)
                       if link_s / wall > 0.8 else "ok"),
        }
        # predicted wall from independently measured stage rates
        pack_s = input_bytes / 1e9 / host_pack_gbps
        dev_s = input_bytes / 1e9 / device_gbps
        disp = link_after["dispatch_s"]["median"]
        n_disp = 6 * n_times     # ~put+fwd+maxmin fetches per batch
        if variant != "decompress_streaming":
            pred = link_s + max(pack_s, dev_s) + n_disp * disp
            v["reconciliation"] = {
                "predicted_wall_s": round(pred, 2),
                "measured_wall_s": round(wall, 2),
                "agreement": round(pred / wall, 3),
                "model": ("link(mean of before/after bw) + max(host_pack@"
                          f"{host_pack_gbps} GB/s, device@{device_gbps} "
                          f"GB/s) + {n_disp} dispatches"),
            }
            v["projected_colocated_gbps"] = round(
                min(device_gbps, host_pack_gbps), 2)
        else:
            # decompress model: every stage now has a MEASURED rate
            # (round-3 verdict weak #3: the write term was missing) —
            # raw unpack warm (host_codec.json), plotfile write
            # (plotfile_io.json), device inverse (bench fused rate)
            rates = _decompress_stage_rates()
            host_s = (input_bytes / 1e9 / rates["unpack_warm_gbps"]
                      + input_bytes / 1e9 / rates["plotfile_write_gbps"])
            dev_s2 = input_bytes / 1e9 / rates["device_inverse_gbps"]
            pred = link_s + max(host_s, dev_s2) + n_disp * disp
            v["reconciliation"] = {
                "predicted_wall_s": round(pred, 2),
                "measured_wall_s": round(wall, 2),
                "agreement": round(pred / wall, 3),
                "model": ("link + max(unpack@{unpack_warm_gbps} + "
                          "write@{plotfile_write_gbps}, inverse@"
                          "{device_inverse_gbps} GB/s) + dispatches"
                          .format(**rates)),
            }
            # host stages run concurrently across items (threaded unpack,
            # pipelined writer) but serially per byte here: honest
            # projection = 1 / (1/unpack + 1/write) capped by the device
            v["projected_colocated_gbps"] = round(min(
                rates["device_inverse_gbps"],
                1.0 / (1.0 / rates["unpack_warm_gbps"]
                       + 1.0 / rates["plotfile_write_gbps"])), 2)
            # in-run reconciliation (round-4 verdict item 3): the wall
            # decomposed by the instrumented stage clocks of THIS run —
            # under prefetch=1 the host chain (unpack on the worker,
            # write behind the next decode) overlaps the serial
            # device+link chain, so predicted wall = max of the two
            ms = st.get("measured_stage_seconds", {})
            if ms:
                pred_inrun = max(ms["unpack"] + ms["write"],
                                 ms["device_link"])
                v["reconciliation_inrun"] = {
                    "predicted_wall_s": round(pred_inrun, 2),
                    "measured_wall_s": round(wall, 2),
                    "agreement": round(pred_inrun / wall, 3),
                    "stage_seconds": ms,
                    "model": ("max(unpack + write [prefetch worker], "
                              "device_link [main loop]) from in-run "
                              "instrumented stage clocks"),
                }
    results[label] = row
    shutil.rmtree(root, ignore_errors=True)


def run_global_config(label: str, dim: int, n_boxes: int, n_times: int,
                      results: dict):
    """Global-threshold-mode e2e (round-4 verdict item 1's 'done' bar):
    on one >=1 GiB dataset, the wall of (a) box mode, (b) global with the
    coefficient cache (default budget), (c) global with globalcache=0
    (the round-4 two-pass behavior).  The cache must bring (b) to ~(a)
    instead of paying read + forward + h2d twice; (c) documents what it
    replaced.  Distinct data per mode (the axon layer can serve repeated
    identical device executions from a cache)."""
    import shutil

    from wavelet_tpu.pipeline import Config, compress_run

    root = os.path.join(SHM, label)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    input_bytes = n_times * n_boxes * dim ** 3 * 4
    row = {"dim": dim, "boxes_per_timestep": n_boxes, "timesteps": n_times,
           "input_bytes": input_bytes, "codec": "raw", "archive": "bundle"}
    modes = [("box", {}),
             ("global_cached", {"threshold_mode": "global",
                                "keep_fraction": 0.01}),
             ("global_uncached", {"threshold_mode": "global",
                                  "keep_fraction": 0.01,
                                  "global_cache_bytes": 0})]
    for mi, (name, extra) in enumerate(modes):
        data = os.path.join(root, f"data_{name}")
        for t in range(n_times):
            write_dataset(data, f"plt{600 + t:05d}",
                          smooth_spiky_boxes(n_boxes, dim,
                                             seed=100 * mi + 10 * t + 3),
                          dim)
        cfg = Config(data_dir=data, min_time="plt00600",
                     max_time=f"plt{600 + n_times - 1:05d}",
                     min_level=0, max_level=0, components=["f"],
                     keep=0.999,
                     compressed_dir=os.path.join(root, f"arch_{name}")
                     + os.sep,
                     codec="raw", archive="bundle", prefetch=1, **extra)
        t0 = time.perf_counter()
        stats = compress_run(cfg)
        wall = time.perf_counter() - t0
        row[name] = {"wall_seconds": round(wall, 3),
                     "e2e_measured_gbps": round(input_bytes / 1e9 / wall,
                                                4),
                     "cached_timesteps": stats.get(
                         "global_cached_timesteps")}
        shutil.rmtree(data, ignore_errors=True)
        print(f"[global-e2e] {name}: {wall:.1f}s", flush=True)
    row["cached_vs_box_wall_ratio"] = round(
        row["global_cached"]["wall_seconds"] / row["box"]["wall_seconds"],
        3)
    row["cached_vs_uncached_speedup"] = round(
        row["global_uncached"]["wall_seconds"]
        / row["global_cached"]["wall_seconds"], 3)
    results[label] = row
    shutil.rmtree(root, ignore_errors=True)


def _decompress_stage_rates() -> dict:
    """Measured decompress stage rates from their artifacts, with the
    conservative fallbacks recorded where an artifact is absent."""
    rates = {"unpack_warm_gbps": 30.4,       # host_codec.json 4-thread warm
             "plotfile_write_gbps": 1.9,     # plotfile_io.json f32 rows
             "device_inverse_gbps": 331.0}   # bench fused interleaved inv
    try:
        with open("bench_results/host_codec.json") as f:
            hc = json.load(f)
        rows = hc["unpack_raw"]["kept=0.01"]
        rates["unpack_warm_gbps"] = max(
            r["warm_gbps"] for k, r in rows.items() if "threads" in k)
    except Exception:  # noqa: BLE001
        pass
    from scripts import bench_host_codec

    # one shared parser of plotfile_io.json (schema changes can't skew
    # the two consumers apart); inf means unmeasured -> keep the fallback
    w = bench_host_codec._plotfile_write_gbps()
    if w != float("inf"):
        rates["plotfile_write_gbps"] = w
    return rates


def main():
    results = {
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "north_star": "BASELINE.json: 10 GB/s/chip end-to-end compress",
        "semantics": ("reference compress-time window = modes.cpp:97-109 "
                      "(data already in memory) -> the 'collected' rows; "
                      "'streaming' rows include plotfile read (prefetch=1)"),
        "device_stage_gbps": 164.0,   # BENCH_r02 headline (fwd+mask)
        "host_pack_gbps_4thr": 12.9,  # bench_results/host_codec.json raw
    }
    import jax

    dev = jax.devices()[0]
    results["platform"] = dev.platform
    link0 = measure_link(dev)
    # >= 1 GiB per config (VERDICT item 3)
    run_config("cube64", 64, 512, 2, link0, results)    # 2 x 512 MiB
    link1 = measure_link(dev)
    run_config("cube128", 128, 64, 2, link1, results)   # 2 x 512 MiB
    run_global_config("global64", 64, 512, 2, results)  # 2 x 512 MiB
    os.makedirs("bench_results", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
