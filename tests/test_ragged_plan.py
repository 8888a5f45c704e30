"""Regression guard for the ragged-shape batch-plan geometry.

Round-5 measurement (`scripts/bench_ragged.py`, artifact
`bench_results/ragged_e2e.json`): on a realistic regridded-AMR-like
distribution — 44 distinct shapes, Zipf-ish counts, odd dims included —
the real `plan_batches`/`cap_pack` geometry wastes 6.6% of slots and
0.75% of bytes, and that result decided AGAINST a small-bucket routing
policy.  This test pins the plan-side half of that measurement on the
exact same deterministic distribution so a future packing change that
regresses padding waste (or silently changes the distribution) fails CI
instead of silently invalidating the recorded decision.

Reference anchor: the fixture's own ragged mix
(/root/reference/tests/plt00074/Level_0/Cell_H: 16x32x64 next to 8x4x2)
is what this distribution scales up.
"""

import importlib.util
import os

import numpy as np

_SPEC = importlib.util.spec_from_file_location(
    "bench_ragged",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "bench_ragged.py"))
bench_ragged = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench_ragged)


def test_distribution_is_the_recorded_one():
    shapes, bytes_per_t = bench_ragged.build_shapes()
    assert len(shapes) == 44
    assert len({dims for dims, _c, _l in shapes}) == 44
    # odd dims (Pallas-unfriendly shapes) must stay well represented
    odd = [dims for dims, _c, _l in shapes if any(d % 2 for d in dims)]
    assert len(odd) >= 10
    # skewed counts: smallest buckets a handful, biggest dozens
    counts = sorted(c for _d, c, _l in shapes)
    assert counts[0] <= 4 and counts[-1] >= 60
    assert bytes_per_t >= 550 << 20
    assert sum(1 for _d, _c, lev in shapes if lev == 1) >= 15  # both levels


def test_padding_waste_stays_bounded():
    shapes, _ = bench_ragged.build_shapes()
    stats = bench_ragged.padding_stats(shapes)
    # measured 0.066 / 0.0075 (ragged_e2e.json); the policy decision
    # ("no small-bucket routing needed") holds while these stay small
    assert stats["slot_waste_fraction"] <= 0.10
    assert stats["byte_waste_fraction"] <= 0.02
    for dims, row in stats["per_shape"].items():
        # per-bucket minimality: padding never adds a full pack group
        assert row["padded_to"] - row["count"] < row["pack"], dims
        assert row["padded_to"] % row["pack"] == 0 or row["pack"] == 1, dims


def test_plan_batches_matches_padding_stats_geometry():
    """The stats helper and the production planner agree: for a few
    representative buckets, plan_batches emits exactly the padded slot
    count padding_stats predicts (no hidden extra padding layer)."""
    from wavelet_tpu.kernels import haar_pallas
    from wavelet_tpu.runtime import batching

    shapes, _ = bench_ragged.build_shapes()
    stats = bench_ragged.padding_stats(shapes)
    picked = 0
    for dims, count, _lev in shapes:
        if count < 2 or picked >= 4:
            continue
        picked += 1
        row = stats["per_shape"][str(dims)]
        entries = [((t, 0, 0, b, dims), np.zeros(dims, np.float32))
                   for t, b in ((0, b) for b in range(count))]
        batches = batching.plan_batches(
            entries, pack_fn=haar_pallas.lane_pack_factor)
        # slots = leading dim x pack (lane-packed data is [N//P,X,Y,P*Z])
        total_slots = sum(b.data.shape[0] * b.pack for b in batches)
        assert total_slots == row["padded_to"], (dims, count)
    assert picked == 4
