"""The sort-free compact fast path (kernels/compact_pallas.py).

Contract under test: on every row a consumer reads (no chunk overflow,
counts <= cap), compact_fast is bit-identical to engine._compact_step —
same counts, same ascending kept indices, same values — for both
implementations of both stages; overflow is detected, never mis-compacted;
and the engine wrapper falls back to the argsort path when flagged.
Reference semantics anchor: compressor.cpp:222-234 (threshold + RLE walk).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wavelet_tpu.kernels import compact_pallas as cp
from wavelet_tpu.runtime import engine
from wavelet_tpu.core import haar


def _ref(flat, t32, cap):
    return [np.asarray(x) for x in engine._compact_step(
        jnp.asarray(flat), jnp.asarray(t32), cap)]


def _fast(flat, t32, cap, impl, asm, K=cp.KSLOTS, dims=None):
    return [np.asarray(x) for x in cp.compact_fast(
        jnp.asarray(flat), jnp.asarray(t32), cap, dims=dims, K=K,
        impl=impl, assemble=asm,
        interpret=(impl in ("pallas", "direct") or asm == "pallas"))]


def _assert_rows_equal(got, ref, cap):
    np.testing.assert_array_equal(got[0], ref[0])
    for i in range(len(ref[0])):
        k = int(ref[0][i])
        if k > cap:        # cap overflow: pair rows are never consumed
            continue
        np.testing.assert_array_equal(got[1][i, :k], ref[1][i, :k])
        np.testing.assert_array_equal(got[2][i, :k], ref[2][i, :k])


COMBOS = [("jnp", "jnp"), ("jnp", "pallas"),
          ("pallas", "jnp"), ("pallas", "pallas"),
          ("direct", "jnp"), ("direct", "pallas")]


@pytest.mark.parametrize("impl,asm", COMBOS)
@pytest.mark.parametrize("m,cap", [(8192, 512), (64 ** 3, 5248),
                                   (13824, 517)])
def test_bitwise_vs_argsort_random(impl, asm, m, cap):
    rng = np.random.default_rng(m + cap)
    n = 6
    flat = rng.standard_normal((n, m)).astype(np.float32)
    flat[rng.random((n, m)) < 0.01] *= 100
    t32 = np.full(n, 5.0, np.float32)
    got = _fast(flat, t32, cap, impl, asm)
    assert not got[3].any()
    _assert_rows_equal(got, _ref(flat, t32, cap), cap)


@pytest.mark.parametrize("impl,asm", [("jnp", "jnp"), ("pallas", "pallas"),
                                      ("direct", "pallas")])
def test_real_coefficients_no_overflow(impl, asm):
    """Haar coefficients of smooth+shock fields cluster their kept entries
    (contiguous chunks overflow on 100% of such rows — the reason chunks
    are STRIDED); the strided layout must compact them without overflow."""
    rng = np.random.default_rng(11)
    dim = 32
    xs = np.linspace(0, 1, dim, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    boxes = [np.sin(6 * (X - rng.random())) + np.tanh(60 * (Y - 0.5))
             for _ in range(4)]
    flat = np.asarray(haar.forward_flat(
        jnp.asarray(np.stack(boxes, dtype=np.float32))))
    m = flat.shape[1]
    kth = max(1, int(0.01 * m))
    t32 = np.partition(np.abs(flat), m - kth, axis=1)[:, m - kth - 1]
    cap = 2048
    got = _fast(flat, t32, cap, impl, asm, dims=(dim, dim, dim))
    assert not got[3].any(), "skewed chunks overflowed on natural data"
    _assert_rows_equal(got, _ref(flat, t32, cap), cap)


def test_clustered_lines_no_overflow():
    """The skewed view must absorb the axis-aligned worst cases that
    defeat plain modulo chunking: a full x-line (all one chunk without
    the skew) and a full x-slab."""
    m, dims = 64 ** 3, (64, 64, 64)
    flat = np.zeros((2, m), np.float32)
    flat.reshape(2, *dims)[0, :, 10, 20] = 9.0     # x-line (64 kept)
    flat.reshape(2, *dims)[1, 5, :, :] = 9.0       # x-slab (4096 kept)
    t32 = np.full(2, 1.0, np.float32)
    for impl, asm in (("jnp", "jnp"), ("pallas", "pallas"),
                      ("direct", "pallas")):
        got = _fast(flat, t32, 8192, impl, asm, dims=dims)
        assert not got[3].any(), (impl, asm)
        _assert_rows_equal(got, _ref(flat, t32, 8192), 8192)


def test_overflow_detected_on_periodic_data():
    """Adversarial kept positions periodic in the SKEWED chunk count pile
    into one chunk: the mask must flag the row; clean rows in the same
    batch stay exact."""
    m = 65536
    *_, C = cp._skew_params(m, None)
    flat = np.zeros((2, m), np.float32)
    flat[0, 5::C][:40] = 50.0          # 40 kept, all in skewed chunk 5
    flat[1, ::97] = 50.0               # spread: no chunk near K
    t32 = np.full(2, 5.0, np.float32)
    for impl, asm in (("jnp", "jnp"), ("pallas", "pallas"),
                      ("direct", "pallas")):
        got = _fast(flat, t32, 2048, impl, asm)
        assert got[3].tolist() == [True, False], (impl, asm)
        ref = _ref(flat, t32, 2048)
        k = int(ref[0][1])
        np.testing.assert_array_equal(got[1][1, :k], ref[1][1, :k])


def test_engine_wrapper_falls_back_on_overflow():
    """engine._compact must return argsort-exact output even for the
    adversarial batch the fast path flags."""
    eng = engine.CodecEngine()
    m = 65536
    *_, C = cp._skew_params(m, None)
    flat = np.zeros((3, m), np.float32)
    flat[0, 7::C][:50] = 9.0           # overflows skewed chunk 7
    flat[1, 100:3000] = 9.0            # natural cluster: fine
    flat[2, ::53] = 9.0
    t32 = np.full(3, 1.0, np.float32)
    cap = 4096
    got = [np.asarray(x) for x in eng._compact(
        jnp.asarray(flat), jnp.asarray(t32), cap)]
    ref = _ref(flat, t32, cap)
    np.testing.assert_array_equal(got[0], ref[0])
    for i in range(3):
        k = min(int(ref[0][i]), cap)
        np.testing.assert_array_equal(got[1][i, :k], ref[1][i, :k])
        np.testing.assert_array_equal(got[2][i, :k], ref[2][i, :k])


def test_engine_wrapper_uses_fast_path(monkeypatch):
    """The wrapper must route through compact_fast when the shape
    qualifies (guards against silently losing the fast path)."""
    calls = {}
    orig = cp.compact_fast

    def spy(*a, **kw):
        calls["hit"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(engine.compact_pallas, "compact_fast", spy)
    eng = engine.CodecEngine()
    rng = np.random.default_rng(0)
    flat = rng.standard_normal((2, 8192)).astype(np.float32)
    t32 = np.full(2, 2.5, np.float32)
    eng._compact(jnp.asarray(flat), jnp.asarray(t32), 512)
    assert calls.get("hit")


def test_direct_ok_domain():
    """The padless kernel needs a real slab decomposition (x >= 2),
    slabs at least one chunk-row wide, and a lane-aligned slab stride
    (Mosaic rejects dynamic loads at unaligned offsets)."""
    assert cp.direct_ok(64 ** 3, (64, 64, 64))
    assert cp.direct_ok(128 ** 3, (128, 128, 128))
    assert cp.direct_ok(24 * 32 * 16, (24, 32, 16))     # odd x, aligned yz
    assert not cp.direct_ok(8192, None)                 # x == 1
    assert not cp.direct_ok(512 * 8 * 8, (512, 8, 8))   # yz < ct
    assert not cp.direct_ok(13824, (24, 24, 24))        # yz % 128 != 0


def test_fast_ok_domain():
    assert cp.fast_ok(64 ** 3)
    assert cp.fast_ok(8192)
    assert cp.fast_ok(13824)           # odd shapes: skew pads them
    assert not cp.fast_ok(1024)        # < 4 chunks
    # caps past the f32-exact integer range must refuse the fast path:
    # both assembly stages attribute output slots via f32 comparisons of
    # integer offsets, lossy above 2**24 (round-4 review finding) — a
    # 512^3 box's first adaptive batch (cap = 0.25*m ~ 33.5M) hits this
    assert cp.fast_ok(512 ** 3, cap=1 << 24)
    assert not cp.fast_ok(512 ** 3, cap=(1 << 24) + 128)


def test_compact_fast_rejects_f32_unsafe_cap():
    flat = jnp.zeros((1, 8192), jnp.float32)
    t32 = jnp.ones((1,), jnp.float32)
    with pytest.raises(ValueError, match="f32-exact"):
        cp.compact_fast(flat, t32, (1 << 24) + 128)


def test_big_skew_uses_integer_assembly():
    """Rows whose SKEWED layout exceeds 2**24 positions must still emit
    exact indices: the jnp assembly computes positions in int32 and the
    Pallas assembly (f32 output rows) is gated off for them.  16M-element
    rows with kept coefficients clustered at the top end exercise the
    positions that would round in f32."""
    m = (1 << 24) + (1 << 14)          # skewed size > 2**24
    rng = np.random.default_rng(7)
    flat = np.zeros((1, m), np.float32)
    hot = np.sort(rng.choice(np.arange(m - (1 << 18), m), 200,
                             replace=False))
    flat[0, hot] = 10.0
    t32 = np.full(1, 5.0, np.float32)
    cap = 512
    got = _fast(flat, t32, cap, "jnp", "pallas", dims=(256, 256, 256))
    assert not got[3].any()
    assert int(got[0][0]) == len(hot)
    np.testing.assert_array_equal(got[1][0, :len(hot)], hot)


@pytest.mark.parametrize("c,K", [(128, 10), (256, 12), (1024, 24)])
@pytest.mark.parametrize("impl,asm", [("jnp", "jnp"), ("pallas", "pallas")])
def test_bitwise_at_nondefault_chunk_lengths(impl, asm, c, K):
    """The (c, K) frontier probe 15 sweeps must stay bitwise at every
    candidate geometry (chunk length is a free parameter of the skew
    machinery, not a baked-in 512)."""
    rng = np.random.default_rng(c + K)
    n, d = 4, 16
    flat = rng.standard_normal((n, d ** 3)).astype(np.float32)
    t32 = np.full(n, 1.8, np.float32)
    cap = 512
    got = [np.asarray(x) for x in cp.compact_fast(
        jnp.asarray(flat), jnp.asarray(t32), cap, dims=(d, d, d), K=K,
        c=c, impl=impl, assemble=asm,
        interpret=(impl == "pallas" or asm == "pallas"))]
    assert not got[3].any()
    _assert_rows_equal(got, _ref(flat, t32, cap), cap)
