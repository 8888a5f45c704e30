"""Lane-packed codec path: batching geometry, strided native codec, and the
engine round trip (Pallas kernels in interpret mode on the CPU test mesh)."""

import numpy as np
import pytest

from wavelet_tpu import native
from wavelet_tpu.core import oracle, threshold
from wavelet_tpu.kernels import haar_pallas as hp
from wavelet_tpu.runtime import batching, engine


def _entries(n, dims, seed=0):
    rng = np.random.default_rng(seed)
    return [(batching.WorkItem(0, 0, 0, i),
             (rng.standard_normal(dims) * 20).astype(np.float32))
            for i in range(n)]


def test_lane_pack_factor():
    assert hp.lane_pack_factor((16, 32, 64)) == 2
    assert hp.lane_pack_factor((8, 4, 2)) == 64
    assert hp.lane_pack_factor((4, 4, 128)) == 1
    assert hp.lane_pack_factor((4, 4, 256)) == 1
    assert hp.lane_pack_factor((5, 5, 3)) == 1   # odd Z unpacked


def test_plan_batches_packed_geometry():
    entries = _entries(5, (4, 8, 16))
    [batch] = batching.plan_batches(entries, pack_fn=lambda s: 8)
    assert batch.pack == 8
    assert batch.data.shape == (1, 4, 8, 128)   # 5 -> padded to 8 items
    assert batch.n_valid == 5
    for i, (item, arr) in enumerate(entries):
        np.testing.assert_array_equal(batch.item_view(i), arr)
    offs = batch.item_offsets()
    flat = batch.data.reshape(-1)
    for i, (item, arr) in enumerate(entries):
        assert flat[offs[i]] == arr[0, 0, 0]


@pytest.mark.skipif(not native.available(), reason="native codec not built")
def test_native_strided_pack_unpack_roundtrip(tmp_path):
    dims = (4, 8, 16)
    entries = _entries(6, dims, seed=2)
    [batch] = batching.plan_batches(entries, pack_fn=hp.lane_pack_factor)
    assert batch.pack == 8
    t32 = np.full(6, np.float32(0.5))
    packer = engine.HostPacker(use_native=True)
    paths_dir = str(tmp_path)
    packer.pack(paths_dir, batch, t32)

    dest = batching.empty_batch(batch.items, dims, pack=8)
    packer.unpack_into(paths_dir, dest)
    for i, (item, arr) in enumerate(entries):
        want = np.where(np.abs(arr) > 0.5, arr, 0.0)
        np.testing.assert_array_equal(dest.item_view(i), want)


def test_strided_and_python_packers_agree(tmp_path):
    dims = (4, 8, 16)
    entries = _entries(4, dims, seed=3)
    [batch] = batching.plan_batches(entries, pack_fn=hp.lane_pack_factor)
    t32 = np.full(4, np.float32(0.25))
    d_py = tmp_path / "py"; d_py.mkdir()
    engine.HostPacker(use_native=False).pack(str(d_py), batch, t32)
    if native.available():
        d_nat = tmp_path / "nat"; d_nat.mkdir()
        engine.HostPacker(use_native=True).pack(str(d_nat), batch, t32)
        from wavelet_tpu.io import archive
        for it in batch.items:
            name = archive.payload_filename(it.t, it.level, it.comp_idx, it.box)
            a = archive.xz_decompress(open(d_nat / name, "rb").read())
            b = archive.xz_decompress(open(d_py / name, "rb").read())
            assert a == b


def test_engine_packed_roundtrip_interpret(tmp_path):
    """Full packed path vs the jnp path, forced on CPU (interpret mode)."""
    dims = (4, 8, 16)
    entries = _entries(4, dims, seed=4)
    eng_packed = engine.CodecEngine(use_pallas=True)
    eng_plain = engine.CodecEngine(use_pallas=False)

    [pb] = batching.plan_batches(entries, pack_fn=eng_packed.pack_factor)
    # lane_pack_factor gives 8 for z=16; the 128-lane floor keeps it at 8
    # even for this 4-item bucket (8*16 = 128 lanes is the minimum proven
    # kernel row)
    assert pb.pack == 8
    [nb] = batching.plan_batches(entries, pack_fn=eng_plain.pack_factor)
    assert nb.pack == 1

    keep = 0.99
    cp, tp = eng_packed.compress_shapebatch(pb, keep)
    cn, tn = eng_plain.compress_shapebatch(nb, keep)
    np.testing.assert_array_equal(tp[:4], tn[:4])
    for i in range(4):
        np.testing.assert_array_equal(cp.item_view(i), cn.item_view(i))
        want = oracle.haar_forward_oracle(entries[i][1])
        np.testing.assert_array_equal(cp.item_view(i).reshape(-1), want)

    # mask + inverse round trip agrees too
    for cb, eng in ((cp, eng_packed), (cn, eng_plain)):
        masked = cb.data.copy()
        for i in range(len(cb.items)):
            v = batching.ShapeBatch(cb.shape, masked, cb.items, cb.n_valid,
                                    cb.pack).item_view(i)
            v[np.abs(v) <= tp[i]] = 0.0
        out = eng.decompress_shapebatch(
            batching.ShapeBatch(cb.shape, masked, cb.items, cb.n_valid,
                                cb.pack))
        for i in range(4):
            flat = np.where(
                np.abs(oracle.haar_forward_oracle(entries[i][1])) > tp[i],
                oracle.haar_forward_oracle(entries[i][1]), 0.0)
            want = oracle.haar_inverse_oracle(flat, *dims)
            np.testing.assert_array_equal(out.item_view(i), want)


def test_pack_capped_for_small_buckets():
    """Tiny buckets must not pad to enormous lane-pack quanta (2 boxes of
    8x4x2 would otherwise pad to a 512-slot interleaved row) — but the
    cap floors at a full 128-lane row (P*z >= 128): narrower lane shapes
    are kernel classes no hardware run has validated."""
    from wavelet_tpu.runtime import batching

    assert batching.cap_pack(512, 2) == 2          # no z: pure size cap
    assert batching.cap_pack(512, 2, z=2) == 64    # floor = 128 lanes
    assert batching.cap_pack(512, 2, z=64) == 2    # floor = 2 at z=64
    assert batching.cap_pack(512, 600, z=2) == 512
    assert batching.cap_pack(16, 16, z=16) == 16
    assert batching.cap_pack(1, 0) == 1
    items = [(batching.WorkItem(0, 0, 0, i),
              __import__("numpy").zeros((8, 4, 2), "float32"))
             for i in range(2)]
    batches = batching.plan_batches(items, pack_fn=lambda s: 512)
    assert batches[0].pack == 64                   # 128-lane floor
    assert batches[0].pack * 2 <= 512              # still far below 512
