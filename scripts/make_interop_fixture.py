"""Hand-assemble a tiny reference-format archive, byte by byte.

Authored DIRECTLY from the reference's documented on-disk layouts —
``readandwrite.cpp:226-395`` (sidecars) and ``compressor.cpp:55-80`` +
``:250-291`` (payload + xz container) — using only ``struct.pack`` and
stdlib ``lzma``, deliberately NOT wavelet_tpu.io.archive.  The checked-in
result (tests/fixtures/interop_archive/) is what a C++-reference-produced
archive looks like; tests/test_interop.py decodes it with the unmodified
pipeline, converting the "either tool reads the other's output" claim from
by-construction to tested-against-foreign-bytes (the C++ tool itself cannot
be built in this sandbox — its install_deps.py needs network egress).

Layout contents (1 timestep, 1 level, 2 boxes of 4x4x2, 1 component "temp"):
- box 0: constant 3.25 -> single-scale Haar of a constant box is the low
  block: (X/2, Y/2, Z/2) = 2x2x1 coefficients of 3.25 at flat indices
  {0, 2, 8, 10} in the reference's k + Z*(j + Y*i) flatten order
  (compressor.cpp:178-181); pairs (0,3.25)(1,3.25)(5,3.25)(1,3.25).
  Decodes to a constant box exactly (the transform is means/differences).
- box 1: coefficients {idx 0: 1.5, idx 5: -2.0, idx 31: 0.25} ->
  pairs (0,1.5) (4,-2.0) (25,0.25).  Expected box values are derived in
  the test via the independently-validated scalar oracle.
"""

import lzma
import os
import struct

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "interop_archive")

XZ_FILTERS = [{"id": lzma.FILTER_LZMA2, "preset": 6}]


def u64(v):          # size_t, little-endian (readandwrite.cpp:11-20)
    return struct.pack("<Q", v)


def i32(v):
    return struct.pack("<i", v)


def f32(v):
    return struct.pack("<f", v)


def f64(v):
    return struct.pack("<d", v)


def f80(hi16_exp_sign: int, mantissa: int):
    """x86-64 long double: 8-byte mantissa LE, 2-byte sign+exponent, 6 pad."""
    return struct.pack("<QH6x", mantissa, hi16_exp_sign)


def cstring(s: str):
    b = s.encode()
    return u64(len(b)) + b


def payload(shape, pairs):
    """serialize_compressed_wavelet layout (compressor.cpp:55-80)."""
    x, y, z = shape
    out = i32(x) + i32(y) + i32(z) + i32(x * y * z) + i32(len(pairs))
    for run, val in pairs:
        out += i32(run) + f32(val)
    return out


def xz(b):
    """``lzma_easy_buffer_encode(6, LZMA_CHECK_CRC64)`` byte-exact
    container — what the C++ reference writes (compressor.cpp:250-291).

    stdlib ``lzma.compress`` streams and therefore OMITS the compressed/
    uncompressed sizes from the block header; liblzma's buffer encoder
    (which knows both up front) STORES them (block flags 0xC0).  The
    compressed bits are identical, so this re-frames the stdlib stream
    per the xz file-format spec: parse out the block data + check,
    reassemble header/index/footer with the size fields.  Assembled here
    from the spec, independent of wavelet_tpu's serializers — the round-5
    re-encode tests then prove the production encoders emit these exact
    foreign bytes."""
    import binascii

    raw = lzma.compress(b, format=lzma.FORMAT_XZ, check=lzma.CHECK_CRC64,
                        filters=XZ_FILTERS)

    def varint(v):
        out = bytearray()
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
        return bytes(out)

    def read_varint(buf, pos):
        v, shift = 0, 0
        while True:
            c = buf[pos]
            pos += 1
            v |= (c & 0x7F) << shift
            if not (c & 0x80):
                return v, pos
            shift += 7

    # footer -> index -> the one block record (unpadded, uncompressed)
    back = int.from_bytes(raw[-8:-4], "little")
    idx = raw[-12 - (back + 1) * 4 : -12]
    assert idx[0] == 0x00
    nrec, p = read_varint(idx, 1)
    assert nrec == 1
    unpadded, p = read_varint(idx, p)
    uncomp, p = read_varint(idx, p)
    old_bhs = (raw[12] + 1) * 4
    comp = unpadded - old_bhs - 8                    # CRC64 check = 8 bytes
    body = raw[12 + old_bhs : 12 + old_bhs + comp + (-comp % 4) + 8]
    nfilt = (raw[13] & 0x03) + 1                     # stdlib sets no sizes
    q = 14
    for _ in range(nfilt):
        _fid, q = read_varint(raw, q)
        nprops, q = read_varint(raw, q)
        q += nprops
    filt = raw[14:q]
    core = bytes([raw[13] | 0xC0]) + varint(comp) + varint(uncomp) + filt
    # liblzma sizes the header from lzma_block_buffer_bound(uncomp)
    # BEFORE compressing (= align4(n) + 96 + 3*(n>>16), probed from the
    # system library) and zero-pads the unused varint space
    bound = (uncomp + 3) // 4 * 4 + 96 + 3 * (uncomp >> 16)
    bhs = (2 + len(varint(bound)) + len(varint(uncomp)) + len(filt) + 4
           + 3) // 4 * 4
    hdr = bytes([bhs // 4 - 1]) + core
    hdr += b"\x00" * (bhs - 4 - len(hdr))
    hdr += binascii.crc32(hdr).to_bytes(4, "little")
    new_idx = b"\x00" + varint(1) + varint(bhs + comp + 8) + varint(uncomp)
    new_idx += b"\x00" * (-len(new_idx) % 4)
    new_idx += binascii.crc32(new_idx).to_bytes(4, "little")
    back_raw = (len(new_idx) // 4 - 1).to_bytes(4, "little")
    footer = (binascii.crc32(back_raw + raw[6:8]).to_bytes(4, "little")
              + back_raw + raw[6:8] + b"YZ")
    return raw[:12] + hdr + body + new_idx + footer


MATRIX_OUT = os.path.join(os.path.dirname(OUT), "interop_matrix")


def _pairs_from_flat(vals):
    """(run, value) RLE pairs for a flat coefficient list, keeping every
    NONZERO value — the run is the count of skipped zeros before each kept
    value (compressor.cpp:218-234)."""
    out = []
    run = 0
    for v in vals:
        if v == 0.0:
            run += 1
        else:
            out.append((run, v))
            run = 0
    return out


def _low_block_pairs(shape, val):
    """Pairs of a CONSTANT box's single-scale Haar: the low block
    (X/2, Y/2, Z/2) holds ``val`` at flat k + Z*(j + Y*i)."""
    x, y, z = shape
    flat = [0.0] * (x * y * z)
    for i in range(x // 2):
        for j in range(y // 2):
            for k in range(z // 2):
                flat[k + z * (j + y * i)] = val
    return _pairs_from_flat(flat)


def matrix():
    """The quirk-corner interop matrix (round-4 verdict item 6): one
    foreign-byte archive exercising every decode corner the single
    happy-path fixture (main()) does not — authored with struct.pack /
    stdlib lzma only, never wavelet_tpu's serializers.

    2 timesteps x 2 levels x 2 components ("temp" header idx 0, "vel"
    idx 2 — a non-contiguous selection), boxcounts varying per (t, lev):
    t0 = (2, 1), t1 = (1, 2).  Boxes:

    - t0/lev0/box0 (4,4,2): temp = constant 3.25 (sparse low-block
      payload, the decode->re-encode FIXED POINT for a positive box);
      vel = constant -1.25 — a NEGATIVE signed absmax, so the reference
      compressor's threshold -1.25*(1-keep) < 0 keeps EVERYTHING: the
      payload is all 32 coefficients as (0, v) pairs, zeros included
      (compressor.cpp:212-234 quirk, SURVEY §5.6).
    - t0/lev0/box1 (3,4,2): ODD X dimension — forward passthrough /
      inverse zeroing semantics (decompressor.cpp:14-74); decode is
      checked against the scalar oracle, no re-encode fixed point.
    - t0/lev1/box0 (4,2,2): temp = a FULL 16-pair payload with explicit
      (0, 0.0) pairs and signed absmax -4.0 (the negative-absmax regime
      with mixed zeros); vel = constant 2.5.
    - t1/lev0/box0 (4,4,2): EMPTY RLE payload (0 pairs) for both
      components -> all-zero box; re-encode of a zero box is empty again
      (absmax 0 -> threshold 0 -> |c| > 0 keeps nothing).
    - t1/lev1/box0 (2,2,2): temp = constant 1.5 (1 pair); vel = sparse
      positive {0: 2.0, 5: 0.5}.
    - t1/lev1/box1 (4,4,4): temp = sparse dyadic {0: 4.0, 9: 1.0,
      63: -0.5} (positive absmax, all kept at keep=0.999); vel =
      constant 0.75.

    All values are exact dyadic f32 so inverse->forward round trips
    bitwise and the fixed-point re-encode comparison is exact.
    """
    os.makedirs(MATRIX_OUT, exist_ok=True)

    files = ["plt00101", "plt00103"]
    names = ["temp", "vel"]
    idxs = [0, 2]
    runinfo = u64(len(files))
    for fn in files:
        runinfo += cstring(fn)
    runinfo += i32(0) + i32(1)
    runinfo += u64(len(names))
    for n in names:
        runinfo += cstring(n)
    runinfo += u64(len(idxs))
    for ix in idxs:
        runinfo += i32(ix)
    with open(os.path.join(MATRIX_OUT, "runinfo.raw"), "wb") as f:
        f.write(runinfo)

    # (t, lev) -> [(location, shape)] — flat (t, lev, box) order in the
    # loc/dim sidecars (readandwrite.cpp:226-269)
    geometry = {
        (0, 0): [((0, 0, 0), (4, 4, 2)), ((4, 0, 0), (3, 4, 2))],
        (0, 1): [((0, 0, 0), (4, 2, 2))],
        (1, 0): [((0, 0, 0), (4, 4, 2))],
        (1, 1): [((0, 0, 0), (2, 2, 2)), ((8, 2, 0), (4, 4, 4))],
    }
    locs = b""
    dims = b""
    counts = b""
    for t in range(2):
        for lev in range(2):
            boxes = geometry[(t, lev)]
            counts += f32(float(len(boxes)))
            for loc, shape in boxes:
                locs += b"".join(f32(float(v)) for v in loc)
                dims += b"".join(f32(float(v)) for v in shape)
    for name, blob in (("locations.raw", locs), ("dimensions.raw", dims),
                       ("boxcounts.raw", counts)):
        with open(os.path.join(MATRIX_OUT, name), "wb") as f:
            f.write(blob)

    # amrexinfo: per-t geomcell + true time (0.25 / 0.75 as x87 80-bit),
    # per-(t, lev) level steps, level-0 domain dims
    amrex = u64(2)
    for _t in range(2):
        amrex += (u64(6) + f64(0.0) + f64(0.0) + f64(0.0)
                  + f64(1.0) + f64(1.0) + f64(1.0))
    amrex += u64(3) + i32(2) + i32(2) + i32(2)
    amrex += (u64(2) + f80(0x3FFD, 0x8000000000000000)     # 0.25
              + f80(0x3FFE, 0xC000000000000000))           # 0.75
    amrex += u64(2)
    for steps in ([101, 202], [103, 206]):
        amrex += u64(2) + i32(steps[0]) + i32(steps[1])
    amrex += i32(8) + i32(4) + i32(2)
    with open(os.path.join(MATRIX_OUT, "amrexinfo.raw"), "wb") as f:
        f.write(amrex)

    # --- payloads:  (t, lev, comp_header_idx, box) -> pairs ------------
    def full_pairs(flat):
        """Every coefficient as a (0, v) pair, zeros included — the
        negative-absmax keep-everything regime."""
        return [(0, v) for v in flat]

    neg_mix = [-4.0, 0.5, 0.0, 1.0, -0.25, 0.0, 2.0, -1.0,
               0.75, 0.0, 0.5, -0.5, 1.25, 0.0, -2.0, 0.25]
    odd_temp = [0.0] * 24
    odd_temp[0], odd_temp[7] = 2.0, -0.5
    odd_vel = [0.0] * 24
    odd_vel[1] = 0.75
    t1l1b1_temp = [0.0] * 64
    t1l1b1_temp[0], t1l1b1_temp[9], t1l1b1_temp[63] = 4.0, 1.0, -0.5
    t1l1b0_vel = [0.0] * 8
    t1l1b0_vel[0], t1l1b0_vel[5] = 2.0, 0.5

    neg_const = [0.0] * 32
    for i in range(2):
        for j in range(2):
            neg_const[2 * (j + 4 * i)] = -1.25

    payloads = {
        (0, 0, 0, 0): ((4, 4, 2), _low_block_pairs((4, 4, 2), 3.25)),
        (0, 0, 2, 0): ((4, 4, 2), full_pairs(neg_const)),
        (0, 0, 0, 1): ((3, 4, 2), _pairs_from_flat(odd_temp)),
        (0, 0, 2, 1): ((3, 4, 2), _pairs_from_flat(odd_vel)),
        (0, 1, 0, 0): ((4, 2, 2), full_pairs(neg_mix)),
        (0, 1, 2, 0): ((4, 2, 2), _low_block_pairs((4, 2, 2), 2.5)),
        (1, 0, 0, 0): ((4, 4, 2), []),
        (1, 0, 2, 0): ((4, 4, 2), []),
        (1, 1, 0, 0): ((2, 2, 2), _low_block_pairs((2, 2, 2), 1.5)),
        (1, 1, 2, 0): ((2, 2, 2), _pairs_from_flat(t1l1b0_vel)),
        (1, 1, 0, 1): ((4, 4, 4), _pairs_from_flat(t1l1b1_temp)),
        (1, 1, 2, 1): ((4, 4, 4), _low_block_pairs((4, 4, 4), 0.75)),
    }
    for (t, lev, cidx, box), (shape, pairs) in payloads.items():
        fn = f"compressed-wavelet-{t}-{lev}-{cidx}-{box}.xz"
        with open(os.path.join(MATRIX_OUT, fn), "wb") as f:
            f.write(xz(payload(shape, pairs)))
    print("wrote", MATRIX_OUT)


def main():
    os.makedirs(OUT, exist_ok=True)

    # runinfo.raw (readandwrite.cpp:362-376): files[], min/max level,
    # component names[], component indices[]
    runinfo = (u64(1) + cstring("plt00099")
               + i32(0) + i32(0)
               + u64(1) + cstring("temp")
               + u64(1) + i32(0))
    with open(os.path.join(OUT, "runinfo.raw"), "wb") as f:
        f.write(runinfo)

    # locations.raw / dimensions.raw (:226-242): 3 float32 per box,
    # ints stored as floats (the reference's format quirk)
    locs = f32(0.0) + f32(0.0) + f32(0.0) + f32(4.0) + f32(0.0) + f32(0.0)
    dims = (f32(4.0) + f32(4.0) + f32(2.0)) * 2
    with open(os.path.join(OUT, "locations.raw"), "wb") as f:
        f.write(locs)
    with open(os.path.join(OUT, "dimensions.raw"), "wb") as f:
        f.write(dims)

    # boxcounts.raw (:273-291): num_times x num_levels counts as float32
    with open(os.path.join(OUT, "boxcounts.raw"), "wb") as f:
        f.write(f32(2.0))

    # amrexinfo.raw (:321-338): vec<vec<double>> geomcell, vec<int>
    # ref_ratios, vec<long double> true_times, vec<vec<int>> level_steps,
    # 3 ints domain dims.  true time = 0.5 -> extended 80-bit: exponent
    # 0x3FFE, mantissa 0x8000000000000000.
    # ref_ratios: 3 per-dim entries, matching the reference's own test
    # expectation {2,2,2} (preprocess.cpp:358) and per-dim consumption
    # (writeplotfile.cpp:163-165)
    amrex = (u64(1) + u64(6)
             + f64(0.0) + f64(0.0) + f64(0.0) + f64(1.0) + f64(1.0) + f64(1.0)
             + u64(3) + i32(2) + i32(2) + i32(2)
             + u64(1) + f80(0x3FFE, 0x8000000000000000)
             + u64(1) + u64(1) + i32(99)
             + i32(8) + i32(4) + i32(2))
    with open(os.path.join(OUT, "amrexinfo.raw"), "wb") as f:
        f.write(amrex)

    # payloads: compressed-wavelet-{t}-{lev}-{compidx}-{box}.xz
    p0 = payload((4, 4, 2), [(0, 3.25), (1, 3.25), (5, 3.25), (1, 3.25)])
    p1 = payload((4, 4, 2), [(0, 1.5), (4, -2.0), (25, 0.25)])
    with open(os.path.join(OUT, "compressed-wavelet-0-0-0-0.xz"), "wb") as f:
        f.write(xz(p0))
    with open(os.path.join(OUT, "compressed-wavelet-0-0-0-1.xz"), "wb") as f:
        f.write(xz(p1))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
    matrix()
