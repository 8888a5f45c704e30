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
    """lzma_easy_buffer_encode(6, LZMA_CHECK_CRC64) equivalent container."""
    return lzma.compress(b, format=lzma.FORMAT_XZ, check=lzma.CHECK_CRC64,
                         filters=XZ_FILTERS)


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
