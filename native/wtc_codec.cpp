// Native host codec for wavelet_tpu: threaded threshold+RLE+serialize+xz.
//
// This is the TPU framework's native runtime component replacing the
// reference's serial C++ pack path (compressor.cpp:222-291 semantics:
// magnitude mask, (zeros_before, value) run-length pairs, int32/float32
// payload, .xz container with CRC64 at preset 6) — redesigned as a
// batch-parallel library: the TPU device hands back a dense [N, XYZ]
// coefficient batch plus per-item float32 thresholds, and a worker pool
// packs/writes every item concurrently (LZMA is the dominant host cost and
// scales across cores).  Exposed via a minimal C ABI consumed with ctypes
// (wavelet_tpu/native/__init__.py); byte format identical to io/archive.py.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC ... -llzma).

#include <lzma.h>

#include <atomic>
#include <cmath>
#include <functional>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Pair {
    int32_t run;
    float   val;
};

#pragma pack(push, 1)
struct PairQ16 {
    int32_t run;
    int16_t val;
};
#pragma pack(pop)
static_assert(sizeof(PairQ16) == 6, "q16 pairs must be unpadded");

// Serialize one item's payload: 3x int32 shape, int32 total, int32 n_pairs,
// then (int32, float32) pairs.  Matches io/archive.serialize_payload.
std::string serialize_payload(const int32_t shape[3], int64_t total,
                              const std::vector<Pair>& pairs) {
    std::string buf;
    buf.reserve(20 + pairs.size() * 8);
    int32_t head[5] = {shape[0], shape[1], shape[2],
                       static_cast<int32_t>(total),
                       static_cast<int32_t>(pairs.size())};
    buf.append(reinterpret_cast<const char*>(head), sizeof(head));
    if (!pairs.empty()) {
        buf.append(reinterpret_cast<const char*>(pairs.data()),
                   pairs.size() * sizeof(Pair));
    }
    return buf;
}

// q16 extension payload: standard header + float32 scale + (int32, int16)
// pairs.  Matches io/archive.serialize_payload_q16 byte-for-byte, incl.
// numpy's rint (round-half-to-even) quantization.
std::string serialize_payload_q16(const int32_t shape[3], int64_t total,
                                  const std::vector<Pair>& pairs) {
    float maxmag = 0.0f;
    for (const auto& p : pairs) maxmag = std::max(maxmag, std::fabs(p.val));
    const float scale = pairs.empty() ? 0.0f : maxmag / 32767.0f;
    std::string buf;
    buf.reserve(24 + pairs.size() * sizeof(PairQ16));
    int32_t head[5] = {shape[0], shape[1], shape[2],
                       static_cast<int32_t>(total),
                       static_cast<int32_t>(pairs.size())};
    buf.append(reinterpret_cast<const char*>(head), sizeof(head));
    buf.append(reinterpret_cast<const char*>(&scale), sizeof(scale));
    std::vector<PairQ16> q(pairs.size());
    for (size_t i = 0; i < pairs.size(); ++i) {
        // numpy: np.clip(np.rint(v / float32(scale)), -32767, 32767)
        float r = std::nearbyintf(pairs[i].val / scale);
        r = std::min(32767.0f, std::max(-32767.0f, r));
        q[i] = {pairs[i].run, static_cast<int16_t>(r)};
    }
    if (!q.empty())
        buf.append(reinterpret_cast<const char*>(q.data()),
                   q.size() * sizeof(PairQ16));
    return buf;
}

// codec 0 = xz container at the given preset (reference-compatible at 6);
// codec 1 = raw payload bytes (extension: no entropy stage, declared in
// wtc-meta.json; trades size for host-pack speed)
bool encode_to_file(const std::string& payload, const char* path,
                    int codec, int preset) {
    size_t cap = payload.size() + payload.size() / 3 + 256;
    std::vector<uint8_t> out(cap);
    size_t out_pos = 0;
    if (codec == 1) {
        out.assign(payload.begin(), payload.end());
        out_pos = payload.size();
    } else {
        lzma_ret ret = lzma_easy_buffer_encode(
            static_cast<uint32_t>(preset), LZMA_CHECK_CRC64, nullptr,
            reinterpret_cast<const uint8_t*>(payload.data()), payload.size(),
            out.data(), &out_pos, out.size());
        if (ret != LZMA_OK) return false;
    }
    // write to a temp name and rename so a crash mid-write never leaves a
    // truncated .xz that a resumed run (resume=1) would skip as complete
    std::string tmp = std::string(path) + ".tmp";
    FILE* f = std::fopen(tmp.c_str(), "wb");
    if (!f) return false;
    size_t w = std::fwrite(out.data(), 1, out_pos, f);
    std::fclose(f);
    if (w != out_pos) return false;
    return std::rename(tmp.c_str(), path) == 0;
}

bool xz_decode_file(const char* path, std::vector<uint8_t>& payload,
                    int codec) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> blob(sz > 0 ? sz : 0);
    size_t r = blob.empty() ? 0 : std::fread(blob.data(), 1, blob.size(), f);
    std::fclose(f);
    if (r != blob.size()) return false;
    if (codec == 1) {
        payload = std::move(blob);
        return true;
    }

    // streaming decode with a growing buffer
    lzma_stream strm = LZMA_STREAM_INIT;
    if (lzma_stream_decoder(&strm, UINT64_MAX, LZMA_CONCATENATED) != LZMA_OK)
        return false;
    strm.next_in = blob.data();
    strm.avail_in = blob.size();
    payload.resize(blob.size() * 4 + 4096);
    strm.next_out = payload.data();
    strm.avail_out = payload.size();
    for (;;) {
        lzma_ret ret = lzma_code(&strm, LZMA_FINISH);
        if (ret == LZMA_STREAM_END) break;
        if (ret != LZMA_OK) {
            lzma_end(&strm);
            return false;
        }
        size_t old = payload.size();
        payload.resize(old * 2);
        strm.next_out = payload.data() + old;
        strm.avail_out = old;
    }
    payload.resize(payload.size() - strm.avail_out);
    lzma_end(&strm);
    return true;
}

void run_pool(int n_threads, int64_t n_items,
              const std::function<void(int64_t)>& work) {
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n_items) return;
            work(i);
        }
    };
    std::vector<std::thread> threads;
    int nt = n_threads > 0 ? n_threads
                           : static_cast<int>(std::thread::hardware_concurrency());
    if (nt < 1) nt = 1;
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Pack n_items items with per-item float32 thresholds (keep iff
// |c| > t32[i]); write one .xz per item at paths[i].  All items share one
// box shape.  Item i's coefficients are `rows` runs of `row_len` floats
// spaced `row_stride` apart starting at coeffs + offsets[i] — this covers
// both the contiguous [N, XYZ] layout (rows=1) and the TPU lane-packed
// [M, X, Y, P*Z] layout (rows=X*Y, row_len=Z, row_stride=P*Z) without a
// host repack.  Returns total compressed bytes, or -(1 + first failing
// item index) on error.
int64_t wtc_pack_strided(const float* coeffs, const float* t32,
                         int64_t n_items, int64_t rows, int64_t row_len,
                         int64_t row_stride, const int64_t* offsets,
                         const int32_t* shape, const char* const* paths,
                         int n_threads, int payload_fmt /*0=f32, 1=q16*/,
                         int codec /*0=xz, 1=raw*/, int preset /*xz 0-9*/) {
    const int64_t n_coeffs = rows * row_len;
    std::atomic<int64_t> total_bytes(0);
    std::atomic<int64_t> first_err(-1);
    run_pool(n_threads, n_items, [&](int64_t i) {
        const float* base = coeffs + offsets[i];
        const float thresh = t32[i];
        std::vector<Pair> pairs;
        int32_t run = 0;
        for (int64_t r = 0; r < rows; ++r) {
            const float* row = base + r * row_stride;
            for (int64_t k = 0; k < row_len; ++k) {
                if (std::fabs(row[k]) > thresh) {
                    pairs.push_back({run, row[k]});
                    run = 0;
                } else {
                    ++run;
                }
            }
        }
        std::string payload = payload_fmt == 1
            ? serialize_payload_q16(shape, n_coeffs, pairs)
            : serialize_payload(shape, n_coeffs, pairs);
        if (!encode_to_file(payload, paths[i], codec, preset)) {
            int64_t expect = -1;
            first_err.compare_exchange_strong(expect, i);
            return;
        }
        // account actual file size (payload shrinks under xz)
        FILE* f = std::fopen(paths[i], "rb");
        if (f) {
            std::fseek(f, 0, SEEK_END);
            total_bytes.fetch_add(std::ftell(f));
            std::fclose(f);
        }
    });
    if (first_err.load() >= 0) return -(1 + first_err.load());
    return total_bytes.load();
}

// Unpack n_items .xz files into a strided destination (same geometry
// convention as wtc_pack_strided; the destination regions are zeroed
// first).  shapes_out (3*n_items, optional) receives each item's box
// shape.  Returns 0, or -(1 + first failing item index).
int64_t wtc_unpack_strided(const char* const* paths, int64_t n_items,
                           int64_t rows, int64_t row_len, int64_t row_stride,
                           const int64_t* offsets, float* out,
                           int32_t* shapes_out, int n_threads,
                           int payload_fmt /*0=f32, 1=q16*/,
                           int codec /*0=xz, 1=raw*/) {
    const int64_t n_coeffs = rows * row_len;
    const size_t head_bytes = payload_fmt == 1 ? 24 : 20;
    const size_t pair_bytes = payload_fmt == 1 ? sizeof(PairQ16) : sizeof(Pair);
    std::atomic<int64_t> first_err(-1);
    run_pool(n_threads, n_items, [&](int64_t i) {
        std::vector<uint8_t> payload;
        if (!xz_decode_file(paths[i], payload, codec)
            || payload.size() < head_bytes) {
            int64_t expect = -1;
            first_err.compare_exchange_strong(expect, i);
            return;
        }
        int32_t head[5];
        std::memcpy(head, payload.data(), sizeof(head));
        const int64_t total = head[3];
        const int64_t n_pairs = head[4];
        if (total > n_coeffs ||
            payload.size() < head_bytes + n_pairs * pair_bytes) {
            int64_t expect = -1;
            first_err.compare_exchange_strong(expect, i);
            return;
        }
        if (shapes_out) std::memcpy(shapes_out + 3 * i, head, 3 * sizeof(int32_t));
        float* base = out + offsets[i];
        for (int64_t r = 0; r < rows; ++r)
            std::memset(base + r * row_stride, 0, row_len * sizeof(float));
        float scale = 0.0f;
        if (payload_fmt == 1) std::memcpy(&scale, payload.data() + 20, 4);
        const uint8_t* pd = payload.data() + head_bytes;
        int64_t idx = 0;
        for (int64_t p = 0; p < n_pairs; ++p) {
            int32_t run;
            float val;
            if (payload_fmt == 1) {
                PairQ16 q;
                std::memcpy(&q, pd + p * sizeof(PairQ16), sizeof(q));
                run = q.run;
                val = static_cast<float>(q.val) * scale;
            } else {
                Pair pr;
                std::memcpy(&pr, pd + p * sizeof(Pair), sizeof(pr));
                run = pr.run;
                val = pr.val;
            }
            idx += run;
            // bounds check as decompressor.cpp:23, plus a lower bound the
            // reference lacks: a corrupt payload with negative runs must
            // not write before the buffer
            if (idx >= 0 && idx < total) {
                base[(idx / row_len) * row_stride + idx % row_len] = val;
                ++idx;
            }
        }
    });
    if (first_err.load() >= 0) return -(1 + first_err.load());
    return 0;
}

// Indexed variants: item i's coefficient at LOGICAL position (a, b, c)
// (the reference's flatten order) lives at coeffs[offsets[i] + ix[a] +
// iy[b] + iz[c]] — the per-axis tables carry both the layout's strides and
// any in-place permutation (e.g. the interleaved Haar layout, where the
// device skips the low/high deinterleave and the host walks coefficients
// through kernels/haar_pallas.interleave_perm instead).  Same payload
// bytes as the strided variants for the same logical data.

int64_t wtc_pack_indexed(const float* coeffs, const float* t32,
                         int64_t n_items, int64_t nx, int64_t ny, int64_t nz,
                         const int64_t* ix, const int64_t* iy,
                         const int64_t* iz, const int64_t* offsets,
                         const int32_t* shape, const char* const* paths,
                         int n_threads, int payload_fmt, int codec,
                         int preset) {
    const int64_t n_coeffs = nx * ny * nz;
    std::atomic<int64_t> total_bytes(0);
    std::atomic<int64_t> first_err(-1);
    run_pool(n_threads, n_items, [&](int64_t i) {
        const float* base = coeffs + offsets[i];
        const float thresh = t32[i];
        std::vector<Pair> pairs;
        int32_t run = 0;
        for (int64_t a = 0; a < nx; ++a) {
            const float* pa = base + ix[a];
            for (int64_t b = 0; b < ny; ++b) {
                const float* pb = pa + iy[b];
                for (int64_t c = 0; c < nz; ++c) {
                    const float v = pb[iz[c]];
                    if (std::fabs(v) > thresh) {
                        pairs.push_back({run, v});
                        run = 0;
                    } else {
                        ++run;
                    }
                }
            }
        }
        std::string payload = payload_fmt == 1
            ? serialize_payload_q16(shape, n_coeffs, pairs)
            : serialize_payload(shape, n_coeffs, pairs);
        if (!encode_to_file(payload, paths[i], codec, preset)) {
            int64_t expect = -1;
            first_err.compare_exchange_strong(expect, i);
            return;
        }
        FILE* f = std::fopen(paths[i], "rb");
        if (f) {
            std::fseek(f, 0, SEEK_END);
            total_bytes.fetch_add(std::ftell(f));
            std::fclose(f);
        }
    });
    if (first_err.load() >= 0) return -(1 + first_err.load());
    return total_bytes.load();
}

int64_t wtc_unpack_indexed(const char* const* paths, int64_t n_items,
                           int64_t nx, int64_t ny, int64_t nz,
                           const int64_t* ix, const int64_t* iy,
                           const int64_t* iz, const int64_t* offsets,
                           float* out, int32_t* shapes_out, int n_threads,
                           int payload_fmt, int codec) {
    const int64_t n_coeffs = nx * ny * nz;
    const size_t head_bytes = payload_fmt == 1 ? 24 : 20;
    const size_t pair_bytes = payload_fmt == 1 ? sizeof(PairQ16) : sizeof(Pair);
    std::atomic<int64_t> first_err(-1);
    run_pool(n_threads, n_items, [&](int64_t i) {
        std::vector<uint8_t> payload;
        if (!xz_decode_file(paths[i], payload, codec)
            || payload.size() < head_bytes) {
            int64_t expect = -1;
            first_err.compare_exchange_strong(expect, i);
            return;
        }
        int32_t head[5];
        std::memcpy(head, payload.data(), sizeof(head));
        const int64_t total = head[3];
        const int64_t n_pairs = head[4];
        if (total > n_coeffs ||
            payload.size() < head_bytes + n_pairs * pair_bytes) {
            int64_t expect = -1;
            first_err.compare_exchange_strong(expect, i);
            return;
        }
        if (shapes_out) std::memcpy(shapes_out + 3 * i, head, 3 * sizeof(int32_t));
        float* base = out + offsets[i];
        for (int64_t a = 0; a < nx; ++a)
            for (int64_t b = 0; b < ny; ++b)
                for (int64_t c = 0; c < nz; ++c)
                    base[ix[a] + iy[b] + iz[c]] = 0.0f;
        float scale = 0.0f;
        if (payload_fmt == 1) std::memcpy(&scale, payload.data() + 20, 4);
        const uint8_t* pd = payload.data() + head_bytes;
        int64_t idx = 0;
        for (int64_t p = 0; p < n_pairs; ++p) {
            int32_t run;
            float val;
            if (payload_fmt == 1) {
                PairQ16 q;
                std::memcpy(&q, pd + p * sizeof(PairQ16), sizeof(q));
                run = q.run;
                val = static_cast<float>(q.val) * scale;
            } else {
                Pair pr;
                std::memcpy(&pr, pd + p * sizeof(Pair), sizeof(pr));
                run = pr.run;
                val = pr.val;
            }
            idx += run;
            if (idx >= 0 && idx < total) {
                const int64_t c = idx % nz;
                const int64_t b = (idx / nz) % ny;
                const int64_t a = idx / (ny * nz);
                base[ix[a] + iy[b] + iz[c]] = val;
                ++idx;
            }
        }
    });
    if (first_err.load() >= 0) return -(1 + first_err.load());
    return 0;
}

// Mapped variants: item i's coefficient at LOGICAL flat position t lives
// at coeffs[offsets[i] + map[t]].  The fully general layout walk — needed
// for the multi-scale interleaved layout, whose logical->physical map is
// NOT separable per axis (a high-band coordinate means the other axes
// were never re-transformed at deeper scales).  map has nx*ny*nz entries,
// shared by every item of the batch.

int64_t wtc_pack_mapped(const float* coeffs, const float* t32,
                        int64_t n_items, int64_t n_coeffs,
                        const int64_t* map, const int64_t* offsets,
                        const int32_t* shape, const char* const* paths,
                        int n_threads, int payload_fmt, int codec,
                        int preset) {
    std::atomic<int64_t> total_bytes(0);
    std::atomic<int64_t> first_err(-1);
    run_pool(n_threads, n_items, [&](int64_t i) {
        const float* base = coeffs + offsets[i];
        const float thresh = t32[i];
        std::vector<Pair> pairs;
        int32_t run = 0;
        for (int64_t t = 0; t < n_coeffs; ++t) {
            const float v = base[map[t]];
            if (std::fabs(v) > thresh) {
                pairs.push_back({run, v});
                run = 0;
            } else {
                ++run;
            }
        }
        std::string payload = payload_fmt == 1
            ? serialize_payload_q16(shape, n_coeffs, pairs)
            : serialize_payload(shape, n_coeffs, pairs);
        if (!encode_to_file(payload, paths[i], codec, preset)) {
            int64_t expect = -1;
            first_err.compare_exchange_strong(expect, i);
            return;
        }
        FILE* f = std::fopen(paths[i], "rb");
        if (f) {
            std::fseek(f, 0, SEEK_END);
            total_bytes.fetch_add(std::ftell(f));
            std::fclose(f);
        }
    });
    if (first_err.load() >= 0) return -(1 + first_err.load());
    return total_bytes.load();
}

int64_t wtc_unpack_mapped(const char* const* paths, int64_t n_items,
                          int64_t n_coeffs, const int64_t* map,
                          const int64_t* offsets, float* out,
                          int32_t* shapes_out, int n_threads,
                          int payload_fmt, int codec) {
    const size_t head_bytes = payload_fmt == 1 ? 24 : 20;
    const size_t pair_bytes = payload_fmt == 1 ? sizeof(PairQ16) : sizeof(Pair);
    std::atomic<int64_t> first_err(-1);
    run_pool(n_threads, n_items, [&](int64_t i) {
        std::vector<uint8_t> payload;
        if (!xz_decode_file(paths[i], payload, codec)
            || payload.size() < head_bytes) {
            int64_t expect = -1;
            first_err.compare_exchange_strong(expect, i);
            return;
        }
        int32_t head[5];
        std::memcpy(head, payload.data(), sizeof(head));
        const int64_t total = head[3];
        const int64_t n_pairs = head[4];
        if (total > n_coeffs ||
            payload.size() < head_bytes + n_pairs * pair_bytes) {
            int64_t expect = -1;
            first_err.compare_exchange_strong(expect, i);
            return;
        }
        if (shapes_out) std::memcpy(shapes_out + 3 * i, head, 3 * sizeof(int32_t));
        float* base = out + offsets[i];
        for (int64_t t = 0; t < n_coeffs; ++t) base[map[t]] = 0.0f;
        float scale = 0.0f;
        if (payload_fmt == 1) std::memcpy(&scale, payload.data() + 20, 4);
        const uint8_t* pd = payload.data() + head_bytes;
        int64_t idx = 0;
        for (int64_t p = 0; p < n_pairs; ++p) {
            int32_t run;
            float val;
            if (payload_fmt == 1) {
                PairQ16 q;
                std::memcpy(&q, pd + p * sizeof(PairQ16), sizeof(q));
                run = q.run;
                val = static_cast<float>(q.val) * scale;
            } else {
                Pair pr;
                std::memcpy(&pr, pd + p * sizeof(Pair), sizeof(pr));
                run = pr.run;
                val = pr.val;
            }
            idx += run;
            if (idx >= 0 && idx < total) {
                base[map[idx]] = val;
                ++idx;
            }
        }
    });
    if (first_err.load() >= 0) return -(1 + first_err.load());
    return 0;
}

}  // extern "C"
