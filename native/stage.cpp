// Native staging engine: host-side data plane for the TPU transcode farm.
//
// The TPU kernels want lane-major int32 buffers (rows = input frames, lanes =
// stream x channel), while audio arrives stream-major interleaved s16 — the
// same impedance the reference's high-level layer solves with its staging
// buffer + memmove halo (clownresampler.h:1143-1154), scaled to thousands of
// streams. These loops are the per-chunk host hot path, so they are C++ with
// threads rather than numpy transposes.
//
// Exposed via ctypes (clownresampler_tpu/utils/native.py); every function has
// a numpy fallback and is differentially tested against it.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

long clamp_threads(long work_items) {
    long hw = static_cast<long>(std::thread::hardware_concurrency());
    if (hw < 1) hw = 1;
    if (hw > work_items) hw = work_items;
    return hw;
}

template <typename F>
void parallel_for(long count, F body) {
    const long n_threads = clamp_threads(count);
    if (n_threads <= 1) {
        for (long i = 0; i < count; ++i) body(i);
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    const long per = (count + n_threads - 1) / n_threads;
    for (long t = 0; t < n_threads; ++t) {
        const long lo = t * per;
        const long hi = std::min(count, lo + per);
        if (lo >= hi) break;
        threads.emplace_back([=] {
            for (long i = lo; i < hi; ++i) body(i);
        });
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// (B, n, C) interleaved s16 -> rows [row_off, row_off+n) of a lane-major
// (S, ld_out) int32 staging buffer: out[row_off+r][b*C + c] = in[b][r][c].
void stage_i16_to_i32_lanes(const int16_t* in, int32_t* out, long B, long n,
                            long C, long ld_out, long row_off) {
    parallel_for(B, [=](long b) {
        const int16_t* src = in + b * n * C;
        int32_t* dst_base = out + row_off * ld_out + b * C;
        for (long r = 0; r < n; ++r) {
            int32_t* dst = dst_base + r * ld_out;
            const int16_t* s = src + r * C;
            for (long c = 0; c < C; ++c) dst[c] = static_cast<int32_t>(s[c]);
        }
    });
}

// Zero rows [row_off, row_off+n) of the staging buffer.
void zero_rows_i32(int32_t* buf, long ld, long row_off, long n) {
    std::memset(buf + row_off * ld, 0, static_cast<size_t>(n) * ld * sizeof(int32_t));
}

// Slide the staging window left: buf[r] = buf[r + shift] for r < rows_keep.
void shift_rows_i32(int32_t* buf, long rows_keep, long ld, long shift) {
    std::memmove(buf, buf + shift * ld,
                 static_cast<size_t>(rows_keep) * ld * sizeof(int32_t));
}

// Lane-major kernel output (m, ld_in) -> per-stream (B, m, C) int32.
void unstage_i32_to_streams(const int32_t* in, int32_t* out, long B, long m,
                            long C, long ld_in) {
    parallel_for(B, [=](long b) {
        const int32_t* src_base = in + b * C;
        int32_t* dst = out + b * m * C;
        for (long r = 0; r < m; ++r) {
            const int32_t* src = src_base + r * ld_in;
            for (long c = 0; c < C; ++c) dst[r * C + c] = src[c];
        }
    });
}

}  // extern "C"
