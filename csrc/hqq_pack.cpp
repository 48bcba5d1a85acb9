// SPDX-License-Identifier: Apache-2.0
//
// hqq_pack: multithreaded host-side bit packing/unpacking for checkpoint I/O.
//
// The TPU-native analogue of the reference's host/native kernel layer
// (/root/reference/hqq/kernels/hqq_aten_torch.cpp): on TPU the *device* side
// of dequantization is Pallas (hqq_tpu/ops/), but converting multi-gigabyte
// checkpoints between packed containers and integer codes is host work — this
// library does it at memory bandwidth with std::thread parallelism, exposed
// through a C ABI consumed via ctypes (no pybind11 in this environment).
//
// Layout contract (must match hqq_tpu/core/bitpack.py exactly):
//   chunk-split along axis 0, bitfield k = row-chunk k, MSB first.
//   4bit: p[i][j] = w[i][j]<<4 | w[i+s][j]            (s = rows/2)
//   2bit: 4 chunks at shifts 6,4,2,0
//   1bit: 8 chunks at shifts 7..0
//   3bit: rows padded to multiple of 10, 10 chunks in an int32 at shifts 27..0
//
// Build: make -C csrc   (produces libhqqpack.so)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

// Run fn(begin, end) over [0, n) on up to `threads` workers.
template <typename F>
void parallel_for(int64_t n, F fn, int threads_hint = 0) {
  int hw = threads_hint > 0 ? threads_hint
                            : static_cast<int>(std::thread::hardware_concurrency());
  hw = std::max(1, std::min<int>(hw, 64));
  int64_t chunk = (n + hw - 1) / hw;
  if (chunk <= 0) return;
  std::vector<std::thread> ts;
  for (int t = 0; t < hw; ++t) {
    int64_t b = t * chunk, e = std::min<int64_t>(n, b + chunk);
    if (b >= e) break;
    ts.emplace_back([=] { fn(b, e); });
  }
  for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// Pack integer codes (uint8 values < 2^bits) of a [rows, cols] row-major
// matrix into the chunk-split container. bits in {1,2,4,8};
// packed rows = rows / (8/bits) (caller guarantees divisibility).
void hqq_pack_u8(const uint8_t* in, uint8_t* out, int64_t rows, int64_t cols,
                 int bits, int threads) {
  const int r = 8 / bits;
  const int64_t step = rows / r;
  parallel_for(step, [=](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      uint8_t* dst = out + i * cols;
      const uint8_t* src0 = in + i * cols;
      for (int64_t j = 0; j < cols; ++j) {
        uint8_t acc = 0;
        for (int k = 0; k < r; ++k)
          acc |= static_cast<uint8_t>(src0[k * step * cols + j]
                                      << (bits * (r - 1 - k)));
        dst[j] = acc;
      }
    }
  }, threads);
}

// Unpack the chunk-split container back to codes; out has rows_packed * (8/bits) rows.
void hqq_unpack_u8(const uint8_t* in, uint8_t* out, int64_t rows_packed,
                   int64_t cols, int bits, int threads) {
  const int r = 8 / bits;
  const uint8_t mask = static_cast<uint8_t>((1u << bits) - 1u);
  parallel_for(rows_packed, [=](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      const uint8_t* src = in + i * cols;
      for (int k = 0; k < r; ++k) {
        uint8_t* dst = out + (k * rows_packed + i) * cols;
        const int shift = bits * (r - 1 - k);
        for (int64_t j = 0; j < cols; ++j) dst[j] = (src[j] >> shift) & mask;
      }
    }
  }, threads);
}

// 3-bit: rows are zero-padded to a multiple of 10 by the caller.
void hqq_pack_3bit_i32(const int32_t* in, int32_t* out, int64_t rows_padded,
                       int64_t cols, int threads) {
  const int64_t step = rows_padded / 10;
  parallel_for(step, [=](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      int32_t* dst = out + i * cols;
      for (int64_t j = 0; j < cols; ++j) {
        int32_t acc = 0;
        for (int k = 0; k < 10; ++k)
          acc |= in[(k * step + i) * cols + j] << (3 * (9 - k));
        dst[j] = acc;
      }
    }
  }, threads);
}

void hqq_unpack_3bit_i32(const int32_t* in, int32_t* out, int64_t rows_packed,
                         int64_t cols, int threads) {
  parallel_for(rows_packed, [=](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      const int32_t* src = in + i * cols;
      for (int k = 0; k < 10; ++k) {
        int32_t* dst = out + (k * rows_packed + i) * cols;
        const int shift = 3 * (9 - k);
        for (int64_t j = 0; j < cols; ++j) dst[j] = (src[j] >> shift) & 0x7;
      }
    }
  }, threads);
}

// Fused host-side dequantize: codes (packed u8 container) -> float32
// (w_q - zero) * scale with group-space layout [rows, cols], groups along
// axis 1 of the UNPACKED matrix (i.e. scale/zero per unpacked row).
// Used for checkpoint inspection / CPU-side verification.
void hqq_dequant_f32(const uint8_t* packed, const float* scale,
                     const float* zero, float* out, int64_t rows_packed,
                     int64_t cols, int bits, int threads) {
  const int r = 8 / bits;
  const uint8_t mask = static_cast<uint8_t>((1u << bits) - 1u);
  const int64_t rows = rows_packed * r;
  parallel_for(rows_packed, [=](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      const uint8_t* src = packed + i * cols;
      for (int k = 0; k < r; ++k) {
        const int64_t row = k * rows_packed + i;
        float* dst = out + row * cols;
        const float s = scale[row], z = zero[row];
        const int shift = bits * (r - 1 - k);
        for (int64_t j = 0; j < cols; ++j)
          dst[j] = (static_cast<float>((src[j] >> shift) & mask) - z) * s;
      }
    }
  }, threads);
  (void)rows;
}

int hqq_pack_version() { return 1; }

}  // extern "C"
