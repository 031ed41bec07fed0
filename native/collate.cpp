// Native collate kernels for the host-side data path.
//
// TPU-native analog of the reference's native layer: where the reference ships
// a CUDA op for the device hot loop (models/ops/src/**), this framework's
// device hot loop is a Pallas kernel — and the *host* hot loop (batch
// assembly: zero-pad + nearest-resample of feature tensors and masks,
// reference dataset/anet_video.py:215-345) lives here as a threaded C++
// library, loaded via ctypes (no pybind dependency).
//
// All functions operate on caller-allocated contiguous buffers.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

// run fn(b) for b in [0, n) across hardware threads
template <typename F>
void parallel_for(int64_t n, F fn) {
  const int64_t hw = static_cast<int64_t>(std::thread::hardware_concurrency());
  const int64_t workers = std::max<int64_t>(1, std::min<int64_t>(hw, n));
  if (workers == 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(workers);
  for (int64_t w = 0; w < workers; ++w) {
    threads.emplace_back([=]() {
      for (int64_t i = w; i < n; i += workers) fn(i);
    });
  }
  for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

// Nearest-neighbor temporal resize, torch F.interpolate semantics:
// out[b, i, :] = in[b, (i * t_in) / t_out, :].
// in:  (batch, t_in, dim) float32; out: (batch, t_out, dim) float32.
void resize_nearest_f32(const float* in, float* out, int64_t batch,
                        int64_t t_in, int64_t t_out, int64_t dim) {
  parallel_for(batch, [=](int64_t b) {
    const float* src = in + b * t_in * dim;
    float* dst = out + b * t_out * dim;
    for (int64_t i = 0; i < t_out; ++i) {
      const int64_t j = (i * t_in) / t_out;
      std::memcpy(dst + i * dim, src + j * dim, sizeof(float) * dim);
    }
  });
}

// Same for boolean masks. in: (batch, t_in) uint8; out: (batch, t_out) uint8.
void resize_nearest_u8(const uint8_t* in, uint8_t* out, int64_t batch,
                       int64_t t_in, int64_t t_out) {
  parallel_for(batch, [=](int64_t b) {
    const uint8_t* src = in + b * t_in;
    uint8_t* dst = out + b * t_out;
    for (int64_t i = 0; i < t_out; ++i) dst[i] = src[(i * t_in) / t_out];
  });
}

// Fused pad-and-resize: per sample, copy length[b] valid rows of a ragged
// feature list (concatenated in `in`, offsets in `offsets`), zero-pad to
// max_len, then nearest-resize to t_out. Emits resized features AND the
// resized pad mask (1 = padding) in one pass — the whole collate hot loop.
// in: (sum_len, dim); offsets: (batch+1,); out: (batch, t_out, dim);
// out_mask: (batch, t_out).
void pad_resize_batch_f32(const float* in, const int64_t* offsets,
                          float* out, uint8_t* out_mask, int64_t batch,
                          int64_t max_len, int64_t t_out, int64_t dim) {
  parallel_for(batch, [=](int64_t b) {
    const int64_t start = offsets[b];
    const int64_t len = offsets[b + 1] - start;
    const float* src = in + start * dim;
    float* dst = out + b * t_out * dim;
    uint8_t* m = out_mask + b * t_out;
    for (int64_t i = 0; i < t_out; ++i) {
      const int64_t j = (i * max_len) / t_out;  // index into padded axis
      if (j < len) {
        std::memcpy(dst + i * dim, src + j * dim, sizeof(float) * dim);
        m[i] = 0;
      } else {
        std::memset(dst + i * dim, 0, sizeof(float) * dim);
        m[i] = 1;
      }
    }
  });
}

}  // extern "C"
