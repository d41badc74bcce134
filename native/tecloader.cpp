// Native batch assembler for the sliding-window data pipeline.
//
// The reference gets its input-pipeline parallelism from torch DataLoader's C++
// worker pool (train.py:314-331). Here the equivalent is a small C library that
// assembles windowed batches with a thread pool: every window row X[t] is a
// contiguous (N*C) slab, so batch assembly is pure parallel memcpy at memory
// bandwidth, overlapping device compute via the Python-side prefetch thread.
//
// Exposed C API (ctypes, see tec_mollm_tpu/data/native_loader.py):
//   tec_gather_windows: x_out[b] = X[s_b : s_b+L_in)
//                       y_out[b] = Y[s_b + L_in - 1]
//                       tf_out[b] = TF[s_b : s_b+L_in)
//
// Build: g++ -O3 -shared -fPIC -o libtecloader.so tecloader.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

struct GatherArgs {
  const float* X;        // (T, N, C)
  const float* Y;        // (T, N, L_out)
  const int32_t* TF;     // (T, F_t)
  int64_t row_x;         // N*C floats per timestep
  int64_t row_y;         // N*L_out floats per timestep
  int64_t row_tf;        // F_t ints per timestep
  int64_t L_in;
  const int64_t* starts; // (B,)
  float* x_out;          // (B, L_in, N, C)
  float* y_out;          // (B, N, L_out)
  int32_t* tf_out;       // (B, L_in, F_t)
};

void gather_range(const GatherArgs& a, int64_t b0, int64_t b1) {
  for (int64_t b = b0; b < b1; ++b) {
    const int64_t s = a.starts[b];
    std::memcpy(a.x_out + b * a.L_in * a.row_x,
                a.X + s * a.row_x,
                sizeof(float) * a.L_in * a.row_x);
    std::memcpy(a.y_out + b * a.row_y,
                a.Y + (s + a.L_in - 1) * a.row_y,
                sizeof(float) * a.row_y);
    std::memcpy(a.tf_out + b * a.L_in * a.row_tf,
                a.TF + s * a.row_tf,
                sizeof(int32_t) * a.L_in * a.row_tf);
  }
}

}  // namespace

extern "C" {

// Returns 0 on success.
int tec_gather_windows(const float* X, const float* Y, const int32_t* TF,
                       int64_t T, int64_t N, int64_t C, int64_t L_out,
                       int64_t F_t, int64_t L_in, const int64_t* starts,
                       int64_t batch, int64_t num_threads,
                       float* x_out, float* y_out, int32_t* tf_out) {
  if (!X || !Y || !TF || !starts || !x_out || !y_out || !tf_out) return 1;
  for (int64_t b = 0; b < batch; ++b) {
    if (starts[b] < 0 || starts[b] + L_in > T) return 2;  // bounds
  }
  GatherArgs args{X, Y, TF, N * C, N * L_out, F_t, L_in, starts,
                  x_out, y_out, tf_out};

  int64_t workers = std::max<int64_t>(1, std::min<int64_t>(num_threads, batch));
  if (workers == 1) {
    gather_range(args, 0, batch);
    return 0;
  }
  std::vector<std::thread> pool;
  pool.reserve(workers);
  const int64_t chunk = (batch + workers - 1) / workers;
  for (int64_t w = 0; w < workers; ++w) {
    const int64_t b0 = w * chunk;
    const int64_t b1 = std::min(batch, b0 + chunk);
    if (b0 >= b1) break;
    pool.emplace_back([&args, b0, b1] { gather_range(args, b0, b1); });
  }
  for (auto& t : pool) t.join();
  return 0;
}

// Standardize in place with a thread pool: x = (x - mean[c]) / scale[c].
// x: (M, C) row-major. Used by the preprocess pipeline for large splits.
int tec_standardize(float* x, int64_t M, int64_t C, const double* mean,
                    const double* scale, int64_t num_threads) {
  if (!x || !mean || !scale) return 1;
  int64_t workers = std::max<int64_t>(1, num_threads);
  std::vector<std::thread> pool;
  const int64_t chunk = (M + workers - 1) / workers;
  for (int64_t w = 0; w < workers; ++w) {
    const int64_t m0 = w * chunk;
    const int64_t m1 = std::min(M, m0 + chunk);
    if (m0 >= m1) break;
    pool.emplace_back([=] {
      for (int64_t m = m0; m < m1; ++m) {
        float* row = x + m * C;
        for (int64_t c = 0; c < C; ++c) {
          row[c] = static_cast<float>((row[c] - mean[c]) / scale[c]);
        }
      }
    });
  }
  for (auto& t : pool) t.join();
  return 0;
}

}  // extern "C"
