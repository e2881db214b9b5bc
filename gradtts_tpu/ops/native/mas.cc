// Monotonic Alignment Search — native C++/OpenMP implementation.
//
// CPU reference / parity oracle for the on-device JAX scan DP in
// gradtts_tpu/ops/mas.py. Plays the role of the reference's one native
// component (the Cython/OpenMP extension at
// /root/reference/model/monotonic_align/core.pyx:9-45) with the same
// recurrence and backtrace, batch-parallelized with OpenMP.
//
// Exposed with a plain C ABI and bound from Python via ctypes
// (gradtts_tpu/ops/native/__init__.py); no pybind11 required.

#include <algorithm>
#include <atomic>
#include <cstdint>

namespace {

constexpr float kMaxNeg = -1e9f;

// One (t_x, t_y) problem. `value` is row-major [tx_max, ty_max] and is
// updated in place with the accumulated DP scores; `path` receives the
// binary alignment.
void maximum_path_single(int32_t* path, float* value, int t_x, int t_y,
                         int ty_max) {
  for (int y = 0; y < t_y; ++y) {
    const int lo = std::max(0, t_x + y - t_y);
    const int hi = std::min(t_x, y + 1);
    for (int x = lo; x < hi; ++x) {
      const float v_cur = (x == y) ? kMaxNeg : value[x * ty_max + y - 1];
      float v_prev;
      if (x == 0) {
        v_prev = (y == 0) ? 0.0f : kMaxNeg;
      } else {
        v_prev = value[(x - 1) * ty_max + y - 1];
      }
      value[x * ty_max + y] += std::max(v_cur, v_prev);
    }
  }

  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[index * ty_max + y] = 1;
    if (index != 0 &&
        (index == y ||
         value[index * ty_max + y - 1] < value[(index - 1) * ty_max + y - 1])) {
      --index;
    }
  }
}

}  // namespace

extern "C" {

// Batched entry point. paths/values: [b, tx_max, ty_max] row-major.
void gradtts_maximum_path(int32_t* paths, float* values, const int32_t* t_xs,
                          const int32_t* t_ys, int b, int tx_max, int ty_max) {
  // The implicit barrier at the end of the parallel-for already orders
  // worker writes before the caller's reads, but libgomp's barrier is not
  // TSan-instrumented; this release/acquire pair makes the happens-before
  // edge visible to ThreadSanitizer (one relaxed-cost atomic per item).
  std::atomic<int> done(0);
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < b; ++i) {
    maximum_path_single(paths + static_cast<int64_t>(i) * tx_max * ty_max,
                        values + static_cast<int64_t>(i) * tx_max * ty_max,
                        t_xs[i], t_ys[i], ty_max);
    done.fetch_add(1, std::memory_order_release);
  }
  (void)done.load(std::memory_order_acquire);
}

}  // extern "C"
