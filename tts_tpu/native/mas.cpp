// Monotonic Alignment Search — C++ host kernel (OpenMP over batch).
//
// Native equivalent of the reference's Cython kernel
// (TTS/tts/utils/monotonic_align/core.pyx): in-place Viterbi DP over
// [T_x, T_y] log-likelihoods followed by backtracking into a 0/1 path.
// Used as the host-side fallback for preprocessing tools; the on-TPU path
// is the lax.scan version in tts_tpu/ops/mas.py.
//
// Build: make -C tts_tpu/native   (produces libmas.so, loaded via ctypes)

#include <algorithm>
#include <cstdint>

namespace {

void maximum_path_each(int32_t* path, float* value, int t_x, int t_y,
                       int stride_x, float max_neg_val) {
  // forward DP in place: value[x, y] += max(value[x, y-1], value[x-1, y-1])
  for (int y = 0; y < t_y; ++y) {
    int x_lo = std::max(0, t_x + y - t_y);
    int x_hi = std::min(t_x, y + 1);
    for (int x = x_lo; x < x_hi; ++x) {
      float v_cur = (x == y) ? max_neg_val : value[x * stride_x + (y - 1)];
      float v_prev;
      if (x == 0) {
        v_prev = (y == 0) ? 0.0f : max_neg_val;
      } else {
        v_prev = value[(x - 1) * stride_x + (y - 1)];
      }
      value[x * stride_x + y] += std::max(v_cur, v_prev);
    }
  }
  // backtrack
  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[index * stride_x + y] = 1;
    if (index != 0 &&
        (index == y ||
         value[index * stride_x + (y - 1)] < value[(index - 1) * stride_x + (y - 1)])) {
      --index;
    }
  }
}

}  // namespace

extern "C" {

// paths: [B, T_x, T_y] int32 (zero-initialized), values: [B, T_x, T_y] float32
// (consumed in place), t_xs/t_ys: [B] int32 valid lengths.
void maximum_path_c(int32_t* paths, float* values, const int32_t* t_xs,
                    const int32_t* t_ys, int batch, int t_x_max, int t_y_max,
                    float max_neg_val) {
#pragma omp parallel for schedule(dynamic)
  for (int b = 0; b < batch; ++b) {
    maximum_path_each(paths + (int64_t)b * t_x_max * t_y_max,
                      values + (int64_t)b * t_x_max * t_y_max, t_xs[b], t_ys[b],
                      t_y_max, max_neg_val);
  }
}

}  // extern "C"
