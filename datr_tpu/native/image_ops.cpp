// Native host-side image preprocessing for the data loader.
//
// The reference's input pipeline leans on PIL + torchvision transforms
// (datasets/da_transforms.py); at C2F's 2048-px training resolution the
// python resize/normalize dominates host time. This single-pass kernel fuses
// bilinear resize (align_corners=False, PIL-equivalent sampling), ImageNet
// normalization, and padding into the static canvas — one write per output
// pixel, OpenMP across rows.
//
// Built by datr_tpu/native/build.py (g++ -O3 -shared); loaded via ctypes
// (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// src: uint8 [sh, sw, 3] row-major
// dst: float32 [canvas_h, canvas_w, 3], fully overwritten:
//   [0:dh, 0:dw]  = normalized bilinear resize of src
//   elsewhere     = 0
// mean/std: float[3]
void resize_normalize_pad(const uint8_t* src, int sh, int sw,
                          float* dst, int dh, int dw,
                          int canvas_h, int canvas_w,
                          const float* mean, const float* std_) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3], mean_[3];
  for (int c = 0; c < 3; ++c) {
    inv_std[c] = 1.0f / std_[c];
    mean_[c] = mean[c];
  }

#pragma omp parallel for schedule(static)
  for (int y = 0; y < canvas_h; ++y) {
    float* row = dst + static_cast<int64_t>(y) * canvas_w * 3;
    if (y >= dh) {
      std::memset(row, 0, sizeof(float) * canvas_w * 3);
      continue;
    }
    const float fy = (y + 0.5f) * sy - 0.5f;
    const int y0 = static_cast<int>(std::floor(fy));
    const float wy = fy - y0;
    const int y0c = std::clamp(y0, 0, sh - 1);
    const int y1c = std::clamp(y0 + 1, 0, sh - 1);
    const uint8_t* r0 = src + static_cast<int64_t>(y0c) * sw * 3;
    const uint8_t* r1 = src + static_cast<int64_t>(y1c) * sw * 3;

    for (int x = 0; x < dw; ++x) {
      const float fx = (x + 0.5f) * sx - 0.5f;
      const int x0 = static_cast<int>(std::floor(fx));
      const float wx = fx - x0;
      const int x0c = std::clamp(x0, 0, sw - 1);
      const int x1c = std::clamp(x0 + 1, 0, sw - 1);
      const float w00 = (1 - wx) * (1 - wy), w01 = wx * (1 - wy);
      const float w10 = (1 - wx) * wy, w11 = wx * wy;
      for (int c = 0; c < 3; ++c) {
        const float v = w00 * r0[x0c * 3 + c] + w01 * r0[x1c * 3 + c] +
                        w10 * r1[x0c * 3 + c] + w11 * r1[x1c * 3 + c];
        row[x * 3 + c] = (v * inv255 - mean_[c]) * inv_std[c];
      }
    }
    if (dw < canvas_w) {
      std::memset(row + dw * 3, 0, sizeof(float) * (canvas_w - dw) * 3);
    }
  }
}

// Standalone bilinear resize uint8 -> uint8 (for augmentation chains that
// need a resized PIL-compatible image without normalization).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw,
                        uint8_t* dst, int dh, int dw) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    const float fy = (y + 0.5f) * sy - 0.5f;
    const int y0 = static_cast<int>(std::floor(fy));
    const float wy = fy - y0;
    const int y0c = std::clamp(y0, 0, sh - 1);
    const int y1c = std::clamp(y0 + 1, 0, sh - 1);
    const uint8_t* r0 = src + static_cast<int64_t>(y0c) * sw * 3;
    const uint8_t* r1 = src + static_cast<int64_t>(y1c) * sw * 3;
    uint8_t* out = dst + static_cast<int64_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float fx = (x + 0.5f) * sx - 0.5f;
      const int x0 = static_cast<int>(std::floor(fx));
      const float wx = fx - x0;
      const int x0c = std::clamp(x0, 0, sw - 1);
      const int x1c = std::clamp(x0 + 1, 0, sw - 1);
      const float w00 = (1 - wx) * (1 - wy), w01 = wx * (1 - wy);
      const float w10 = (1 - wx) * wy, w11 = wx * wy;
      for (int c = 0; c < 3; ++c) {
        const float v = w00 * r0[x0c * 3 + c] + w01 * r0[x1c * 3 + c] +
                        w10 * r1[x0c * 3 + c] + w11 * r1[x1c * 3 + c];
        out[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

}  // extern "C"
