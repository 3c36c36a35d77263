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
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>

#ifndef DATR_NO_JPEG
#include <jpeglib.h>
#endif

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

// RGB canvas -> planar I420 (YUV 4:2:0, full-range BT.601 / JFIF matrix).
//
// The serving wire format's next rung below uint8 RGB: 1.5 bytes/px vs 3.
// Through a bandwidth-limited host->device link the upload IS the serving
// rate (ROADMAP round 4: 28.5 MB/s relay, end-to-end == link rate), and
// JPEG-sourced inputs are ALREADY 4:2:0 chroma-subsampled, so shipping
// YUV420 and reconstructing RGB on device loses nothing the client's JPEG
// hadn't already discarded. The device step (serve.py) upsamples chroma
// 2x-nearest and applies the inverse matrix; both fuse into the backbone's
// first conv.
//
// src is the zero-padded [H, W, 3] canvas; (real_h, real_w) is the unpadded
// extent. Chroma 2x2 block averages CLAMP their sample coords to the real
// extent so pad zeros never bleed into the chroma of real boundary pixels
// (blocks fully inside the pad replicate edge chroma — harmless, the device
// re-zeros pads from the mask). out: Y [H*W] then U,V [(H/2)*(W/2)] each;
// H and W must be even.
void rgb_to_yuv420(const uint8_t* src, int H, int W, int real_h, int real_w,
                   uint8_t* out) {
  uint8_t* Y = out;
  uint8_t* U = out + static_cast<int64_t>(H) * W;
  uint8_t* V = U + static_cast<int64_t>(H / 2) * (W / 2);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < H; ++y) {
    const uint8_t* row = src + static_cast<int64_t>(y) * W * 3;
    uint8_t* yrow = Y + static_cast<int64_t>(y) * W;
    for (int x = 0; x < W; ++x) {
      const float r = row[x * 3], g = row[x * 3 + 1], b = row[x * 3 + 2];
      yrow[x] = static_cast<uint8_t>(
          0.299f * r + 0.587f * g + 0.114f * b + 0.5f);
    }
  }
  const int ch = H / 2, cw = W / 2;
  const int yh = real_h > 0 ? real_h : H;
  const int yw = real_w > 0 ? real_w : W;
#pragma omp parallel for schedule(static)
  for (int by = 0; by < ch; ++by) {
    uint8_t* urow = U + static_cast<int64_t>(by) * cw;
    uint8_t* vrow = V + static_cast<int64_t>(by) * cw;
    for (int bx = 0; bx < cw; ++bx) {
      float r = 0, g = 0, b = 0;
      for (int dy = 0; dy < 2; ++dy) {
        const int sy = std::min(2 * by + dy, yh - 1);
        const uint8_t* row = src + static_cast<int64_t>(sy) * W * 3;
        for (int dx = 0; dx < 2; ++dx) {
          const int sx = std::min(2 * bx + dx, yw - 1);
          r += row[sx * 3];
          g += row[sx * 3 + 1];
          b += row[sx * 3 + 2];
        }
      }
      r *= 0.25f; g *= 0.25f; b *= 0.25f;
      // pure blue/red hit 256.0 before the cast — clamp (u8 cast of an
      // out-of-range float is UB)
      urow[bx] = static_cast<uint8_t>(std::clamp(
          128.0f - 0.168736f * r - 0.331264f * g + 0.5f * b + 0.5f,
          0.0f, 255.0f));
      vrow[bx] = static_cast<uint8_t>(std::clamp(
          128.0f + 0.5f * r - 0.418688f * g - 0.081312f * b + 0.5f,
          0.0f, 255.0f));
    }
  }
}

// ---------------- JPEG decode (libjpeg-turbo, 6.2 ABI) ----------------
//
// The serving HTTP front-end's per-request decode (serve.py:do_POST) is the
// measured gap between the HTTP surface and the in-process API: PIL's
// open/convert/asarray chain holds the GIL for most of its work, so N
// handler threads decode at ~1x speed. ctypes releases the GIL for the
// whole native call, so these decode in parallel across handler threads.
//
// scale_num selects libjpeg-turbo's DCT-domain scaling (scale_num/8, with
// scale_num in 1..8 here): a decode directly at a reduced size costs
// roughly (scale_num/8)^2 of the full decode. Full-scale (8) output is the
// same baseline islow IDCT PIL uses.

#ifndef DATR_NO_JPEG

namespace {
struct DatrJpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void datr_jpeg_error_exit(j_common_ptr cinfo) {
  // default handler calls exit(); longjmp back to the decode call instead
  DatrJpegErr* err = reinterpret_cast<DatrJpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void datr_jpeg_emit_message(j_common_ptr, int) {}  // silence warnings
}  // namespace

#endif  // DATR_NO_JPEG

// Parse the JPEG header only. Returns 0 and fills (h, w) on success,
// nonzero on parse failure / non-JPEG input / jpeg-less build.
int jpeg_probe(const uint8_t* data, int64_t len, int* h, int* w) {
#ifdef DATR_NO_JPEG
  (void)data; (void)len; (void)h; (void)w;
  return -1;
#else
  jpeg_decompress_struct cinfo;
  DatrJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = datr_jpeg_error_exit;
  jerr.pub.emit_message = datr_jpeg_emit_message;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  return 0;
#endif
}

// Decode to tightly-packed RGB uint8. out must hold
// ceil(h*scale_num/8) * ceil(w*scale_num/8) * 3 bytes (dims from
// jpeg_probe). Fills (out_h, out_w) with the actual decoded dims.
// Returns 0 on success; nonzero on error (corrupt stream, unsupported
// color space, undersized buffer).
int jpeg_decode_rgb(const uint8_t* data, int64_t len, int scale_num,
                    uint8_t* out, int64_t out_cap, int* out_h, int* out_w) {
#ifdef DATR_NO_JPEG
  (void)data; (void)len; (void)scale_num; (void)out; (void)out_cap;
  (void)out_h; (void)out_w;
  return -1;
#else
  jpeg_decompress_struct cinfo;
  DatrJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = datr_jpeg_error_exit;
  jerr.pub.emit_message = datr_jpeg_emit_message;
  bool started = false;
  if (setjmp(jerr.jump)) {
    if (started) jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.out_color_space = JCS_RGB;  // YCbCr/gray -> RGB in-decoder
  cinfo.scale_num = static_cast<unsigned>(std::clamp(scale_num, 1, 8));
  cinfo.scale_denom = 8;
  if (!jpeg_start_decompress(&cinfo)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  started = true;
  if (cinfo.output_components != 3 ||
      static_cast<int64_t>(cinfo.output_height) * cinfo.output_width * 3 >
          out_cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  const int64_t stride = static_cast<int64_t>(cinfo.output_width) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<int64_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  *out_h = static_cast<int>(cinfo.output_height);
  *out_w = static_cast<int>(cinfo.output_width);
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
#endif
}

}  // extern "C"
