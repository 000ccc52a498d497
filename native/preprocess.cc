// rgrg_tpu native host pipeline: batched CXR preprocessing in C++.
//
// The serving host path decodes multi-megapixel grayscale X-rays and must
// resize (area average), center-pad to 512x512 and normalize them fast
// enough to keep the TPU fed. The reference leans on OpenCV via
// albumentations per image; this library processes a whole batch with a
// thread pool and writes straight into the caller's float32 NHWC buffer
// (zero Python-side copies). Loaded via ctypes (rgrg_tpu/data/native.py)
// with a numpy/cv2 fallback when the shared object is absent.
//
// Resize semantics match cv2.INTER_AREA for downscale: true fractional-
// coverage area averaging, implemented SEPARABLY (area coverage weights
// factor into per-row and per-column tables), then rounded to the nearest
// integer exactly like the reference pipeline's uint8 intermediate
// (albumentations resizes uint8->uint8 before normalizing).
//
// Build: make -C native   (produces librgrg_host.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Per-output-index coverage table for 1-D area downscaling.
struct AxisWeights {
  std::vector<int> start;       // first source index per output index
  std::vector<int> count;       // number of source taps
  std::vector<float> weight;    // flattened taps, normalized to sum 1
  std::vector<int> offset;      // start of each output's taps in `weight`
  int max_taps = 0;
};

AxisWeights area_axis_weights(int src, int dst) {
  AxisWeights w;
  const double scale = static_cast<double>(src) / dst;
  w.start.resize(dst);
  w.count.resize(dst);
  w.offset.resize(dst);
  for (int o = 0; o < dst; ++o) {
    const double a0 = o * scale, a1 = (o + 1) * scale;
    const int i0 = static_cast<int>(a0);
    const int i1 = std::min(static_cast<int>(std::ceil(a1)), src);
    w.start[o] = i0;
    w.count[o] = i1 - i0;
    w.offset[o] = static_cast<int>(w.weight.size());
    w.max_taps = std::max(w.max_taps, i1 - i0);
    double total = 0.0;
    for (int i = i0; i < i1; ++i) {
      const double cov =
          std::min<double>(i + 1, a1) - std::max<double>(i, a0);
      w.weight.push_back(static_cast<float>(cov));
      total += cov;
    }
    for (int i = w.offset[o]; i < (int)w.weight.size(); ++i)
      w.weight[i] = static_cast<float>(w.weight[i] / total);
  }
  return w;
}

// Separable area-average downscale, uint8 -> float32 (unrounded).
void resize_area(const uint8_t* src, int sh, int sw, float* dst, int dh,
                 int dw) {
  const AxisWeights wy = area_axis_weights(sh, dh);
  const AxisWeights wx = area_axis_weights(sw, dw);

  // horizontal pass: [sh, sw] u8 -> [sh, dw] f32
  std::vector<float> tmp(static_cast<size_t>(sh) * dw);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* irow = src + static_cast<int64_t>(y) * sw;
    float* orow = tmp.data() + static_cast<int64_t>(y) * dw;
    for (int o = 0; o < dw; ++o) {
      const float* tw = wx.weight.data() + wx.offset[o];
      const uint8_t* ip = irow + wx.start[o];
      float acc = 0.f;
      for (int k = 0; k < wx.count[o]; ++k) acc += tw[k] * ip[k];
      orow[o] = acc;
    }
  }
  // vertical pass: [sh, dw] -> [dh, dw]
  for (int o = 0; o < dh; ++o) {
    float* orow = dst + static_cast<int64_t>(o) * dw;
    const float* tw = wy.weight.data() + wy.offset[o];
    const float* base = tmp.data() + static_cast<int64_t>(wy.start[o]) * dw;
    for (int x = 0; x < dw; ++x) orow[x] = tw[0] * base[x];
    for (int k = 1; k < wy.count[o]; ++k) {
      const float* row = base + static_cast<int64_t>(k) * dw;
      const float f = tw[k];
      for (int x = 0; x < dw; ++x) orow[x] += f * row[x];
    }
  }
}

// Upscale taps for one axis, cv2 INTER_AREA "area-mode" semantics: for
// scale < 1 OpenCV's resize keeps INTER_AREA but computes the two-tap
// coefficients as s0 = floor(o*scale), f = (o+1) - (s0+1)*dst/src,
// f = f <= 0 ? 0 : f - floor(f) (resize.cpp's area branch) — NOT
// half-pixel-center bilinear, which diverges from cv2 by up to dozens of
// gray levels. We evaluate the taps in float (cv2's uint8 path runs them
// in 11-bit fixed point, a <=1-gray-level truncation difference that
// tests/test_resize_device.py documents).
void resize_area_upscale(const uint8_t* src, int sh, int sw, float* dst,
                         int dh, int dw) {
  // cv2 derives scale as the reciprocal of inv_scale (resize.cpp:
  // scale_x = 1./inv_scale_x) rather than src/dst directly; the 1-ulp
  // difference moves floor(o*scale) at outputs where o*scale lands on an
  // exact integer (e.g. 186->512 col 256), so replicate it exactly.
  const double invy = static_cast<double>(dh) / sh;
  const double invx = static_cast<double>(dw) / sw;
  const double sy = 1.0 / invy;
  const double sx = 1.0 / invx;
  for (int oy = 0; oy < dh; ++oy) {
    const int y0 = static_cast<int>(std::floor(oy * sy));
    double ly = (oy + 1) - (y0 + 1) * invy;
    ly = ly <= 0 ? 0.0 : ly - std::floor(ly);
    const int y1 = std::min(y0 + 1, sh - 1);
    for (int ox = 0; ox < dw; ++ox) {
      const int x0 = static_cast<int>(std::floor(ox * sx));
      double lx = (ox + 1) - (x0 + 1) * invx;
      lx = lx <= 0 ? 0.0 : lx - std::floor(lx);
      const int x1 = std::min(x0 + 1, sw - 1);
      const double v =
          (1 - ly) * ((1 - lx) * src[(int64_t)y0 * sw + x0] +
                      lx * src[(int64_t)y0 * sw + x1]) +
          ly * ((1 - lx) * src[(int64_t)y1 * sw + x0] +
                lx * src[(int64_t)y1 * sw + x1]);
      dst[(int64_t)oy * dw + ox] = static_cast<float>(v);
    }
  }
}

// One image: longest-max-size resize -> round to uint8 domain (parity with
// the reference's uint8 intermediate) -> center pad -> normalize into the
// [size, size] float32 slab `out`.
void preprocess_one(const uint8_t* src, int sh, int sw, float* out, int size,
                    float mean, float stddev, float max_pixel) {
  const double scale = static_cast<double>(size) / std::max(sh, sw);
  // half-EVEN tie rounding (nearbyint under FE_TONEAREST) — albumentations'
  // LongestMaxSize rounds dims with Python round; lround's half-away would
  // shift the resized window one row on tie shapes like 961x1024
  const int dh = std::max(1, (int)std::nearbyint(sh * scale));
  const int dw = std::max(1, (int)std::nearbyint(sw * scale));
  std::vector<float> resized((size_t)dh * dw);
  if (dh == sh && dw == sw) {
    for (size_t i = 0; i < resized.size(); ++i) resized[i] = src[i];
  } else if (scale < 1.0) {
    resize_area(src, sh, sw, resized.data(), dh, dw);
  } else {
    resize_area_upscale(src, sh, sw, resized.data(), dh, dw);
  }
  const int top = std::max((size - dh) / 2, 0);
  const int left = std::max((size - dw) / 2, 0);
  const float denom = stddev * max_pixel;
  const float bias = mean * max_pixel;
  const float pad_val = (0.0f - bias) / denom;  // zeros, normalized
  for (int i = 0; i < size * size; ++i) out[i] = pad_val;
  for (int y = 0; y < dh; ++y) {
    float* orow = out + (int64_t)(y + top) * size + left;
    const float* irow = resized.data() + (int64_t)y * dw;
    for (int x = 0; x < dw; ++x) {
      const float q = std::nearbyintf(irow[x]);  // uint8 quantization
      orow[x] = (q - bias) / denom;
    }
  }
}

}  // namespace

extern "C" {

// Batched preprocessing.
//  srcs: array of n pointers to uint8 grayscale images
//  heights/widths: per-image dims
//  out: float32 [n, size, size] buffer (caller-allocated)
//  threads: worker count (0 -> hardware_concurrency)
void rgrg_preprocess_batch(const uint8_t** srcs, const int* heights,
                           const int* widths, int n, float* out, int size,
                           float mean, float stddev, float max_pixel,
                           int threads) {
  if (threads <= 0) threads = (int)std::thread::hardware_concurrency();
  threads = std::max(1, std::min(threads, n));
  std::atomic<int> next(0);
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      preprocess_one(srcs[i], heights[i], widths[i],
                     out + (int64_t)i * size * size, size, mean, stddev,
                     max_pixel);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// Single-image resize entry points (for tests / partial pipelines).
void rgrg_resize_area(const uint8_t* src, int sh, int sw, float* dst, int dh,
                      int dw) {
  resize_area(src, sh, sw, dst, dh, dw);
}

}  // extern "C"
