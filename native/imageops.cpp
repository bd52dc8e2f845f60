// Native host-side image ops for the input pipeline.
//
// The reference feeds torchvision/PIL CPU transforms from Python worker
// processes (reference data_loader.py:343-371, num_workers=4). Our host is
// thin (TPU does the augmentation); what remains on the host is decode +
// canvas resize. This file implements the canvas step natively:
// antialiased triangle-filter (PIL BILINEAR-equivalent) resize of uint8
// HWC images + center crop to a square canvas, exposed via a C ABI for
// ctypes. Threading is handled by the caller.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct FilterTable {
  // For each output pixel: window [bound0, bound1) and weights.
  std::vector<int> bounds;     // 2 * out_size
  std::vector<double> weights; // out_size * max_support
  int ksize;
};

// Triangle (linear) filter, antialiased on downscale — matches PIL's
// BILINEAR resampling convolution.
static double triangle(double x) {
  if (x < 0.0) x = -x;
  if (x < 1.0) return 1.0 - x;
  return 0.0;
}

static FilterTable build_table(int in_size, int out_size) {
  FilterTable t;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.ksize = ksize;
  t.bounds.resize(2 * out_size);
  t.weights.resize(static_cast<size_t>(out_size) * ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(std::max(0.0, std::floor(center - support)));
    int xmax = static_cast<int>(std::min(static_cast<double>(in_size),
                                         std::ceil(center + support)));
    double ww = 0.0;
    double* w = &t.weights[static_cast<size_t>(xx) * ksize];
    int n = xmax - xmin;
    for (int x = 0; x < n; ++x) {
      double wv = triangle((x + xmin - center + 0.5) / filterscale);
      w[x] = wv;
      ww += wv;
    }
    if (ww != 0.0) {
      for (int x = 0; x < n; ++x) w[x] /= ww;
    }
    t.bounds[2 * xx] = xmin;
    t.bounds[2 * xx + 1] = n;
  }
  return t;
}

static inline uint8_t clip8(double v) {
  if (v <= 0.0) return 0;
  if (v >= 255.0) return 255;
  return static_cast<uint8_t>(v + 0.5);
}

// Resize HWC uint8 image with separable triangle filter.
static void resample(const uint8_t* src, int h, int w, int c, uint8_t* dst,
                     int oh, int ow) {
  FilterTable th = build_table(w, ow);
  std::vector<double> tmp(static_cast<size_t>(h) * ow * c);
  // horizontal pass
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * c;
    double* orow = &tmp[static_cast<size_t>(y) * ow * c];
    for (int xx = 0; xx < ow; ++xx) {
      int xmin = th.bounds[2 * xx];
      int n = th.bounds[2 * xx + 1];
      const double* wgt = &th.weights[static_cast<size_t>(xx) * th.ksize];
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int x = 0; x < n; ++x)
          acc += row[(xmin + x) * c + ch] * wgt[x];
        orow[xx * c + ch] = acc;
      }
    }
  }
  // vertical pass
  FilterTable tv = build_table(h, oh);
  for (int yy = 0; yy < oh; ++yy) {
    int ymin = tv.bounds[2 * yy];
    int n = tv.bounds[2 * yy + 1];
    const double* wgt = &tv.weights[static_cast<size_t>(yy) * tv.ksize];
    uint8_t* orow = dst + static_cast<size_t>(yy) * ow * c;
    for (int xx = 0; xx < ow; ++xx) {
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int y = 0; y < n; ++y)
          acc += tmp[(static_cast<size_t>(ymin + y) * ow + xx) * c + ch] * wgt[y];
        orow[xx * c + ch] = clip8(acc);
      }
    }
  }
}

}  // namespace

extern "C" {

// Resize shortest side to `size`, center-crop size x size (the host canvas
// convention of mdhs_tpu.data.datasets._resize_center_square).
void resize_center_square_u8(const uint8_t* src, int h, int w, int c,
                             uint8_t* dst, int size) {
  int nw, nh;
  if (w <= h) {
    nw = size;
    nh = std::max(size, static_cast<int>(std::lround(
                            static_cast<double>(h) * size / w)));
  } else {
    nh = size;
    nw = std::max(size, static_cast<int>(std::lround(
                            static_cast<double>(w) * size / h)));
  }
  std::vector<uint8_t> resized(static_cast<size_t>(nh) * nw * c);
  resample(src, h, w, c, resized.data(), nh, nw);
  int left = (nw - size) / 2;
  int top = (nh - size) / 2;
  for (int y = 0; y < size; ++y) {
    std::memcpy(dst + static_cast<size_t>(y) * size * c,
                resized.data() + (static_cast<size_t>(top + y) * nw + left) * c,
                static_cast<size_t>(size) * c);
  }
}

// Plain antialiased resize to (oh, ow).
void resize_u8(const uint8_t* src, int h, int w, int c, uint8_t* dst, int oh,
               int ow) {
  resample(src, h, w, c, dst, oh, ow);
}

}  // extern "C"
