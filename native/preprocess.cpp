// Native image preprocessing for the ImageNet eval pipeline.
//
// The reference's data path leans on torchvision's C-backed transforms
// (/root/reference/utils.py:593-615: Resize(256, bicubic) -> CenterCrop(224)
// -> Normalize).  Here the same hot loop — antialiased separable cubic
// resize, crop, normalize, HWC->CHW — is a small C++ library driven via
// ctypes (utils/native_preprocess.py); PIL only decodes the JPEG.
//
// The resampler follows PIL's convolution approach: cubic kernel (a = -0.5),
// support scaled by the downscale ratio (antialiasing), per-axis separable
// passes — so outputs match PIL.Image.resize(BICUBIC) closely.
//
// Build: g++ -O3 -fPIC -shared -o libevtpre.so preprocess.cpp  (see Makefile)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline double cubic(double x) {
  // Keys cubic kernel, a = -0.5 (PIL's BICUBIC)
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Weights {
  std::vector<int> bounds;    // [out] start index
  std::vector<int> counts;    // [out] number of taps
  std::vector<float> coefs;  // [out * kmax]
  int kmax = 0;
};

// Precompute convolution weights for one axis (PIL-style antialiasing).
Weights precompute(int in_size, int out_size) {
  Weights w;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;  // cubic support = 2
  w.kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  w.bounds.resize(out_size);
  w.counts.resize(out_size);
  w.coefs.assign(static_cast<size_t>(out_size) * w.kmax, 0.0);

  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(std::floor(center - support));
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(std::ceil(center + support));
    if (xmax > in_size) xmax = in_size;

    float* k = &w.coefs[static_cast<size_t>(xx) * w.kmax];
    double total = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      const double v = cubic((x + 0.5 - center) / filterscale);
      k[x - xmin] = static_cast<float>(v);
      total += v;
    }
    if (total != 0.0)
      for (int i = 0; i < xmax - xmin; ++i)
        k[i] = static_cast<float>(k[i] / total);
    w.bounds[xx] = xmin;
    w.counts[xx] = xmax - xmin;
  }
  return w;
}

}  // namespace

extern "C" {

// Antialiased bicubic resize, uint8 HWC -> float HWC.
void evt_resize_bicubic(const uint8_t* src, int in_h, int in_w, int channels,
                        float* dst, int out_h, int out_w) {
  const Weights wh = precompute(in_w, out_w);
  const Weights wv = precompute(in_h, out_h);

  // horizontal pass: [in_h, out_w, c]
  std::vector<float> tmp(static_cast<size_t>(in_h) * out_w * channels);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * in_w * channels;
    for (int xx = 0; xx < out_w; ++xx) {
      const float* k = &wh.coefs[static_cast<size_t>(xx) * wh.kmax];
      const int x0 = wh.bounds[xx];
      const int n = wh.counts[xx];
      float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f;
      const uint8_t* p = row + x0 * channels;
      for (int i = 0; i < n; ++i, p += channels) {
        const float kv = k[i];
        acc0 += p[0] * kv;
        if (channels > 1) acc1 += p[1] * kv;
        if (channels > 2) acc2 += p[2] * kv;
      }
      float* o = &tmp[(static_cast<size_t>(y) * out_w + xx) * channels];
      o[0] = acc0;
      if (channels > 1) o[1] = acc1;
      if (channels > 2) o[2] = acc2;
    }
  }
  // vertical pass
  for (int yy = 0; yy < out_h; ++yy) {
    const float* k = &wv.coefs[static_cast<size_t>(yy) * wv.kmax];
    const int y0 = wv.bounds[yy];
    const int n = wv.counts[yy];
    float* drow = dst + static_cast<size_t>(yy) * out_w * channels;
    std::memset(drow, 0, sizeof(float) * out_w * channels);
    for (int i = 0; i < n; ++i) {
      const float kv = k[i];
      const float* srow = &tmp[static_cast<size_t>(y0 + i) * out_w * channels];
      for (int x = 0; x < out_w * channels; ++x) drow[x] += srow[x] * kv;
    }
  }
}

// Full eval transform: shorter-side resize -> center crop -> /255 ->
// normalize -> CHW.  Matches utils/imagenet.preprocess_image.
void evt_preprocess(const uint8_t* rgb, int in_h, int in_w, int resize,
                    int crop, const float* mean, const float* stddev,
                    float* out_chw) {
  int nw, nh;
  if (in_w < in_h) {
    nw = resize;
    nh = static_cast<int>(std::lround(static_cast<double>(in_h) * resize / in_w));
  } else {
    nh = resize;
    nw = static_cast<int>(std::lround(static_cast<double>(in_w) * resize / in_h));
  }
  std::vector<float> resized(static_cast<size_t>(nh) * nw * 3);
  evt_resize_bicubic(rgb, in_h, in_w, 3, resized.data(), nh, nw);

  const int left = (nw - crop) / 2;
  const int top = (nh - crop) / 2;
  for (int y = 0; y < crop; ++y) {
    for (int x = 0; x < crop; ++x) {
      const float* px = &resized[(static_cast<size_t>(top + y) * nw + (left + x)) * 3];
      for (int c = 0; c < 3; ++c) {
        // PIL converts the float resample result back to uint8 (round+clamp)
        // before ToTensor; replicate for bit-compatible outputs.
        float v = std::min(255.0f, std::max(0.0f, std::round(px[c])));
        out_chw[(static_cast<size_t>(c) * crop + y) * crop + x] =
            (v / 255.0f - mean[c]) / stddev[c];
      }
    }
  }
}

// Batched variant driven from one call (amortizes ctypes overhead).
void evt_preprocess_batch(const uint8_t* const* rgbs, const int* hs,
                          const int* ws, int count, int resize, int crop,
                          const float* mean, const float* stddev,
                          float* out) {
  const size_t stride = static_cast<size_t>(3) * crop * crop;
  for (int i = 0; i < count; ++i)
    evt_preprocess(rgbs[i], hs[i], ws[i], resize, crop, mean, stddev,
                   out + i * stride);
}

}  // extern "C"
