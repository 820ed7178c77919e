// Native all-threshold contour-box sweep for the WSOL benchmark protocol.
//
// Role: replaces the per-threshold cv2.threshold+findContours loop of the
// exact evaluation protocol (~1000 OpenCV passes per image,
// /root/reference/dlib/metrics/wsol_metrics.py:127-197) with ONE
// union-find pass per image over the uint8-quantized scoremap:
//
//  - outer contours: 8-connected foreground components of  q > t  for
//    every threshold t at once, via a max-tree (pixels added in
//    descending value, components merged with union-find, per-level
//    root bounding boxes snapshotted);
//  - inner (hole) contours, which cv2.RETR_TREE also returns: 4-connected
//    background components not touching the border, via the dual
//    min-tree; a hole's inner-contour boundingRect equals the hole bbox
//    dilated by 1 (the contour is traced on the surrounding foreground).
//
// Semantics matched bit-exactly to metrics/wsol.scoremap_to_boxes with
// multi_contour=True (strict > threshold on uint8, x1/y1 clamped to
// W-1/H-1, empty mask -> one [0,0,0,0] box); parity is enforced by
// tests/test_metrics.py::test_native_sweep_matches_cv2_protocol.
//
// The entry point also folds in the (+1-pixel) IoU against GT boxes so
// one call returns the per-threshold best-IoU vector the BoxEvaluator
// counters need — no per-tau python work remains.  OpenMP parallelizes
// over the images of a batch.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC boxsweep.cpp \
//            -o libboxsweep.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct DSU {
  std::vector<int32_t> parent;
  // per-root bbox (x0, y0, x1, y1) in pixel coords and border flag
  std::vector<int32_t> bx0, by0, bx1, by1;
  std::vector<uint8_t> border;

  void init(int n) {
    parent.assign(n, -1);
    bx0.assign(n, 0); by0.assign(n, 0);
    bx1.assign(n, 0); by1.assign(n, 0);
    border.assign(n, 0);
  }
  inline int find(int a) {
    int root = a;
    while (parent[root] != root) root = parent[root];
    while (parent[a] != root) { int nxt = parent[a]; parent[a] = root; a = nxt; }
    return root;
  }
  inline void make(int a, int x, int y, bool on_border) {
    parent[a] = a;
    bx0[a] = bx1[a] = x;
    by0[a] = by1[a] = y;
    border[a] = on_border;
  }
  // returns the surviving root
  inline int unite(int a, int b) {
    a = find(a); b = find(b);
    if (a == b) return a;
    // union by (implicit) arbitrary order; attach b under a
    parent[b] = a;
    bx0[a] = std::min(bx0[a], bx0[b]);
    by0[a] = std::min(by0[a], by0[b]);
    bx1[a] = std::max(bx1[a], bx1[b]);
    by1[a] = std::max(by1[a], by1[b]);
    border[a] |= border[b];
    return a;
  }
};

// +1-pixel IoU of the reference (wsol_metrics.py:77-124): box areas use
// (x1 - x0 + 1) * (y1 - y0 + 1); degenerate (x1 <= x0 or y1 <= y0 after
// clamping semantics) pairs give 0 like iou_matrix_np.
// double math end-to-end: the counters compare IoU >= sigma at exact
// decimal boundaries, so float rounding could flip a hit vs the f64
// python oracle
inline double iou_plus1(const float* a, const float* b) {
  double iw = std::min<double>(a[2], b[2]) - std::max<double>(a[0], b[0]) + 1.0;
  double ih = std::min<double>(a[3], b[3]) - std::max<double>(a[1], b[1]) + 1.0;
  double inter = std::max(iw, 0.0) * std::max(ih, 0.0);
  double aa = (a[2] - a[0] + 1.0) * (a[3] - a[1] + 1.0);
  double ab = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0);
  double denom = aa + ab - inter;
  if (denom <= 0.0) return 0.0;
  return inter / denom;
}

// Sweep one image: for each of the 256 possible thresholds t, the set of
// contour bounding boxes of mask(q > t); evaluated lazily as best-IoU
// against gt, or appended to an explicit box list for needed levels.
struct LevelBoxes {
  // boxes for levels [0, 255]: level_ptr[t]..level_ptr[t+1] into flat
  std::vector<float> flat;        // x0 y0 x1 y1 per box
  std::vector<int32_t> level_ptr; // 257 entries
};

void sweep_one(const uint8_t* q, int h, int w, LevelBoxes& out) {
  const int n = h * w;
  // bucket pixels by value
  std::vector<int32_t> count(257, 0);
  for (int i = 0; i < n; ++i) count[q[i] + 1]++;
  for (int v = 0; v < 256; ++v) count[v + 1] += count[v];
  std::vector<int32_t> order(n);
  {
    std::vector<int32_t> pos(count.begin(), count.end() - 1);
    for (int i = 0; i < n; ++i) order[pos[q[i]]++] = i;
  }

  // ---------------- max-tree: foreground 8-connected components
  DSU fg;
  fg.init(n);
  std::vector<int32_t> roots;           // active root list (lazy-compacted)
  roots.reserve(1024);

  // fg_boxes_at[t]: snapshot of component boxes for threshold t
  // (mask q > t is complete after all pixels with value >= t+1 added)
  std::vector<std::vector<float>> level_fg(256);
  int idx = n;                          // walk order[] from the top value
  for (int v = 255; v >= 1; --v) {
    // add pixels with q == v  (order[count[v] .. count[v+1]-1])
    for (int k = count[v]; k < count[v + 1]; ++k) {
      int p = order[k];
      int y = p / w, x = p - y * w;
      fg.make(p, x, y, false);
      roots.push_back(p);
      // union with already-added neighbours (q >= v), 8-connectivity
      const int y0 = std::max(y - 1, 0), y1 = std::min(y + 1, h - 1);
      const int x0 = std::max(x - 1, 0), x1 = std::min(x + 1, w - 1);
      for (int ny = y0; ny <= y1; ++ny)
        for (int nx = x0; nx <= x1; ++nx) {
          int np = ny * w + nx;
          if (np != p && fg.parent[np] != -1) fg.unite(p, np);
        }
    }
    (void)idx;
    // threshold t = v - 1 now complete
    int t = v - 1;
    // compact roots + snapshot
    std::vector<float>& dst = level_fg[t];
    int wr = 0;
    for (int r : roots) {
      if (fg.parent[r] == r) {
        roots[wr++] = r;
      }
    }
    roots.resize(wr);
    dst.reserve(wr * 4);
    for (int r : roots) {
      dst.push_back(static_cast<float>(fg.bx0[r]));
      dst.push_back(static_cast<float>(fg.by0[r]));
      // benchmark convention: boundingRect end exclusive then clamped
      dst.push_back(static_cast<float>(std::min(fg.bx1[r] + 1, w - 1)));
      dst.push_back(static_cast<float>(std::min(fg.by1[r] + 1, h - 1)));
    }
  }
  // t = 255: mask q > 255 is empty -> no boxes recorded (handled below)

  // ---------------- min-tree: holes (4-connected background components
  // not touching the border) per threshold, with an active-root list
  // maintained like the fg pass
  DSU bg;
  bg.init(n);
  std::vector<std::vector<float>> level_holes(256);
  std::vector<int32_t> broots;
  broots.reserve(1024);
  for (int v = 0; v <= 255; ++v) {
    for (int k = count[v]; k < count[v + 1]; ++k) {
      int p = order[k];
      int y = p / w, x = p - y * w;
      bool on_border = (x == 0 || y == 0 || x == w - 1 || y == h - 1);
      bg.make(p, x, y, on_border);
      broots.push_back(p);
      if (x > 0 && bg.parent[p - 1] != -1) bg.unite(p, p - 1);
      if (x < w - 1 && bg.parent[p + 1] != -1) bg.unite(p, p + 1);
      if (y > 0 && bg.parent[p - w] != -1) bg.unite(p, p - w);
      if (y < h - 1 && bg.parent[p + w] != -1) bg.unite(p, p + w);
    }
    int t = v;
    int wr = 0;
    for (int r : broots)
      if (bg.parent[r] == r) broots[wr++] = r;
    broots.resize(wr);
    std::vector<float>& dst = level_holes[t];
    for (int r : broots) {
      if (bg.border[r]) continue;       // touches border: not a hole
      // inner-contour boundingRect = hole bbox dilated by 1 (contour is
      // traced on the surrounding foreground ring); exclusive end + clamp
      float hx0 = static_cast<float>(bg.bx0[r] - 1);
      float hy0 = static_cast<float>(bg.by0[r] - 1);
      float hx1 = static_cast<float>(std::min(bg.bx1[r] + 2, w - 1));
      float hy1 = static_cast<float>(std::min(bg.by1[r] + 2, h - 1));
      dst.push_back(hx0);
      dst.push_back(hy0);
      dst.push_back(hx1);
      dst.push_back(hy1);
    }
  }

  // ---------------- flatten levels: fg boxes then hole boxes; empty
  // level -> single all-zero box (cv2 "no contours" convention)
  out.level_ptr.assign(257, 0);
  size_t total = 0;
  for (int t = 0; t < 256; ++t) {
    size_t nb = level_fg[t].size() / 4 + level_holes[t].size() / 4;
    if (nb == 0) nb = 1;
    total += nb;
    out.level_ptr[t + 1] = static_cast<int32_t>(total);
  }
  out.flat.resize(total * 4);
  for (int t = 0; t < 256; ++t) {
    float* dst = out.flat.data() + static_cast<size_t>(out.level_ptr[t]) * 4;
    size_t nfg = level_fg[t].size();
    size_t nh = level_holes[t].size();
    if (nfg + nh == 0) {
      dst[0] = dst[1] = dst[2] = dst[3] = 0.0f;
      continue;
    }
    std::memcpy(dst, level_fg[t].data(), nfg * sizeof(float));
    std::memcpy(dst + nfg, level_holes[t].data(), nh * sizeof(float));
  }
}

}  // namespace

extern "C" {

// Per-image all-threshold best-IoU sweep.
//   cams:   (n, h, w) float32 in [0, 1]
//   taus:   (n_tau,) float64
//   gt:     (n, max_gt, 4) float32 x0y0x1y1; gt_count: (n,)
//   best:   (n, n_tau) float64 out — max IoU over this level's boxes
//   nboxes: (n, n_tau) int32 out — number of contour boxes at the level
// Returns 0.
int sweep_best_iou(const float* cams, int n, int h, int w,
                   const double* taus, int n_tau,
                   const float* gt, const int32_t* gt_count, int max_gt,
                   double* best, int32_t* nboxes) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < n; ++i) {
    const float* cam = cams + static_cast<size_t>(i) * h * w;
    const int npx = h * w;
    std::vector<uint8_t> q(static_cast<size_t>(npx));
    uint8_t peak = 0;
    for (int p = 0; p < npx; ++p) {
      float v = cam[p] * 255.0f;
      if (v < 0.0f) v = 0.0f;
      if (v > 255.0f) v = 255.0f;
      q[p] = static_cast<uint8_t>(v);
      peak = std::max(peak, q[p]);
    }
    const float* g = gt + static_cast<size_t>(i) * max_gt * 4;
    int ng = gt_count[i];

    // Fused form of sweep_one + box-vs-GT scoring: the per-level
    // best-IoU is evaluated INLINE on the active union-find roots, so
    // no per-level box lists are ever materialized (the LevelBoxes
    // vectors and their flatten were ~a third of the per-image cost on
    // fragmented maps).  Semantics identical to the explicit path
    // (sweep_boxes_at keeps it for parity tests).
    double lvl_best[256];
    int lvl_nbox[256];
    for (int t = 0; t < 256; ++t) { lvl_best[t] = 0.0; lvl_nbox[t] = 0; }

    // bucket pixels by value
    std::vector<int32_t> count(257, 0);
    for (int p = 0; p < npx; ++p) count[q[p] + 1]++;
    for (int v = 0; v < 256; ++v) count[v + 1] += count[v];
    std::vector<int32_t> order(npx);
    {
      std::vector<int32_t> pos(count.begin(), count.end() - 1);
      for (int p = 0; p < npx; ++p) order[pos[q[p]]++] = p;
    }

    // ---- fg max-tree (8-connected), IoU scored per level on roots
    {
      DSU fg;
      fg.init(npx);
      std::vector<int32_t> roots;
      roots.reserve(1024);
      for (int v = 255; v >= 1; --v) {
        for (int k = count[v]; k < count[v + 1]; ++k) {
          int p = order[k];
          int y = p / w, x = p - y * w;
          fg.make(p, x, y, false);
          roots.push_back(p);
          const int y0 = std::max(y - 1, 0), y1 = std::min(y + 1, h - 1);
          const int x0 = std::max(x - 1, 0), x1 = std::min(x + 1, w - 1);
          for (int ny = y0; ny <= y1; ++ny)
            for (int nx = x0; nx <= x1; ++nx) {
              int np = ny * w + nx;
              if (np != p && fg.parent[np] != -1) fg.unite(p, np);
            }
        }
        int t = v - 1;
        int wr = 0;
        double bi = 0.0;
        for (int r : roots) {
          if (fg.parent[r] != r) continue;
          roots[wr++] = r;
          float box[4] = {
              static_cast<float>(fg.bx0[r]),
              static_cast<float>(fg.by0[r]),
              static_cast<float>(std::min(fg.bx1[r] + 1, w - 1)),
              static_cast<float>(std::min(fg.by1[r] + 1, h - 1))};
          for (int gi = 0; gi < ng; ++gi)
            bi = std::max(bi, iou_plus1(box, g + gi * 4));
        }
        roots.resize(wr);
        lvl_best[t] = bi;
        lvl_nbox[t] = wr;
      }
    }

    // ---- bg min-tree (4-connected): holes, scored per level
    {
      DSU bg;
      bg.init(npx);
      std::vector<int32_t> broots;
      broots.reserve(1024);
      for (int v = 0; v <= 255; ++v) {
        for (int k = count[v]; k < count[v + 1]; ++k) {
          int p = order[k];
          int y = p / w, x = p - y * w;
          bool on_border = (x == 0 || y == 0 || x == w - 1 || y == h - 1);
          bg.make(p, x, y, on_border);
          broots.push_back(p);
          if (x > 0 && bg.parent[p - 1] != -1) bg.unite(p, p - 1);
          if (x < w - 1 && bg.parent[p + 1] != -1) bg.unite(p, p + 1);
          if (y > 0 && bg.parent[p - w] != -1) bg.unite(p, p - w);
          if (y < h - 1 && bg.parent[p + w] != -1) bg.unite(p, p + w);
        }
        int t = v;
        int wr = 0;
        double bi = lvl_best[t];
        int nb = 0;
        for (int r : broots) {
          if (bg.parent[r] != r) continue;
          broots[wr++] = r;
          if (bg.border[r]) continue;       // touches border: not a hole
          float box[4] = {
              static_cast<float>(bg.bx0[r] - 1),
              static_cast<float>(bg.by0[r] - 1),
              static_cast<float>(std::min(bg.bx1[r] + 2, w - 1)),
              static_cast<float>(std::min(bg.by1[r] + 2, h - 1))};
          for (int gi = 0; gi < ng; ++gi)
            bi = std::max(bi, iou_plus1(box, g + gi * 4));
          nb++;
        }
        broots.resize(wr);
        lvl_best[t] = bi;
        lvl_nbox[t] += nb;
      }
    }

    // empty level -> the protocol's single [0, 0, 0, 0] box
    for (int t = 0; t < 256; ++t) {
      if (lvl_nbox[t] == 0) {
        float zbox[4] = {0.0f, 0.0f, 0.0f, 0.0f};
        double bi = 0.0;
        for (int gi = 0; gi < ng; ++gi)
          bi = std::max(bi, iou_plus1(zbox, g + gi * 4));
        lvl_best[t] = bi;
        lvl_nbox[t] = 1;
      }
    }

    for (int k = 0; k < n_tau; ++k) {
      int t = static_cast<int>(taus[k] * peak);   // int() truncation
      if (t > 255) t = 255;
      if (t < 0) t = 0;
      best[static_cast<size_t>(i) * n_tau + k] = lvl_best[t];
      nboxes[static_cast<size_t>(i) * n_tau + k] = lvl_nbox[t];
    }
  }
  return 0;
}

// Explicit box dump for one image (parity testing): returns the number
// of boxes at threshold level t (quantized), writing up to cap boxes.
int sweep_boxes_at(const float* cam, int h, int w, double tau,
                   float* out_boxes, int cap) {
  std::vector<uint8_t> q(static_cast<size_t>(h) * w);
  uint8_t peak = 0;
  for (size_t p = 0; p < q.size(); ++p) {
    float v = cam[p] * 255.0f;
    if (v < 0.0f) v = 0.0f;
    if (v > 255.0f) v = 255.0f;
    q[p] = static_cast<uint8_t>(v);
    peak = std::max(peak, q[p]);
  }
  LevelBoxes lb;
  sweep_one(q.data(), h, w, lb);
  int t = static_cast<int>(tau * peak);
  if (t > 255) t = 255;
  if (t < 0) t = 0;
  int b0 = lb.level_ptr[t], b1 = lb.level_ptr[t + 1];
  int nb = b1 - b0;
  int wr = std::min(nb, cap);
  std::memcpy(out_boxes, lb.flat.data() + static_cast<size_t>(b0) * 4,
              static_cast<size_t>(wr) * 4 * sizeof(float));
  return nb;
}

}  // extern "C"
