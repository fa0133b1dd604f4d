// tuatara-tpu native host post-processing library.
//
// Dependency-free C++17 implementation of the CRAFT detection
// post-processing semantics (the reference implements these with OpenCV:
// threshold + connectedComponentsWithStats + per-component dilate +
// minAreaRect, tuatara.cpp:119-204). Roles in this framework:
//
//  * independent oracle for the TPU postproc kernels (tests cross-check
//    cv2, this library, and the JAX implementation against each other);
//  * fast host-side fallback when no accelerator is attached;
//  * fulfils the reference's own TODO of dropping the OpenCV dependency
//    (README.md:40-41) — no third-party code here at all.
//
// Exposed as a C ABI for ctypes (tuatara_tpu/native.py). Not a translation
// of the reference: CC is single-pass union-find over the binary image, the
// dilation is done analytically in box space exactly like the TPU path, and
// min-area rectangles come from convex hull + rotating calipers.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct DSU {
  std::vector<int32_t> parent;
  explicit DSU(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a > b) std::swap(a, b);  // keep the smaller (raster-first) root
    parent[b] = a;
  }
};

struct P64 {
  double x, y;
};

double cross(const P64 &o, const P64 &a, const P64 &b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// Andrew monotone chain; returns hull in counter-clockwise order.
std::vector<P64> convex_hull(std::vector<P64> pts) {
  std::sort(pts.begin(), pts.end(), [](const P64 &a, const P64 &b) {
    return a.x < b.x || (a.x == b.x && a.y < b.y);
  });
  pts.erase(std::unique(pts.begin(), pts.end(),
                        [](const P64 &a, const P64 &b) {
                          return a.x == b.x && a.y == b.y;
                        }),
            pts.end());
  const size_t n = pts.size();
  if (n < 3) return pts;
  std::vector<P64> hull(2 * n);
  size_t k = 0;
  for (size_t i = 0; i < n; ++i) {
    while (k >= 2 && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
    hull[k++] = pts[i];
  }
  for (size_t i = n - 1, t = k + 1; i-- > 0;) {
    while (k >= t && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
    hull[k++] = pts[i];
  }
  hull.resize(k - 1);
  return hull;
}

// Rotating calipers min-area rectangle over a convex hull.
// Writes 4 corners (x, y) into out[8].
void min_area_rect(const std::vector<P64> &hull, double out[8]) {
  const size_t n = hull.size();
  if (n == 0) {
    std::fill(out, out + 8, 0.0);
    return;
  }
  if (n == 1) {
    for (int i = 0; i < 4; ++i) {
      out[2 * i] = hull[0].x;
      out[2 * i + 1] = hull[0].y;
    }
    return;
  }
  double best_area = 1e300;
  for (size_t i = 0; i < n; ++i) {
    const P64 &a = hull[i];
    const P64 &b = hull[(i + 1) % n];
    double ex = b.x - a.x, ey = b.y - a.y;
    double len = std::hypot(ex, ey);
    if (len == 0) continue;
    ex /= len;
    ey /= len;
    double minu = 1e300, maxu = -1e300, minv = 1e300, maxv = -1e300;
    for (const P64 &p : hull) {
      double u = (p.x - a.x) * ex + (p.y - a.y) * ey;
      double v = -(p.x - a.x) * ey + (p.y - a.y) * ex;
      minu = std::min(minu, u); maxu = std::max(maxu, u);
      minv = std::min(minv, v); maxv = std::max(maxv, v);
    }
    double area = (maxu - minu) * (maxv - minv);
    if (area < best_area) {
      best_area = area;
      const double us[4] = {minu, maxu, maxu, minu};
      const double vs[4] = {minv, minv, maxv, maxv};
      for (int c = 0; c < 4; ++c) {
        out[2 * c] = a.x + us[c] * ex - vs[c] * ey;
        out[2 * c + 1] = a.y + us[c] * ey + vs[c] * ex;
      }
    }
  }
}

}  // namespace

extern "C" {

// Heatmaps [h*w] row-major fp32. Writes up to max_boxes records of 12 floats
// — [x0, y0, x1, y1, c0x, c0y, c1x, c1y, c2x, c2y, c3x, c3y] in heatmap
// coordinates — and returns the number of boxes found (clamped to
// max_boxes; the true component count is written to *num_components if
// non-null). niter_mode: 0 = reference integer math, 1 = upstream float.
int tuatara_extract_boxes(const float *textmap, const float *linkmap,
                          int h, int w,
                          float text_threshold, float link_threshold,
                          float low_text, int min_area, int niter_mode,
                          float *out, int max_boxes, int *num_components) {
  const int n = h * w;
  // 1. min-max normalize both maps.
  float tmin = textmap[0], tmax = textmap[0], lmin = linkmap[0], lmax = linkmap[0];
  for (int i = 1; i < n; ++i) {
    tmin = std::min(tmin, textmap[i]); tmax = std::max(tmax, textmap[i]);
    lmin = std::min(lmin, linkmap[i]); lmax = std::max(lmax, linkmap[i]);
  }
  const float tden = std::max(tmax - tmin, 1e-12f);
  const float lden = std::max(lmax - lmin, 1e-12f);

  std::vector<uint8_t> tbin(n), lbin(n), comb(n);
  std::vector<float> tn(n);
  for (int i = 0; i < n; ++i) {
    tn[i] = (textmap[i] - tmin) / tden;
    const float ln = (linkmap[i] - lmin) / lden;
    tbin[i] = tn[i] > low_text;
    lbin[i] = ln > link_threshold;
    comb[i] = tbin[i] | lbin[i];
  }

  // 2. 4-connected union-find labeling.
  DSU dsu(n);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int i = y * w + x;
      if (!comb[i]) continue;
      if (x + 1 < w && comb[i + 1]) dsu.unite(i, i + 1);
      if (y + 1 < h && comb[i + w]) dsu.unite(i, i + w);
    }
  }

  // 3. Per-component stats keyed by root, in raster order of the root.
  struct Stat {
    int32_t area = 0;
    int l = 1 << 30, r = -1, t = 1 << 30, b = -1;       // full bbox
    int rl = 1 << 30, rr = -1, rt = 1 << 30, rb = -1;   // reduced bbox
    int rcount = 0;
    float peak = -1e30f;
  };
  std::vector<int32_t> root_of(n, -1);
  std::vector<int32_t> order;  // roots in raster-first order
  std::vector<Stat> stats;
  std::vector<int32_t> slot_of(n, -1);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int i = y * w + x;
      if (!comb[i]) continue;
      const int32_t rt_ = dsu.find(i);
      int32_t slot = slot_of[rt_];
      if (slot < 0) {
        slot = static_cast<int32_t>(stats.size());
        slot_of[rt_] = slot;
        order.push_back(rt_);
        stats.emplace_back();
      }
      Stat &s = stats[slot];
      s.area++;
      s.l = std::min(s.l, x); s.r = std::max(s.r, x);
      s.t = std::min(s.t, y); s.b = std::max(s.b, y);
      s.peak = std::max(s.peak, tn[i]);
      if (!(lbin[i] && !tbin[i])) {  // reduced set (minus link-only)
        s.rcount++;
        s.rl = std::min(s.rl, x); s.rr = std::max(s.rr, x);
        s.rt = std::min(s.rt, y); s.rb = std::max(s.rb, y);
      }
    }
  }

  if (num_components) *num_components = static_cast<int>(stats.size());

  // 4. Filter + analytic dilation + min-area rect per surviving component.
  int out_n = 0;
  for (size_t slot = 0; slot < stats.size() && out_n < max_boxes; ++slot) {
    const Stat &s = stats[slot];
    if (s.area < min_area || s.peak < text_threshold || s.rcount == 0) continue;
    const int bw = s.r - s.l + 1, bh = s.b - s.t + 1;
    int niter;
    if (niter_mode == 0) {
      niter = static_cast<int>(
          std::sqrt(static_cast<double>(s.area * std::min(bw, bh) / (bw * bh) * 2)));
    } else {
      niter = static_cast<int>(
          std::sqrt(static_cast<double>(s.area) * std::min(bw, bh) / (bw * bh)) * 2);
    }
    const int grow_lt = niter / 2;          // OpenCV anchor K/2, K = 1+niter
    const int grow_rb = (niter + 1) / 2;
    const float x0 = static_cast<float>(std::max(s.rl - grow_lt, 0));
    const float y0 = static_cast<float>(std::max(s.rt - grow_lt, 0));
    const float x1 = static_cast<float>(std::min(s.rr + grow_rb, w - 1));
    const float y1 = static_cast<float>(std::min(s.rb + grow_rb, h - 1));

    // Min-area rect of the dilated reduced set: collect reduced points of
    // this component, inflate via Minkowski sum with the dilation square
    // (append the four shifted copies of each hull point), then calipers.
    const int32_t root = order[slot];
    std::vector<P64> pts;
    pts.reserve(static_cast<size_t>(s.rcount) * 4);
    for (int y = s.rt; y <= s.rb; ++y) {
      for (int x = s.rl; x <= s.rr; ++x) {
        const int i = y * w + x;
        if (!comb[i] || dsu.find(i) != root) continue;
        if (lbin[i] && !tbin[i]) continue;
        const double px = x, py = y;
        pts.push_back({std::max(px - grow_lt, 0.0), std::max(py - grow_lt, 0.0)});
        pts.push_back({std::min(px + grow_rb, double(w - 1)), std::max(py - grow_lt, 0.0)});
        pts.push_back({std::min(px + grow_rb, double(w - 1)), std::min(py + grow_rb, double(h - 1))});
        pts.push_back({std::max(px - grow_lt, 0.0), std::min(py + grow_rb, double(h - 1))});
      }
    }
    double corners[8];
    min_area_rect(convex_hull(std::move(pts)), corners);

    float *rec = out + out_n * 12;
    rec[0] = x0; rec[1] = y0; rec[2] = x1; rec[3] = y1;
    for (int c = 0; c < 8; ++c) rec[4 + c] = static_cast<float>(corners[c]);
    ++out_n;
  }
  return out_n;
}

// Standalone 4-connected CC labeling (diagnostics/testing): writes raster-
// first dense component ids (or -1) into labels[h*w], returns #components.
int tuatara_label_components(const uint8_t *mask, int h, int w, int32_t *labels) {
  const int n = h * w;
  DSU dsu(n);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      const int i = y * w + x;
      if (!mask[i]) continue;
      if (x + 1 < w && mask[i + 1]) dsu.unite(i, i + 1);
      if (y + 1 < h && mask[i + w]) dsu.unite(i, i + w);
    }
  std::vector<int32_t> slot_of(n, -1);
  int next = 0;
  for (int i = 0; i < n; ++i) {
    if (!mask[i]) {
      labels[i] = -1;
      continue;
    }
    const int32_t r = dsu.find(i);
    if (slot_of[r] < 0) slot_of[r] = next++;
    labels[i] = slot_of[r];
  }
  return next;
}

}  // extern "C"
