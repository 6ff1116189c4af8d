// rtk_oracle: clean-room CPU reference tracer with corrected-rtk semantics.
//
// Purpose (SURVEY.md §4): an independent third implementation — besides the
// JAX production path and the f64 Möller–Trumbore oracle — used for
// bit-comparison testing and CPU baseline numbers.  It implements the
// *intended* semantics of the reference (rtk.c) with its defects fixed
// (SURVEY.md §2.9): real any-hit, portable code, correct axis selection.
//
// Deliberately different structure from the reference: C++17, scalar math
// (no SIMD), a binned-SAH BVH2 with std::vector storage and an explicit
// stack traversal.  Matching behaviours (watertight shear-space test with
// f64 fallback, open t-window, strict nearest-hit compare, first-hit ties)
// are the *spec*, not the code.
//
// C ABI:
//   rtko_build(tris[n*9], n) -> handle
//   rtko_trace(handle, rays[n*8], n, mode, out_t[n], out_u, out_v, out_idx)
//   rtko_free(handle)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

struct Vec3 {
  float x = 0, y = 0, z = 0;
};

static inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
static inline float axis(const Vec3& v, int k) {
  return k == 0 ? v.x : (k == 1 ? v.y : v.z);
}

struct Box {
  Vec3 lo{kInf, kInf, kInf};
  Vec3 hi{-kInf, -kInf, -kInf};
  void grow(const Vec3& p) { lo = vmin(lo, p); hi = vmax(hi, p); }
  void grow(const Box& b) { lo = vmin(lo, b.lo); hi = vmax(hi, b.hi); }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }
};

struct Node {
  Box box;
  int32_t left = -1;    // child node index; -1 => leaf
  int32_t right = -1;
  int32_t first = 0;    // leaf: first item in order[]
  int32_t count = 0;    // leaf: item count
};

struct Scene {
  std::vector<float> tris;     // n*9
  std::vector<int32_t> order;  // build item order
  std::vector<Node> nodes;
  int32_t root = 0;
};

struct BuildItem {
  Box box;
  Vec3 centroid;
  int32_t index;
};

constexpr int kLeafMax = 4;
static int g_leaf_max = kLeafMax;  // rtko_build2 override
constexpr int kBins = 16;

// Step-quantized SAH (rtko_build3): the TPU packet kernel tests leaves
// in fixed K-row tiles (trace/packed.py pads every leaf to leaf_size
// rows), so a visited leaf costs ceil(count/K) STEPS regardless of how
// full it is.  Weighting the greedy SAH by leaf steps instead of
// triangle count drives children toward full-K leaves: fewer leaves,
// fewer leaf pops, shallower trees.  0 = classic count-weighted cost.
static int g_step_quant = 0;
constexpr int kExactSweep = 256;  // full object sweep below this count

static inline float wq(int n) {
  return g_step_quant > 0
             ? (float)((n + g_step_quant - 1) / g_step_quant)
             : (float)n;
}

static int32_t build_node(Scene& s, std::vector<BuildItem>& items,
                          int32_t first, int32_t count, int depth) {
  Node node;
  Box cb;  // centroid bounds
  for (int32_t i = first; i < first + count; ++i) {
    node.box.grow(items[i].box);
    cb.grow(items[i].centroid);
  }
  const int32_t me = (int32_t)s.nodes.size();
  s.nodes.push_back(node);

  bool make_leaf = count <= g_leaf_max || depth >= 64;
  int32_t mid = first;
  if (!make_leaf && g_step_quant > 0 && count <= kExactSweep) {
    // Exact object-split sweep (all 3 axes, every split index) with
    // step-quantized weights: near the leaves the split INDEX is what
    // aligns children to full-K multiples, and bin boundaries are too
    // coarse to find it.
    float best = kInf;
    int best_ax = 0;
    int32_t best_i = count / 2;
    std::vector<float> rarea((size_t)count);
    for (int ax3 = 0; ax3 < 3; ++ax3) {
      std::sort(items.begin() + first, items.begin() + first + count,
                [ax3](const BuildItem& a, const BuildItem& b) {
                  return axis(a.centroid, ax3) < axis(b.centroid, ax3);
                });
      Box acc;
      for (int32_t i = count - 1; i >= 1; --i) {
        acc.grow(items[first + i].box);
        rarea[i] = acc.area();
      }
      acc = Box();
      for (int32_t i = 1; i < count; ++i) {
        acc.grow(items[first + i - 1].box);
        float c = acc.area() * wq(i) + rarea[i] * wq(count - i);
        if (c < best) { best = c; best_ax = ax3; best_i = i; }
      }
    }
    if (best_ax != 2) {  // items are left sorted on axis 2 from the loop
      std::sort(items.begin() + first, items.begin() + first + count,
                [best_ax](const BuildItem& a, const BuildItem& b) {
                  return axis(a.centroid, best_ax)
                         < axis(b.centroid, best_ax);
                });
    }
    mid = first + best_i;
    int32_t l = build_node(s, items, first, mid - first, depth + 1);
    int32_t r = build_node(s, items, mid, first + count - mid, depth + 1);
    s.nodes[me].left = l;
    s.nodes[me].right = r;
    return me;
  }
  if (!make_leaf) {
    // Binned SAH over the widest centroid axis.
    Vec3 ext{cb.hi.x - cb.lo.x, cb.hi.y - cb.lo.y, cb.hi.z - cb.lo.z};
    int ax = ext.x >= ext.y ? (ext.x >= ext.z ? 0 : 2)
                            : (ext.y >= ext.z ? 1 : 2);
    float lo = axis(cb.lo, ax), hi = axis(cb.hi, ax);
    if (hi - lo < 1e-12f) {
      mid = first + count / 2;  // degenerate: median split
      std::nth_element(items.begin() + first, items.begin() + mid,
                       items.begin() + first + count,
                       [ax](const BuildItem& a, const BuildItem& b) {
                         return axis(a.centroid, ax) < axis(b.centroid, ax);
                       });
    } else {
      Box bin_box[kBins];
      int bin_n[kBins] = {0};
      float scale = kBins / (hi - lo);
      auto bin_of = [&](const BuildItem& it) {
        int b = (int)((axis(it.centroid, ax) - lo) * scale);
        return std::min(b, kBins - 1);
      };
      for (int32_t i = first; i < first + count; ++i) {
        int b = bin_of(items[i]);
        bin_box[b].grow(items[i].box);
        bin_n[b]++;
      }
      float right_area[kBins] = {0};
      Box acc;
      int acc_n = 0;
      for (int b = kBins - 1; b >= 1; --b) {
        acc.grow(bin_box[b]);
        acc_n += bin_n[b];
        right_area[b] = acc_n ? acc.area() * wq(acc_n) : 0.f;
      }
      float best = kInf;
      int best_bin = -1;
      acc = Box();
      acc_n = 0;
      for (int b = 0; b < kBins - 1; ++b) {
        acc.grow(bin_box[b]);
        acc_n += bin_n[b];
        if (acc_n == 0 || acc_n == count) continue;
        float cost = acc.area() * wq(acc_n) + right_area[b + 1];
        if (cost < best) { best = cost; best_bin = b; }
      }
      float leaf_cost = node.box.area() * count;
      if (best_bin < 0 || (count <= g_leaf_max && best >= leaf_cost)) {
        mid = first + count / 2;
        std::nth_element(items.begin() + first, items.begin() + mid,
                         items.begin() + first + count,
                         [ax](const BuildItem& a, const BuildItem& b) {
                           return axis(a.centroid, ax) < axis(b.centroid, ax);
                         });
      } else {
        auto it = std::partition(
            items.begin() + first, items.begin() + first + count,
            [&](const BuildItem& x) { return bin_of(x) <= best_bin; });
        mid = (int32_t)(it - items.begin());
        if (mid == first || mid == first + count) mid = first + count / 2;
      }
    }
    int32_t l = build_node(s, items, first, mid - first, depth + 1);
    int32_t r = build_node(s, items, mid, first + count - mid, depth + 1);
    s.nodes[me].left = l;
    s.nodes[me].right = r;
  } else {
    s.nodes[me].first = first;
    s.nodes[me].count = count;
  }
  return me;
}

// Watertight shear-space triangle intersection, corrected-rtk semantics:
// edge functions in f32, exact-zero lanes redone in f64; all-same-sign
// accept (zero allowed); open t-window with strict compares.
struct Ray {
  Vec3 o, d;
  float mint, maxt;
  int kx, ky, kz;
  float sx, sy, sz;
};

static inline void ray_setup(Ray& r) {
  float ax = std::fabs(r.d.x), ay = std::fabs(r.d.y), az = std::fabs(r.d.z);
  float m = std::max(ax, std::max(ay, az));
  int kz = (ax == m) ? 0 : (ay == m ? 1 : 2);  // x, then y, then z priority
  r.kz = kz;
  r.kx = (kz + 1) % 3;
  r.ky = (kz + 2) % 3;
  float dz = axis(r.d, r.kz);
  r.sx = -axis(r.d, r.kx) / dz;
  r.sy = -axis(r.d, r.ky) / dz;
  r.sz = 1.0f / dz;
}

static inline bool tri_hit(const Ray& r, const float* v9, float cur_t,
                           float* t_out, float* u_out, float* v_out) {
  float X[3], Y[3], Z[3];
  for (int j = 0; j < 3; ++j) {
    Vec3 p{v9[3 * j] - r.o.x, v9[3 * j + 1] - r.o.y, v9[3 * j + 2] - r.o.z};
    float px = axis(p, r.kx), py = axis(p, r.ky), pz = axis(p, r.kz);
    X[j] = px + r.sx * pz;
    Y[j] = py + r.sy * pz;
    Z[j] = r.sz * pz;
  }
  float u = X[1] * Y[2] - Y[1] * X[2];
  float v = X[2] * Y[0] - Y[2] * X[0];
  float w = X[0] * Y[1] - Y[0] * X[1];
  if (u == 0.f || v == 0.f || w == 0.f) {
    u = (float)((double)X[1] * Y[2] - (double)Y[1] * X[2]);
    v = (float)((double)X[2] * Y[0] - (double)Y[2] * X[0]);
    w = (float)((double)X[0] * Y[1] - (double)Y[0] * X[1]);
  }
  float mn = std::min(u, std::min(v, w));
  float mx = std::max(u, std::max(v, w));
  if (mn < 0.f && mx > 0.f) return false;
  float det = u + v + w;
  float rcp = 1.0f / det;
  float t = (u * Z[0] + v * Z[1] + w * Z[2]) * rcp;
  if (!(t > r.mint && t < cur_t)) return false;
  *t_out = t;
  *u_out = u * rcp;
  *v_out = v * rcp;
  return true;
}

static inline bool box_hit(const Ray& r, const Box& b, float cur_t) {
  auto slab = [&](float lo, float hi, float o, float d, float& n, float& f) {
    float r0 = 1.0f / d;
    float t0 = (lo - o) * r0, t1 = (hi - o) * r0;
    if (t0 > t1) std::swap(t0, t1);
    // NaN (0*inf) behaves as "unconstrained", matching the reference's
    // NaN-dropping SSE max/min folds (rtk.c:458-465).
    if (t0 == t0) n = std::max(n, t0);
    if (t1 == t1) f = std::min(f, t1);
  };
  float n = r.mint, f = cur_t;
  slab(b.lo.x, b.hi.x, r.o.x, r.d.x, n, f);
  slab(b.lo.y, b.hi.y, r.o.y, r.d.y, n, f);
  slab(b.lo.z, b.hi.z, r.o.z, r.d.z, n, f);
  return n <= f;
}

}  // namespace

extern "C" {

void* rtko_build(const float* tris, int64_t n) {
  auto* s = new Scene();
  s->tris.assign(tris, tris + n * 9);
  std::vector<BuildItem> items((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    BuildItem& it = items[(size_t)i];
    it.index = (int32_t)i;
    for (int j = 0; j < 3; ++j) {
      Vec3 p{tris[i * 9 + 3 * j], tris[i * 9 + 3 * j + 1],
             tris[i * 9 + 3 * j + 2]};
      it.box.grow(p);
    }
    it.centroid = {(it.box.lo.x + it.box.hi.x) * 0.5f,
                   (it.box.lo.y + it.box.hi.y) * 0.5f,
                   (it.box.lo.z + it.box.hi.z) * 0.5f};
  }
  s->nodes.reserve((size_t)(2 * n));
  s->root = build_node(*s, items, 0, (int32_t)n, 0);
  s->order.resize((size_t)n);
  for (int64_t i = 0; i < n; ++i) s->order[(size_t)i] = items[(size_t)i].index;
  return s;
}

// mode: 0 = closest hit, 1 = any hit (first accepted).
void rtko_trace(const void* scene, const float* rays, int64_t n, int mode,
                float* out_t, float* out_u, float* out_v, int32_t* out_idx) {
  const Scene& s = *(const Scene*)scene;
  for (int64_t i = 0; i < n; ++i) {
    Ray r;
    r.o = {rays[i * 8 + 0], rays[i * 8 + 1], rays[i * 8 + 2]};
    r.d = {rays[i * 8 + 3], rays[i * 8 + 4], rays[i * 8 + 5]};
    r.mint = rays[i * 8 + 6];
    r.maxt = rays[i * 8 + 7];
    ray_setup(r);
    float best_t = r.maxt, best_u = 0, best_v = 0;
    int32_t best = -1;
    int32_t stack[128];
    int sp = 0;
    stack[sp++] = s.root;
    while (sp) {
      const Node& nd = s.nodes[(size_t)stack[--sp]];
      if (!box_hit(r, nd.box, best_t)) continue;
      if (nd.left < 0) {
        for (int32_t k = nd.first; k < nd.first + nd.count; ++k) {
          int32_t tri = s.order[(size_t)k];
          float t, u, v;
          if (tri_hit(r, &s.tris[(size_t)tri * 9], best_t, &t, &u, &v)) {
            best_t = t;
            best_u = u;
            best_v = v;
            best = tri;
            if (mode == 1) { sp = 0; break; }
          }
        }
      } else {
        if (sp + 2 <= 128) {
          stack[sp++] = nd.right;
          stack[sp++] = nd.left;
        }
      }
    }
    out_t[i] = best_t;
    out_u[i] = best_u;
    out_v[i] = best_v;
    out_idx[i] = best;
  }
}

void rtko_free(void* scene) { delete (Scene*)scene; }

// Tree export: lets the TPU packer run a host-SAH topology through the
// same packet kernel (topology-quality experiments and the SAH build
// option).  Arrays sized rtko_node_count / n triangles.
int64_t rtko_node_count(const void* scene) {
  return (int64_t)((const Scene*)scene)->nodes.size();
}

void rtko_export(const void* scene, int32_t* left, int32_t* right,
                 int32_t* first, int32_t* count, float* box_lo,
                 float* box_hi, int32_t* order, int32_t* root) {
  const Scene& s = *(const Scene*)scene;
  for (size_t i = 0; i < s.nodes.size(); ++i) {
    const Node& nd = s.nodes[i];
    left[i] = nd.left;
    right[i] = nd.right;
    first[i] = nd.first;
    count[i] = nd.count;
    box_lo[i * 3 + 0] = nd.box.lo.x;
    box_lo[i * 3 + 1] = nd.box.lo.y;
    box_lo[i * 3 + 2] = nd.box.lo.z;
    box_hi[i * 3 + 0] = nd.box.hi.x;
    box_hi[i * 3 + 1] = nd.box.hi.y;
    box_hi[i * 3 + 2] = nd.box.hi.z;
  }
  for (size_t i = 0; i < s.order.size(); ++i) order[i] = s.order[i];
  *root = s.root;
}

// Build with an explicit leaf-size cap (rtko_build keeps the historical
// kLeafMax=4 behaviour).
void* rtko_build2(const float* tris, int64_t n, int leaf_max) {
  g_leaf_max = leaf_max < 1 ? 1 : leaf_max;
  void* s = rtko_build(tris, n);
  g_leaf_max = kLeafMax;
  return s;
}

// Step-quantized SAH build: greedy cost counts ceil(count/quant) leaf
// steps per side (the packet kernel's real unit — every leaf pop tests
// exactly leaf_size padded rows), with an exact aligned object-split
// sweep below kExactSweep items.  quant <= 0 behaves like rtko_build2.
void* rtko_build3(const float* tris, int64_t n, int leaf_max, int quant) {
  g_leaf_max = leaf_max < 1 ? 1 : leaf_max;
  g_step_quant = quant > 0 ? quant : 0;
  void* s = rtko_build(tris, n);
  g_leaf_max = kLeafMax;
  g_step_quant = 0;
  return s;
}

}  // extern "C"
