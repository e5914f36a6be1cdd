// Native BVH builder: binned-SAH top-down build + bottom-up refit.
//
// The TPU framework's replacement for the reference's Rust `rtbvh` crate
// (pulled via FFI in /root/reference/RFW/system/bvh/CMakeLists.txt:12-47 and
// wrapped by bvh_tree.cpp:74-101): same role — fast host-side construction
// feeding device traversal — with a plain C ABI consumed through ctypes
// (rfw_tpu/native/__init__.py). Output layout matches the numpy builder in
// rfw_tpu/bvh/builder.py exactly (cross-checked in tests/test_native.py).
//
// Build: make -C rfw_tpu/native   (or python -m rfw_tpu.native.build)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kNumBins = 16;

struct V3 {
  float x, y, z;
  V3() : x(0), y(0), z(0) {}
  V3(float a, float b, float c) : x(a), y(b), z(c) {}
  float operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
  void set(int i, float v) { (i == 0 ? x : (i == 1 ? y : z)) = v; }
};

inline V3 vmin(const V3 &a, const V3 &b) {
  return V3(std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z));
}
inline V3 vmax(const V3 &a, const V3 &b) {
  return V3(std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z));
}

struct AABB {
  V3 lo{1e30f, 1e30f, 1e30f};
  V3 hi{-1e30f, -1e30f, -1e30f};
  void grow(const V3 &a, const V3 &b) {
    lo = vmin(lo, a);
    hi = vmax(hi, b);
  }
  void grow(const AABB &o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct BuildContext {
  const float *tri_min;
  const float *tri_max;
  std::vector<V3> centroid;
  float *out_bmin;
  float *out_bmax;
  int *out_child;
  int *out_count;
  int *out_depth;
  int *out_order;
  int n_nodes = 0;
  int n_placed = 0;
  int capacity = 0;
  int leaf_size = 4;
};

struct WorkItem {
  int node;
  int begin, end;  // range into the index array
  int depth;
};

void build(BuildContext &ctx, std::vector<int> &index) {
  std::vector<WorkItem> stack;
  stack.reserve(64);
  ctx.n_nodes = 1;
  stack.push_back({0, 0, (int)index.size(), 0});

  std::vector<int> tmp;
  tmp.reserve(index.size());

  while (!stack.empty()) {
    WorkItem w = stack.back();
    stack.pop_back();
    const int count = w.end - w.begin;

    AABB bounds, cbounds;
    for (int i = w.begin; i < w.end; ++i) {
      const int t = index[i];
      bounds.grow(V3(ctx.tri_min[3 * t], ctx.tri_min[3 * t + 1],
                     ctx.tri_min[3 * t + 2]),
                  V3(ctx.tri_max[3 * t], ctx.tri_max[3 * t + 1],
                     ctx.tri_max[3 * t + 2]));
      cbounds.grow(ctx.centroid[t], ctx.centroid[t]);
    }
    ctx.out_bmin[3 * w.node] = bounds.lo.x;
    ctx.out_bmin[3 * w.node + 1] = bounds.lo.y;
    ctx.out_bmin[3 * w.node + 2] = bounds.lo.z;
    ctx.out_bmax[3 * w.node] = bounds.hi.x;
    ctx.out_bmax[3 * w.node + 1] = bounds.hi.y;
    ctx.out_bmax[3 * w.node + 2] = bounds.hi.z;
    ctx.out_depth[w.node] = w.depth;

    bool make_leaf = count <= ctx.leaf_size;
    int best_axis = -1, best_bin = -1;

    if (!make_leaf) {
      // binned SAH over the largest centroid axis (mirrors the numpy
      // builder's _sah_split; see bvh/builder.py)
      float ext[3] = {cbounds.hi.x - cbounds.lo.x,
                      cbounds.hi.y - cbounds.lo.y,
                      cbounds.hi.z - cbounds.lo.z};
      int axis = 0;
      if (ext[1] > ext[0]) axis = 1;
      if (ext[2] > ext[axis]) axis = 2;
      if (ext[axis] < 1e-12f) {
        // degenerate: median split to bound leaf size
        if (count > 2 * ctx.leaf_size) {
          best_axis = 3;  // sentinel: median split
        } else {
          make_leaf = true;
        }
      } else {
        AABB bin_bounds[kNumBins];
        int bin_count[kNumBins] = {0};
        const float scale = kNumBins / ext[axis];
        const float base = cbounds.lo[axis];
        for (int i = w.begin; i < w.end; ++i) {
          const int t = index[i];
          int b = (int)((ctx.centroid[t][axis] - base) * scale);
          b = std::min(std::max(b, 0), kNumBins - 1);
          bin_count[b]++;
          bin_bounds[b].grow(
              V3(ctx.tri_min[3 * t], ctx.tri_min[3 * t + 1],
                 ctx.tri_min[3 * t + 2]),
              V3(ctx.tri_max[3 * t], ctx.tri_max[3 * t + 1],
                 ctx.tri_max[3 * t + 2]));
        }
        float left_area[kNumBins], right_area[kNumBins];
        int left_cnt[kNumBins], right_cnt[kNumBins];
        AABB acc;
        int c = 0;
        for (int b = 0; b < kNumBins; ++b) {
          acc.grow(bin_bounds[b]);
          c += bin_count[b];
          left_area[b] = acc.area();
          left_cnt[b] = c;
        }
        acc = AABB();
        c = 0;
        for (int b = kNumBins - 1; b >= 0; --b) {
          acc.grow(bin_bounds[b]);
          c += bin_count[b];
          right_area[b] = acc.area();
          right_cnt[b] = c;
        }
        float best_cost = 1e30f;
        for (int b = 0; b < kNumBins - 1; ++b) {
          if (left_cnt[b] == 0 || right_cnt[b + 1] == 0) continue;
          const float cost =
              left_area[b] * left_cnt[b] + right_area[b + 1] * right_cnt[b + 1];
          if (cost < best_cost) {
            best_cost = cost;
            best_axis = axis;
            best_bin = b;
          }
        }
        if (best_axis < 0) {
          if (count > 2 * ctx.leaf_size) best_axis = 3;  // median fallback
          else make_leaf = true;
        }
      }
    }

    if (make_leaf) {
      ctx.out_child[w.node] = ctx.n_placed;
      ctx.out_count[w.node] = count;
      for (int i = w.begin; i < w.end; ++i)
        ctx.out_order[ctx.n_placed++] = index[i];
      continue;
    }

    // partition [begin, end) — stable to match the numpy builder's masking
    int mid;
    if (best_axis == 3) {
      mid = w.begin + count / 2;
    } else {
      AABB cb;
      for (int i = w.begin; i < w.end; ++i)
        cb.grow(ctx.centroid[index[i]], ctx.centroid[index[i]]);
      const float scale = kNumBins / (cb.hi[best_axis] - cb.lo[best_axis]);
      const float base = cb.lo[best_axis];
      tmp.clear();
      int out = w.begin;
      for (int i = w.begin; i < w.end; ++i) {
        const int t = index[i];
        int b = (int)((ctx.centroid[t][best_axis] - base) * scale);
        b = std::min(std::max(b, 0), kNumBins - 1);
        if (b <= best_bin) index[out++] = t;
        else tmp.push_back(t);
      }
      mid = out;
      std::memcpy(&index[mid], tmp.data(), tmp.size() * sizeof(int));
    }

    const int left = ctx.n_nodes;
    ctx.n_nodes += 2;
    ctx.out_child[w.node] = left;
    ctx.out_count[w.node] = 0;
    stack.push_back({left + 1, mid, w.end, w.depth + 1});
    stack.push_back({left, w.begin, mid, w.depth + 1});
  }
}

}  // namespace

extern "C" {

// Returns node count, or -1 on error. Output arrays must hold 2*T nodes
// (bmin/bmax: 3 floats per node) and T ints for prim_order.
int rfw_build_bvh(const float *tri_min, const float *tri_max, int n_tris,
                  int leaf_size, float *out_bmin, float *out_bmax,
                  int *out_child, int *out_count, int *out_depth,
                  int *out_order) {
  if (n_tris <= 0) return -1;
  BuildContext ctx;
  ctx.tri_min = tri_min;
  ctx.tri_max = tri_max;
  ctx.out_bmin = out_bmin;
  ctx.out_bmax = out_bmax;
  ctx.out_child = out_child;
  ctx.out_count = out_count;
  ctx.out_depth = out_depth;
  ctx.out_order = out_order;
  ctx.leaf_size = leaf_size > 0 ? leaf_size : 4;
  ctx.centroid.resize(n_tris);
  for (int t = 0; t < n_tris; ++t)
    ctx.centroid[t] =
        V3(0.5f * (tri_min[3 * t] + tri_max[3 * t]),
           0.5f * (tri_min[3 * t + 1] + tri_max[3 * t + 1]),
           0.5f * (tri_min[3 * t + 2] + tri_max[3 * t + 2]));
  std::vector<int> index(n_tris);
  for (int t = 0; t < n_tris; ++t) index[t] = t;
  build(ctx, index);
  return ctx.n_nodes;
}

// Bottom-up refit (the reference's refit path, bvh_tree.cpp:104-114 /
// rtbvh refit): recompute node bounds from updated triangle bounds without
// changing topology. Children always have higher indices than parents in
// this builder's layout, so a reverse sweep is bottom-up.
void rfw_refit_bvh(float *bmin, float *bmax, const int *child,
                   const int *count, int n_nodes, const float *tri_min,
                   const float *tri_max, const int *prim_order) {
  for (int i = n_nodes - 1; i >= 0; --i) {
    if (count[i] > 0) {
      AABB b;
      for (int j = child[i]; j < child[i] + count[i]; ++j) {
        const int t = prim_order[j];
        b.grow(V3(tri_min[3 * t], tri_min[3 * t + 1], tri_min[3 * t + 2]),
               V3(tri_max[3 * t], tri_max[3 * t + 1], tri_max[3 * t + 2]));
      }
      bmin[3 * i] = b.lo.x; bmin[3 * i + 1] = b.lo.y; bmin[3 * i + 2] = b.lo.z;
      bmax[3 * i] = b.hi.x; bmax[3 * i + 1] = b.hi.y; bmax[3 * i + 2] = b.hi.z;
    } else {
      const int l = child[i];
      for (int k = 0; k < 3; ++k) {
        bmin[3 * i + k] = std::min(bmin[3 * l + k], bmin[3 * (l + 1) + k]);
        bmax[3 * i + k] = std::max(bmax[3 * l + k], bmax[3 * (l + 1) + k]);
      }
    }
  }
}

}  // extern "C"
