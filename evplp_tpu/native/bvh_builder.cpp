// Native BVH builder (binned SAH) — the TPU framework's equivalent of the
// reference's native Trbvh acceleration builder (OptiX, rtcomphoton.h:705).
// Emits the same flattened skip-pointer DFS layout as the numpy fallback in
// evplp_tpu/accel/bvh.py; loaded via ctypes (evplp_tpu/native/bvh_native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libevplp_bvh.so bvh_builder.cpp

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kBins = 16;

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Aabb {
  Vec3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  Vec3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(const Aabb& o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void grow(const Vec3& p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Node {
  Aabb box;
  int first = -1;   // leaf: first triangle in perm order
  int count = 0;    // leaf: triangle count; 0 = internal
  int left = -1;    // internal children
  int right = -1;
};

struct Builder {
  std::vector<Aabb> tri_box;
  std::vector<Vec3> centroid;
  std::vector<int> perm;
  std::vector<Node> nodes;
  int leaf_size;

  int new_node(int lo, int hi) {
    Node n;
    for (int i = lo; i < hi; ++i) n.box.grow(tri_box[perm[i]]);
    n.first = lo;
    n.count = hi - lo;
    nodes.push_back(n);
    return static_cast<int>(nodes.size()) - 1;
  }

  void build(int root_lo, int root_hi) {
    struct Item {
      int node, lo, hi;
    };
    std::vector<Item> stack;
    stack.push_back({new_node(root_lo, root_hi), root_lo, root_hi});

    while (!stack.empty()) {
      Item it = stack.back();
      stack.pop_back();
      int n = it.hi - it.lo;
      if (n <= leaf_size) continue;

      // centroid bounds
      Aabb cb;
      for (int i = it.lo; i < it.hi; ++i) cb.grow(centroid[perm[i]]);
      float ext[3] = {cb.hi.x - cb.lo.x, cb.hi.y - cb.lo.y, cb.hi.z - cb.lo.z};

      float best_cost = FLT_MAX;
      int best_axis = -1;
      float best_thr = 0.f;

      for (int axis = 0; axis < 3; ++axis) {
        if (ext[axis] <= 1e-12f) continue;
        float cmin = axis == 0 ? cb.lo.x : (axis == 1 ? cb.lo.y : cb.lo.z);
        Aabb bbox[kBins];
        int bcount[kBins] = {0};
        for (int i = it.lo; i < it.hi; ++i) {
          const Vec3& c = centroid[perm[i]];
          float v = axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
          int b = std::min(int((v - cmin) / ext[axis] * kBins), kBins - 1);
          bbox[b].grow(tri_box[perm[i]]);
          ++bcount[b];
        }
        Aabb right_acc[kBins];
        Aabb acc;
        for (int b = kBins - 1; b >= 0; --b) {
          if (bcount[b]) acc.grow(bbox[b]);
          right_acc[b] = acc;
        }
        Aabb lacc;
        int lcount = 0;
        for (int b = 0; b < kBins - 1; ++b) {
          if (bcount[b]) lacc.grow(bbox[b]);
          lcount += bcount[b];
          int rcount = n - lcount;
          if (!lcount || !rcount) continue;
          float cost = lacc.area() * lcount + right_acc[b + 1].area() * rcount;
          if (cost < best_cost) {
            best_cost = cost;
            best_axis = axis;
            best_thr = cmin + ext[axis] * float(b + 1) / kBins;
          }
        }
      }

      int mid;
      if (best_axis < 0) {
        // coincident centroids: arbitrary index split (no fat leaves — the
        // packet layout requires count <= leaf_size)
        mid = it.lo + n / 2;
      } else {
        auto key = [&](int t) {
          const Vec3& c = centroid[t];
          return best_axis == 0 ? c.x : (best_axis == 1 ? c.y : c.z);
        };
        int* first = perm.data() + it.lo;
        int* last = perm.data() + it.hi;
        int* mid_ptr = std::partition(
            first, last, [&](int t) { return key(t) < best_thr; });
        mid = it.lo + int(mid_ptr - first);
        if (mid == it.lo || mid == it.hi) {  // degenerate: median split
          std::nth_element(first, first + n / 2, last,
                           [&](int a, int b) { return key(a) < key(b); });
          mid = it.lo + n / 2;
        }
      }

      int left = new_node(it.lo, mid);
      int right = new_node(mid, it.hi);
      nodes[it.node].left = left;
      nodes[it.node].right = right;
      nodes[it.node].first = -1;
      nodes[it.node].count = 0;
      stack.push_back({right, mid, it.hi});
      stack.push_back({left, it.lo, mid});
    }
  }
};

}  // namespace

extern "C" int evplp_build_bvh(
    const float* v0, const float* v1, const float* v2, int num_tris,
    int leaf_size, int max_nodes,
    float* out_node_min, float* out_node_max, int* out_skip,
    int* out_first, int* out_count, int* out_perm) {
  Builder b;
  b.leaf_size = leaf_size;
  b.tri_box.resize(num_tris);
  b.centroid.resize(num_tris);
  b.perm.resize(num_tris);
  for (int i = 0; i < num_tris; ++i) {
    Vec3 a{v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]};
    Vec3 c{v1[3 * i], v1[3 * i + 1], v1[3 * i + 2]};
    Vec3 d{v2[3 * i], v2[3 * i + 1], v2[3 * i + 2]};
    Aabb box;
    box.grow(a);
    box.grow(c);
    box.grow(d);
    b.tri_box[i] = box;
    b.centroid[i] = {(box.lo.x + box.hi.x) * 0.5f,
                     (box.lo.y + box.hi.y) * 0.5f,
                     (box.lo.z + box.hi.z) * 0.5f};
    b.perm[i] = i;
  }
  b.nodes.reserve(2 * size_t(num_tris));
  b.build(0, num_tris);

  const int total = static_cast<int>(b.nodes.size());
  if (total > max_nodes) return -total;  // caller re-allocates

  // DFS flatten + skip pointers
  std::vector<int> order;
  order.reserve(total);
  std::vector<int> subtree(total, 0);
  {
    // iterative postorder for subtree sizes
    std::vector<std::pair<int, bool>> st;
    st.push_back({0, false});
    while (!st.empty()) {
      auto [nd, done] = st.back();
      st.pop_back();
      const Node& n = b.nodes[nd];
      if (n.count > 0) {
        subtree[nd] = 1;
      } else if (done) {
        subtree[nd] = 1 + subtree[n.left] + subtree[n.right];
      } else {
        st.push_back({nd, true});
        st.push_back({n.left, false});
        st.push_back({n.right, false});
      }
    }
  }
  {
    std::vector<int> st;
    st.push_back(0);
    while (!st.empty()) {
      int nd = st.back();
      st.pop_back();
      order.push_back(nd);
      const Node& n = b.nodes[nd];
      if (n.count == 0) {
        st.push_back(n.right);
        st.push_back(n.left);
      }
    }
  }
  for (int pos = 0; pos < total; ++pos) {
    const Node& n = b.nodes[order[pos]];
    out_node_min[3 * pos] = n.box.lo.x;
    out_node_min[3 * pos + 1] = n.box.lo.y;
    out_node_min[3 * pos + 2] = n.box.lo.z;
    out_node_max[3 * pos] = n.box.hi.x;
    out_node_max[3 * pos + 1] = n.box.hi.y;
    out_node_max[3 * pos + 2] = n.box.hi.z;
    out_skip[pos] = pos + subtree[order[pos]];
    out_first[pos] = n.count > 0 ? n.first : -1;
    out_count[pos] = n.count;
  }
  std::memcpy(out_perm, b.perm.data(), sizeof(int) * num_tris);
  return total;
}
