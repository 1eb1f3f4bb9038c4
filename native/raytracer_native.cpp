// Native host runtime for the TPU ray tracing framework.
//
// The reference implements its whole runtime in C++ (bvh.h, ppm.cpp); in
// the TPU framework everything on the hot device path is JAX/Pallas, and
// C++ covers the host-side runtime pieces where Python interpretation is
// the bottleneck:
//
//   rt_build_bvh  - flat preorder BVH build (same algorithm as the
//                   reference: widest-axis spatial-midpoint split with
//                   bisection retries, /root/reference/bvh.h:48-163), used
//                   both for the skip-threaded device BVH and as the
//                   spatial ordering for the cluster engine.
//   rt_write_ppm  - byte-exact ASCII P3 writer (/root/reference/ppm.cpp).
//
// Exposed with a plain C ABI and loaded from Python via ctypes (no
// pybind11 in this image).  Python keeps pure-numpy fallbacks: results are
// bit-identical (all arithmetic is float32 in both).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Builder {
  const float* prim_min;   // (P, 3)
  const float* prim_max;   // (P, 3)
  const float* centers;    // (P, 3)
  const int32_t* prim_ids; // (P,)
  int max_depth;
  int split_retries;
  int cap;

  float* node_min;   // (cap, 3)
  float* node_max;
  int32_t* skip;
  int32_t* leaf_start;
  int32_t* leaf_count;
  int32_t* axis_out;
  int32_t* prim_out;  // (P,)

  int n_nodes = 0;
  int prim_cursor = 0;
  bool overflow = false;

  // Emit the subtree over prims `idx` in preorder; returns subtree size.
  int emit(std::vector<int>& idx, int depth) {
    if (n_nodes >= cap) { overflow = true; return 0; }
    const int my = n_nodes++;

    float bmin[3] = {HUGE_VALF, HUGE_VALF, HUGE_VALF};
    float bmax[3] = {-HUGE_VALF, -HUGE_VALF, -HUGE_VALF};
    for (int p : idx) {
      for (int k = 0; k < 3; ++k) {
        bmin[k] = std::min(bmin[k], prim_min[3 * p + k]);
        bmax[k] = std::max(bmax[k], prim_max[3 * p + k]);
      }
    }
    std::memcpy(node_min + 3 * my, bmin, sizeof bmin);
    std::memcpy(node_max + 3 * my, bmax, sizeof bmax);
    axis_out[my] = 0;
    leaf_start[my] = 0;
    leaf_count[my] = 0;

    auto make_leaf = [&]() {
      leaf_start[my] = prim_cursor;
      leaf_count[my] = static_cast<int32_t>(idx.size());
      for (int p : idx) prim_out[prim_cursor++] = prim_ids[p];
      skip[my] = my + 1;
      return 1;
    };

    if (idx.size() <= 1 || depth >= max_depth) return make_leaf();

    // widest axis, first max wins (parser.h:227-235)
    int ax = 0;
    float best = bmax[0] - bmin[0];
    for (int k = 1; k < 3; ++k) {
      float e = bmax[k] - bmin[k];
      if (e > best) { best = e; ax = k; }
    }
    axis_out[my] = ax;

    // spatial-midpoint split with bisection retries toward the non-empty
    // side (bvh.h:111-163; at most `split_retries` candidate midpoints)
    float lo = bmin[ax], hi = bmax[ax];
    float mid = (lo + hi) / 2.0f;
    auto count_left = [&]() {
      int n = 0;
      for (int p : idx) n += centers[3 * p + ax] < mid;
      return n;
    };
    int nl = count_left();
    int tries = split_retries - 1;
    while (tries > 0 && (nl == 0 || nl == static_cast<int>(idx.size()))) {
      --tries;
      if (nl == 0) lo = mid; else hi = mid;
      mid = (lo + hi) / 2.0f;
      nl = count_left();
    }
    if (nl == 0 || nl == static_cast<int>(idx.size())) return make_leaf();

    std::vector<int> left, right;
    left.reserve(nl);
    right.reserve(idx.size() - nl);
    for (int p : idx) (centers[3 * p + ax] < mid ? left : right).push_back(p);
    { std::vector<int>().swap(idx); }  // free before recursing

    const int sl = emit(left, depth + 1);
    { std::vector<int>().swap(left); }
    const int sr = emit(right, depth + 1);
    const int size = 1 + sl + sr;
    skip[my] = my + size;
    return size;
  }
};

}  // namespace

extern "C" {

// Returns the node count, or -1 on capacity overflow.
int rt_build_bvh(int n_prims,
                 const float* prim_min, const float* prim_max,
                 const float* centers, const int32_t* prim_ids,
                 int max_depth, int split_retries,
                 float* node_min, float* node_max,
                 int32_t* skip, int32_t* leaf_start, int32_t* leaf_count,
                 int32_t* axis, int32_t* prim_out, int cap) {
  Builder b{prim_min, prim_max, centers, prim_ids,
            max_depth, split_retries, cap,
            node_min, node_max, skip, leaf_start, leaf_count, axis, prim_out};
  std::vector<int> all(n_prims);
  for (int i = 0; i < n_prims; ++i) all[i] = i;
  b.emit(all, 0);
  return b.overflow ? -1 : b.n_nodes;
}

// ASCII P3, exactly the reference's format (ppm.cpp:13-36): header
// "P3\n<w> <h>\n255\n", space-separated values, no trailing space at a
// row's last channel, one newline per pixel row.  Returns 0 on success.
int rt_write_ppm(const char* path, const uint8_t* data, int width, int height) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  std::fprintf(f, "P3\n%d %d\n255\n", width, height);
  std::vector<char> buf;
  buf.reserve(static_cast<size_t>(width) * 13 + 16);
  char tmp[8];
  for (int y = 0; y < height; ++y) {
    buf.clear();
    const uint8_t* row = data + static_cast<size_t>(y) * width * 3;
    for (int x = 0; x < width * 3; ++x) {
      int len = std::snprintf(tmp, sizeof tmp, "%u", row[x]);
      buf.insert(buf.end(), tmp, tmp + len);
      buf.push_back(x + 1 == width * 3 ? '\n' : ' ');
    }
    if (std::fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
      std::fclose(f);
      return 1;
    }
  }
  return std::fclose(f) ? 1 : 0;
}

}  // extern "C"
