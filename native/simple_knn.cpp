// Native 3-NN mean-squared-distance for gaussian scale initialization.
//
// C++ re-design of the reference's simple-knn CUDA extension
// (submodules/simple-knn/simple_knn.cu:46-71 Morton sort, :79+ boxes,
// spatial.cu:15-26 distCUDA2): Morton-order the points, build boxes of
// BOX_SIZE consecutive sorted points with min/max bounds, then for each
// point scan a window of nearby boxes pruned by box distance against the
// current 3-best. OpenMP-parallel over points.
//
// Exposed as a C ABI for ctypes (no pybind11 in this toolchain).

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int BOX_SIZE = 1024;
constexpr int K = 3;

struct Vec3 {
  float x, y, z;
};

inline uint32_t expand_bits_10(uint32_t v) {
  // spread 10 bits to every 3rd bit position
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

inline uint32_t morton3(float x, float y, float z) {
  uint32_t xi = (uint32_t)std::min(std::max(x * 1023.0f, 0.0f), 1023.0f);
  uint32_t yi = (uint32_t)std::min(std::max(y * 1023.0f, 0.0f), 1023.0f);
  uint32_t zi = (uint32_t)std::min(std::max(z * 1023.0f, 0.0f), 1023.0f);
  return (expand_bits_10(xi) << 2) | (expand_bits_10(yi) << 1)
         | expand_bits_10(zi);
}

inline float dist2(const Vec3& a, const Vec3& b) {
  float dx = a.x - b.x, dy = a.y - b.y, dz = a.z - b.z;
  return dx * dx + dy * dy + dz * dz;
}

inline float box_dist2(const Vec3& p, const Vec3& mn, const Vec3& mx) {
  float dx = std::max(std::max(mn.x - p.x, 0.0f), p.x - mx.x);
  float dy = std::max(std::max(mn.y - p.y, 0.0f), p.y - mx.y);
  float dz = std::max(std::max(mn.z - p.z, 0.0f), p.z - mx.z);
  return dx * dx + dy * dy + dz * dz;
}

inline void update_best(float d2, float best[K]) {
  if (d2 < best[K - 1]) {
    best[K - 1] = d2;
    for (int j = K - 1; j > 0 && best[j] < best[j - 1]; --j)
      std::swap(best[j], best[j - 1]);
  }
}

}  // namespace

extern "C" {

// pts: [n*3] float32 (x,y,z interleaved); out: [n] float32 mean of squared
// distances to the 3 nearest neighbors (the reference's distCUDA2).
void mean_knn_dist2(const float* pts, int64_t n, float* out) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = 0.0f;
    return;
  }
  std::vector<Vec3> p(n);
  Vec3 mn = {FLT_MAX, FLT_MAX, FLT_MAX};
  Vec3 mx = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
  for (int64_t i = 0; i < n; ++i) {
    p[i] = {pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
    mn.x = std::min(mn.x, p[i].x); mx.x = std::max(mx.x, p[i].x);
    mn.y = std::min(mn.y, p[i].y); mx.y = std::max(mx.y, p[i].y);
    mn.z = std::min(mn.z, p[i].z); mx.z = std::max(mx.z, p[i].z);
  }
  float sx = 1.0f / std::max(mx.x - mn.x, 1e-12f);
  float sy = 1.0f / std::max(mx.y - mn.y, 1e-12f);
  float sz = 1.0f / std::max(mx.z - mn.z, 1e-12f);

  std::vector<std::pair<uint32_t, int64_t>> order(n);
  for (int64_t i = 0; i < n; ++i)
    order[i] = {morton3((p[i].x - mn.x) * sx, (p[i].y - mn.y) * sy,
                        (p[i].z - mn.z) * sz),
                i};
  std::sort(order.begin(), order.end());

  std::vector<Vec3> ps(n);
  for (int64_t i = 0; i < n; ++i) ps[i] = p[order[i].second];

  int64_t nboxes = (n + BOX_SIZE - 1) / BOX_SIZE;
  std::vector<Vec3> bmin(nboxes), bmax(nboxes);
  for (int64_t b = 0; b < nboxes; ++b) {
    Vec3 bm = {FLT_MAX, FLT_MAX, FLT_MAX};
    Vec3 bM = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    int64_t e = std::min<int64_t>((b + 1) * BOX_SIZE, n);
    for (int64_t i = b * BOX_SIZE; i < e; ++i) {
      bm.x = std::min(bm.x, ps[i].x); bM.x = std::max(bM.x, ps[i].x);
      bm.y = std::min(bm.y, ps[i].y); bM.y = std::max(bM.y, ps[i].y);
      bm.z = std::min(bm.z, ps[i].z); bM.z = std::max(bM.z, ps[i].z);
    }
    bmin[b] = bm;
    bmax[b] = bM;
  }

#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n; ++i) {
    float best[K] = {FLT_MAX, FLT_MAX, FLT_MAX};
    // own box first: Morton neighbors are usually spatial neighbors, so
    // this seeds a tight prune radius. Each candidate is visited exactly
    // once (update_best has no dedup).
    int64_t myb = i / BOX_SIZE;
    int64_t me = std::min<int64_t>((myb + 1) * BOX_SIZE, n);
    for (int64_t j = myb * BOX_SIZE; j < me; ++j)
      if (j != i) update_best(dist2(ps[i], ps[j]), best);
    // box-pruned sweep over the rest
    for (int64_t b = 0; b < nboxes; ++b) {
      if (b == myb) continue;
      if (box_dist2(ps[i], bmin[b], bmax[b]) > best[K - 1]) continue;
      int64_t e = std::min<int64_t>((b + 1) * BOX_SIZE, n);
      for (int64_t j = b * BOX_SIZE; j < e; ++j)
        update_best(dist2(ps[i], ps[j]), best);
    }
    out[order[i].second] = (best[0] + best[1] + best[2]) / 3.0f;
  }
}

}  // extern "C"
