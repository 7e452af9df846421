// Native host ops for shasta_tpu: rotated-box geometry, NMS, voxelizer.
//
// Role mirror of the reference's native components (det3d/ops/iou3d_nms
// CPU/CUDA extension and the numba voxelizer/pc_in_box kernels), written
// fresh as a plain C ABI shared library consumed via ctypes — no pybind11.
//
// Box convention matches shasta_tpu.core.geometry: rows [x,y,z,w,l,h,yaw]
// with w along the box-local x axis and clockwise-positive yaw
// (world = [[c, s], [-s, c]] @ local).
//
// Build: g++ -O3 -march=native -shared -fPIC host_ops.cpp -o libshasta_host.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>
#include <unordered_map>

namespace {

struct Pt {
  double x, y;
};

// BEV corners, clockwise (template (-.5,-.5),(-.5,.5),(.5,.5),(.5,-.5)
// scaled by (w, l), rotated clockwise by yaw).
inline void box_corners(const float* b, Pt* c) {
  const double w = b[3], l = b[4], yaw = b[6];
  const double cs = std::cos(yaw), sn = std::sin(yaw);
  const double tx[4] = {-0.5 * w, -0.5 * w, 0.5 * w, 0.5 * w};
  const double ty[4] = {-0.5 * l, 0.5 * l, 0.5 * l, -0.5 * l};
  for (int i = 0; i < 4; i++) {
    c[i].x = tx[i] * cs + ty[i] * sn + b[0];
    c[i].y = -tx[i] * sn + ty[i] * cs + b[1];
  }
}

inline double polygon_area(const Pt* v, int n) {
  double a = 0;
  for (int i = 0; i < n; i++) {
    const Pt& p = v[i];
    const Pt& q = v[(i + 1) % n];
    a += p.x * q.y - q.x * p.y;
  }
  return std::fabs(a) * 0.5;
}

// Sutherland-Hodgman: clip clockwise polygon by the half-plane right of
// edge a->b (interior of a clockwise polygon).
inline int clip_edge(const Pt* in, int n, Pt a, Pt b, Pt* out) {
  const double ex = b.x - a.x, ey = b.y - a.y;
  int m = 0;
  for (int i = 0; i < n; i++) {
    const Pt& s = in[i];
    const Pt& e = in[(i + 1) % n];
    const double cs = ex * (s.y - a.y) - ey * (s.x - a.x);
    const double ce = ex * (e.y - a.y) - ey * (e.x - a.x);
    const bool s_in = cs <= 1e-8, e_in = ce <= 1e-8;
    if (s_in != e_in) {
      const double t = cs / (cs - ce);
      out[m].x = s.x + t * (e.x - s.x);
      out[m].y = s.y + t * (e.y - s.y);
      m++;
    }
    if (e_in) out[m++] = e;
  }
  return m;
}

inline double rect_overlap(const float* b1, const float* b2) {
  Pt c1[4], c2[4];
  box_corners(b1, c1);
  box_corners(b2, c2);
  Pt buf1[16], buf2[16];
  std::memcpy(buf1, c1, sizeof(c1));
  int n = 4;
  Pt* cur = buf1;
  Pt* nxt = buf2;
  for (int k = 0; k < 4 && n > 0; k++) {
    n = clip_edge(cur, n, c2[k], c2[(k + 1) % 4], nxt);
    std::swap(cur, nxt);
  }
  return n >= 3 ? polygon_area(cur, n) : 0.0;
}

inline double z_overlap(const float* b1, const float* b2) {
  const double lo = std::max(b1[2] - b1[5] * 0.5, b2[2] - b2[5] * 0.5);
  const double hi = std::min(b1[2] + b1[5] * 0.5, b2[2] + b2[5] * 0.5);
  return std::max(0.0, hi - lo);
}

}  // namespace

extern "C" {

// Pairwise rotated BEV overlap areas: boxes (N,7)/(M,7) -> out (N*M).
void boxes_overlap_bev(const float* boxes1, int n, const float* boxes2, int m,
                       float* out) {
  for (int i = 0; i < n; i++)
    for (int j = 0; j < m; j++)
      out[i * m + j] = (float)rect_overlap(boxes1 + 7 * i, boxes2 + 7 * j);
}

// Pairwise BEV IoU.
void boxes_iou_bev(const float* boxes1, int n, const float* boxes2, int m,
                   float* out) {
  for (int i = 0; i < n; i++) {
    const float a1 = boxes1[7 * i + 3] * boxes1[7 * i + 4];
    for (int j = 0; j < m; j++) {
      const float a2 = boxes2[7 * j + 3] * boxes2[7 * j + 4];
      const double inter = rect_overlap(boxes1 + 7 * i, boxes2 + 7 * j);
      out[i * m + j] = (float)(inter / std::max(1e-8, (double)a1 + a2 - inter));
    }
  }
}

// Pairwise 3D IoU (BEV overlap x z overlap).
void boxes_iou_3d(const float* boxes1, int n, const float* boxes2, int m,
                  float* out) {
  for (int i = 0; i < n; i++) {
    const float* b1 = boxes1 + 7 * i;
    const double v1 = (double)b1[3] * b1[4] * b1[5];
    for (int j = 0; j < m; j++) {
      const float* b2 = boxes2 + 7 * j;
      const double v2 = (double)b2[3] * b2[4] * b2[5];
      const double inter = rect_overlap(b1, b2) * z_overlap(b1, b2);
      out[i * m + j] = (float)(inter / std::max(1e-8, v1 + v2 - inter));
    }
  }
}

// Rotated NMS: boxes (N,7) with scores (N); returns number of kept indices
// written to keep (caller-allocated N int64).
int rotate_nms(const float* boxes, const float* scores, int n,
               float iou_threshold, int64_t* keep) {
  std::vector<int> order(n);
  for (int i = 0; i < n; i++) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> suppressed(n, 0);
  int k = 0;
  for (int oi = 0; oi < n; oi++) {
    const int i = order[oi];
    if (suppressed[i]) continue;
    keep[k++] = i;
    const float a1 = boxes[7 * i + 3] * boxes[7 * i + 4];
    for (int oj = oi + 1; oj < n; oj++) {
      const int j = order[oj];
      if (suppressed[j]) continue;
      const float a2 = boxes[7 * j + 3] * boxes[7 * j + 4];
      const double inter = rect_overlap(boxes + 7 * i, boxes + 7 * j);
      const double iou = inter / std::max(1e-8, (double)a1 + a2 - inter);
      if (iou > iou_threshold) suppressed[j] = 1;
    }
  }
  return k;
}

// Points in rotated 3D boxes (mot_3d pc_in_box semantics: l along local x,
// CCW yaw). box rows [x,y,z,o,l,w,h]; mask out (P) uint8.
void pc_in_box(const float* box, const float* pc, int p, float scale,
               uint8_t* mask) {
  const double cx = box[0], cy = box[1], cz = box[2];
  const double yaw = box[3];
  const double hl = box[4] * scale * 0.5, hw = box[5] * scale * 0.5,
               hh = box[6] * scale * 0.5;
  const double cs = std::cos(yaw), sn = std::sin(yaw);
  for (int i = 0; i < p; i++) {
    const double dx = pc[3 * i] - cx, dy = pc[3 * i + 1] - cy;
    const double rx = dx * cs + dy * sn;
    const double ry = -dx * sn + dy * cs;
    const double rz = pc[3 * i + 2] - cz;
    mask[i] = (std::fabs(rx) < hl) && (std::fabs(ry) < hw) && (std::fabs(rz) < hh);
  }
}

// Voxelizer with the reference kernel's exact semantics
// (point_cloud_ops.py:7-55): arrival-ordered voxels, zyx coords, capped
// points per voxel. points (N, C); outputs caller-allocated:
// voxels (max_voxels, max_points, C), coors (max_voxels, 3) int32,
// num_points (max_voxels) int32. Returns the voxel count.
int points_to_voxel(const float* points, int n, int c, const float* voxel_size,
                    const float* coors_range, int max_points, int max_voxels,
                    float* voxels, int32_t* coors, int32_t* num_points) {
  const double vx = voxel_size[0], vy = voxel_size[1], vz = voxel_size[2];
  const int gx = (int)std::round((coors_range[3] - coors_range[0]) / vx);
  const int gy = (int)std::round((coors_range[4] - coors_range[1]) / vy);
  const int gz = (int)std::round((coors_range[5] - coors_range[2]) / vz);
  std::unordered_map<int64_t, int> voxel_of;
  voxel_of.reserve(max_voxels * 2);
  int voxel_num = 0;
  for (int i = 0; i < n; i++) {
    const float* p = points + (int64_t)i * c;
    const int ix = (int)std::floor((p[0] - coors_range[0]) / vx);
    if (ix < 0 || ix >= gx) continue;
    const int iy = (int)std::floor((p[1] - coors_range[1]) / vy);
    if (iy < 0 || iy >= gy) continue;
    const int iz = (int)std::floor((p[2] - coors_range[2]) / vz);
    if (iz < 0 || iz >= gz) continue;
    const int64_t key = ((int64_t)iz * gy + iy) * gx + ix;
    auto it = voxel_of.find(key);
    int vi;
    if (it == voxel_of.end()) {
      if (voxel_num >= max_voxels) continue;
      vi = voxel_num++;
      voxel_of.emplace(key, vi);
      coors[3 * vi] = iz;
      coors[3 * vi + 1] = iy;
      coors[3 * vi + 2] = ix;
    } else {
      vi = it->second;
    }
    const int np = num_points[vi];
    if (np < max_points) {
      std::memcpy(voxels + ((int64_t)vi * max_points + np) * c, p,
                  sizeof(float) * c);
      num_points[vi] = np + 1;
    }
  }
  return voxel_num;
}

// crc32c (Castagnoli, table-driven, slice-by-1) for TFRecord framing
// verification (data/tfrecord.py) — the pure-python byte loop is ~1000x
// slower on multi-MB lidar records.
uint32_t crc32c(const uint8_t* data, int64_t n, uint32_t crc) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; i++) {
      uint32_t c = i;
      for (int k = 0; k < 8; k++) c = (c >> 1) ^ ((c & 1) ? 0x82F63B78u : 0u);
      table[i] = c;
    }
    init = true;
  }
  crc ^= 0xFFFFFFFFu;
  for (int64_t i = 0; i < n; i++) crc = table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

}  // extern "C"
