// Native host rasterizer: analytic primary-ray casting for G-buffer
// fixture generation.
//
// Role: the reference consumes G-buffers produced by the engine's native
// (C++) rasterizer; this library is that runtime component for the TPU
// framework's host side. It intersects camera rays against the analytic
// scene primitives (spheres / one-sided quads / axis-aligned boxes —
// models/scene.py) and returns hit distance, shading normal, and
// primitive index, with an optional backface mode (the front-cull
// re-rasterization analog, reference BackfaceDepthPass cs:1226-1328).
//
// Exposed via a plain C ABI and loaded with ctypes
// (models/native_raster.py); falls back to the numpy implementation
// when the shared library is unavailable.
//
// Build: g++ -O3 -march=native -shared -fPIC -o _sspt_native.so rasterizer.cpp

#include <cmath>
#include <cstdint>
#include <limits>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();
constexpr float kEps = 1e-4f;

struct Vec3 {
  float x, y, z;
};

inline Vec3 sub(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline float dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline Vec3 normalize(Vec3 v) {
  float n = std::sqrt(dot(v, v));
  float inv = n > 0.f ? 1.f / n : 0.f;
  return {v.x * inv, v.y * inv, v.z * inv};
}

inline Vec3 load3(const float* p) { return {p[0], p[1], p[2]}; }

// Sphere: {cx, cy, cz, r}. Matches scene._intersect_sphere.
inline bool hit_sphere(const float* s, Vec3 o, Vec3 d, bool backface,
                       float* t_out, Vec3* n_out) {
  Vec3 c = load3(s);
  float r = s[3];
  Vec3 oc = sub(o, c);
  float b = dot(oc, d);
  float cc = dot(oc, oc) - r * r;
  float disc = b * b - cc;
  if (disc < 0.f) return false;
  float sq = std::sqrt(disc);
  float t = backface ? (-b + sq) : (-b - sq);
  if (t <= kEps) return false;
  Vec3 hp = {o.x + d.x * t, o.y + d.y * t, o.z + d.z * t};
  Vec3 n = {(hp.x - c.x) / r, (hp.y - c.y) / r, (hp.z - c.z) / r};
  *t_out = t;
  *n_out = n;
  return true;
}

// Quad: {corner(3), e1(3), e2(3)}; one-sided (front face when the ray
// opposes normal = e1 x e2). Matches scene._intersect_quad.
inline bool hit_quad(const float* q, Vec3 o, Vec3 d, bool backface,
                     float* t_out, Vec3* n_out) {
  if (backface) return false;  // quads have no backfaces
  Vec3 corner = load3(q);
  Vec3 e1 = load3(q + 3);
  Vec3 e2 = load3(q + 6);
  Vec3 n = normalize(cross(e1, e2));
  float denom = dot(d, n);
  if (denom >= 0.f) return false;  // facing away
  float t = dot(sub(corner, o), n) / denom;
  if (t <= kEps) return false;
  Vec3 hp = {o.x + d.x * t, o.y + d.y * t, o.z + d.z * t};
  Vec3 rel = sub(hp, corner);
  float u = dot(rel, e1) / dot(e1, e1);
  float v = dot(rel, e2) / dot(e2, e2);
  if (u < 0.f || u > 1.f || v < 0.f || v > 1.f) return false;
  *t_out = t;
  *n_out = n;
  return true;
}

// Axis-aligned box: {min(3), max(3)}. Matches scene._intersect_box.
inline bool hit_box(const float* bx, Vec3 o, Vec3 d, bool backface,
                    float* t_out, Vec3* n_out) {
  Vec3 bmin = load3(bx);
  Vec3 bmax = load3(bx + 3);
  float tmin = -kInf, tmax = kInf;
  const float od[3] = {o.x, o.y, o.z};
  const float dd[3] = {d.x, d.y, d.z};
  const float mn[3] = {bmin.x, bmin.y, bmin.z};
  const float mx[3] = {bmax.x, bmax.y, bmax.z};
  for (int a = 0; a < 3; ++a) {
    float inv = 1.f / (std::fabs(dd[a]) < 1e-9f ? 1e-9f : dd[a]);
    float t0 = (mn[a] - od[a]) * inv;
    float t1 = (mx[a] - od[a]) * inv;
    if (t0 > t1) { float tmp = t0; t0 = t1; t1 = tmp; }
    if (t0 > tmin) tmin = t0;
    if (t1 < tmax) tmax = t1;
  }
  if (tmax < (tmin > 0.f ? tmin : 0.f)) return false;
  float t = backface ? tmax : tmin;
  if (t <= kEps) return false;
  // outward normal from the dominant axis of the local hit position
  Vec3 center = {(bmin.x + bmax.x) * .5f, (bmin.y + bmax.y) * .5f,
                 (bmin.z + bmax.z) * .5f};
  Vec3 half = {(bmax.x - bmin.x) * .5f, (bmax.y - bmin.y) * .5f,
               (bmax.z - bmin.z) * .5f};
  Vec3 hp = {o.x + d.x * t, o.y + d.y * t, o.z + d.z * t};
  float lx = (hp.x - center.x) / half.x;
  float ly = (hp.y - center.y) / half.y;
  float lz = (hp.z - center.z) / half.z;
  Vec3 n = {0, 0, 0};
  float ax = std::fabs(lx), ay = std::fabs(ly), az = std::fabs(lz);
  if (ax >= ay && ax >= az) n.x = lx > 0 ? 1.f : -1.f;
  else if (ay >= az) n.y = ly > 0 ? 1.f : -1.f;
  else n.z = lz > 0 ? 1.f : -1.f;
  *t_out = t;
  *n_out = n;
  return true;
}

}  // namespace

extern "C" {

// Nearest hit over the packed primitive arrays.
//   spheres: n_spheres x 4, quads: n_quads x 9, boxes: n_boxes x 6
//   prim index convention: spheres first, then quads, then boxes
//   origins/dirs: n_rays x 3 (float32); dirs unit length
// Outputs: out_t (n_rays, +inf on miss), out_n (n_rays x 3),
//          out_idx (n_rays, -1 on miss).
void sspt_intersect_scene(const float* spheres, int64_t n_spheres,
                          const float* quads, int64_t n_quads,
                          const float* boxes, int64_t n_boxes,
                          const float* origins, const float* dirs,
                          int64_t n_rays, int backface, float* out_t,
                          float* out_n, int32_t* out_idx) {
  for (int64_t r = 0; r < n_rays; ++r) {
    Vec3 o = load3(origins + 3 * r);
    Vec3 d = load3(dirs + 3 * r);
    float best_t = kInf;
    Vec3 best_n = {0, 0, 0};
    int32_t best_i = -1;
    float t;
    Vec3 n;
    for (int64_t i = 0; i < n_spheres; ++i) {
      if (hit_sphere(spheres + 4 * i, o, d, backface, &t, &n) && t < best_t) {
        best_t = t; best_n = n; best_i = (int32_t)i;
      }
    }
    for (int64_t i = 0; i < n_quads; ++i) {
      if (hit_quad(quads + 9 * i, o, d, backface, &t, &n) && t < best_t) {
        best_t = t; best_n = n; best_i = (int32_t)(n_spheres + i);
      }
    }
    for (int64_t i = 0; i < n_boxes; ++i) {
      if (hit_box(boxes + 6 * i, o, d, backface, &t, &n) && t < best_t) {
        best_t = t; best_n = n; best_i = (int32_t)(n_spheres + n_quads + i);
      }
    }
    out_t[r] = best_t;
    out_n[3 * r] = best_n.x;
    out_n[3 * r + 1] = best_n.y;
    out_n[3 * r + 2] = best_n.z;
    out_idx[r] = best_i;
  }
}

}  // extern "C"
