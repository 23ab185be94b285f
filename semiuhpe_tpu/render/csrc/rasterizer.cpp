// Software mesh rasterizer for head-pose visualization.
//
// Native (C++) counterpart of the reference's Sim3DR kernel
// (/root/reference/Sim3DR/lib/rasterize_kernel.cpp): z-buffered triangle
// rasterization with barycentric color interpolation and alpha blend into a
// uint8 background image, plus per-vertex normals accumulated from triangle
// cross products.  Written from scratch; exposed with a C ABI for ctypes
// (the reference uses a Cython bridge instead).
//
// Conventions (matching the Python callers):
//   vertices: (nver, 3) float32, x right, y down (image coords), z toward
//             the viewer — larger z wins the depth test.
//   triangles: (ntri, 3) int32 vertex indices.
//   colors:   (nver, 3) float32 in [0, 1].
//   image:    (h, w, c) uint8, modified in place.
//   depth:    (h, w) float32, initialized by the caller (e.g. -1e8).

#include <cmath>
#include <cstdint>
#include <algorithm>

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 sub(const Vec3& a, const Vec3& b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}

inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

// Signed area of the parallelogram spanned by (b-a, c-a) in the xy plane.
inline float edge2d(float ax, float ay, float bx, float by, float cx, float cy) {
  return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax);
}

}  // namespace

extern "C" {

// Accumulate area-weighted triangle normals onto vertices and normalize.
void ver_normals(const float* vertices, const int* triangles, int nver,
                 int ntri, float* out /* (nver, 3), zero-initialized ok */) {
  for (int i = 0; i < nver * 3; ++i) out[i] = 0.f;
  for (int t = 0; t < ntri; ++t) {
    const int i0 = triangles[3 * t], i1 = triangles[3 * t + 1],
              i2 = triangles[3 * t + 2];
    const Vec3 v0{vertices[3 * i0], vertices[3 * i0 + 1], vertices[3 * i0 + 2]};
    const Vec3 v1{vertices[3 * i1], vertices[3 * i1 + 1], vertices[3 * i1 + 2]};
    const Vec3 v2{vertices[3 * i2], vertices[3 * i2 + 1], vertices[3 * i2 + 2]};
    const Vec3 n = cross(sub(v1, v0), sub(v2, v0));
    for (int idx : {i0, i1, i2}) {
      out[3 * idx] += n.x;
      out[3 * idx + 1] += n.y;
      out[3 * idx + 2] += n.z;
    }
  }
  for (int v = 0; v < nver; ++v) {
    const float nx = out[3 * v], ny = out[3 * v + 1], nz = out[3 * v + 2];
    const float len = std::sqrt(nx * nx + ny * ny + nz * nz);
    if (len > 0.f) {
      out[3 * v] = nx / len;
      out[3 * v + 1] = ny / len;
      out[3 * v + 2] = nz / len;
    }
  }
}

// Z-buffered rasterization with barycentric-interpolated vertex colors,
// alpha-blended into the uint8 image.
void rasterize(uint8_t* image, const float* vertices, const int* triangles,
               const float* colors, float* depth, int ntri, int h, int w,
               int c, float alpha) {
  for (int t = 0; t < ntri; ++t) {
    const int i0 = triangles[3 * t], i1 = triangles[3 * t + 1],
              i2 = triangles[3 * t + 2];
    const float x0 = vertices[3 * i0], y0 = vertices[3 * i0 + 1],
                z0 = vertices[3 * i0 + 2];
    const float x1 = vertices[3 * i1], y1 = vertices[3 * i1 + 1],
                z1 = vertices[3 * i1 + 2];
    const float x2 = vertices[3 * i2], y2 = vertices[3 * i2 + 1],
                z2 = vertices[3 * i2 + 2];

    const int xmin = std::max(0, (int)std::ceil(std::min({x0, x1, x2})));
    const int xmax = std::min(w - 1, (int)std::floor(std::max({x0, x1, x2})));
    const int ymin = std::max(0, (int)std::ceil(std::min({y0, y1, y2})));
    const int ymax = std::min(h - 1, (int)std::floor(std::max({y0, y1, y2})));
    if (xmin > xmax || ymin > ymax) continue;

    const float area = edge2d(x0, y0, x1, y1, x2, y2);
    if (std::fabs(area) < 1e-12f) continue;
    const float inv_area = 1.f / area;

    for (int y = ymin; y <= ymax; ++y) {
      for (int x = xmin; x <= xmax; ++x) {
        const float px = (float)x, py = (float)y;
        // Barycentric weights; inside iff all have the sign of the area.
        float w0 = edge2d(x1, y1, x2, y2, px, py) * inv_area;
        float w1 = edge2d(x2, y2, x0, y0, px, py) * inv_area;
        float w2 = edge2d(x0, y0, x1, y1, px, py) * inv_area;
        if (w0 < 0.f || w1 < 0.f || w2 < 0.f) continue;

        const float z = w0 * z0 + w1 * z1 + w2 * z2;
        float* zp = depth + y * w + x;
        if (z <= *zp) continue;
        *zp = z;

        uint8_t* px_ptr = image + (y * w + x) * c;
        for (int ch = 0; ch < c && ch < 3; ++ch) {
          const float col = w0 * colors[3 * i0 + ch] +
                            w1 * colors[3 * i1 + ch] +
                            w2 * colors[3 * i2 + ch];
          const float blended =
              (1.f - alpha) * (float)px_ptr[ch] + alpha * 255.f * col;
          px_ptr[ch] = (uint8_t)std::min(255.f, std::max(0.f, blended + 0.5f));
        }
      }
    }
  }
}

// Rasterize returning the barycentric-interpolated depth only (used by the
// tests and by depth-based compositing).
void rasterize_depth(const float* vertices, const int* triangles, float* depth,
                     int ntri, int h, int w) {
  for (int t = 0; t < ntri; ++t) {
    const int i0 = triangles[3 * t], i1 = triangles[3 * t + 1],
              i2 = triangles[3 * t + 2];
    const float x0 = vertices[3 * i0], y0 = vertices[3 * i0 + 1],
                z0 = vertices[3 * i0 + 2];
    const float x1 = vertices[3 * i1], y1 = vertices[3 * i1 + 1],
                z1 = vertices[3 * i1 + 2];
    const float x2 = vertices[3 * i2], y2 = vertices[3 * i2 + 1],
                z2 = vertices[3 * i2 + 2];
    const int xmin = std::max(0, (int)std::ceil(std::min({x0, x1, x2})));
    const int xmax = std::min(w - 1, (int)std::floor(std::max({x0, x1, x2})));
    const int ymin = std::max(0, (int)std::ceil(std::min({y0, y1, y2})));
    const int ymax = std::min(h - 1, (int)std::floor(std::max({y0, y1, y2})));
    if (xmin > xmax || ymin > ymax) continue;
    const float area = edge2d(x0, y0, x1, y1, x2, y2);
    if (std::fabs(area) < 1e-12f) continue;
    const float inv_area = 1.f / area;
    for (int y = ymin; y <= ymax; ++y) {
      for (int x = xmin; x <= xmax; ++x) {
        float w0 = edge2d(x1, y1, x2, y2, (float)x, (float)y) * inv_area;
        float w1 = edge2d(x2, y2, x0, y0, (float)x, (float)y) * inv_area;
        float w2 = edge2d(x0, y0, x1, y1, (float)x, (float)y) * inv_area;
        if (w0 < 0.f || w1 < 0.f || w2 < 0.f) continue;
        const float z = w0 * z0 + w1 * z1 + w2 * z2;
        float* zp = depth + y * w + x;
        if (z > *zp) *zp = z;
      }
    }
  }
}

}  // extern "C"
