// Native software rasterizer — the hot backend of the offline render stage.
//
// Mirrors raster_numpy.py exactly (which in turn mirrors the reference GL
// pipeline: auto_pose/meshrenderer/meshrenderer_phong.py + depth_shader_phong
// shaders + gl_utils/camera.py realCamera):
//   * OpenCV pinhole projection, z-buffer on eye-space z, near/far clip
//   * Gouraud-interpolated Phong (positional light in GL-eye coords,
//     no shininess exponent), perspective-correct varyings
//   * outputs BGR uint8 + eye-space z depth float32, background zero
//
// Parallelism: threads own horizontal bands of the image; every thread scans
// all triangles and rasterizes the band intersection (no locks, no atomics).
//
// C ABI only — bound from Python with ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct Mesh {
  std::vector<double> verts;    // 3V
  std::vector<double> normals;  // 3V
  std::vector<double> colors;   // 3V in [0,1]
  std::vector<int32_t> faces;   // 3F
  int n_verts = 0;
  int n_faces = 0;
};

std::vector<Mesh> g_meshes;

struct Vec3 {
  double x, y, z;
};

inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3 operator*(double s, Vec3 a) { return {s * a.x, s * a.y, s * a.z}; }
inline double dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 normalize(Vec3 a) {
  double n = std::sqrt(dot(a, a));
  double inv = n > 1e-12 ? 1.0 / n : 0.0;
  return {a.x * inv, a.y * inv, a.z * inv};
}

// Per-vertex eye-space attributes (shader varyings).
struct VertexAttr {
  double u, v;     // pixel coords
  double z;        // eye-space z (OpenCV convention, >0 in front)
  double inv_z;
  Vec3 n, l, view; // GL-eye normal, to-light, to-eye
  Vec3 color;
  bool valid;
};

inline Vec3 shade_pixel(Vec3 n, Vec3 l, Vec3 view, Vec3 color, double ambient,
                        double diffuse, double specular) {
  Vec3 N = normalize(n), L = normalize(l), V = normalize(view);
  double ndotl = std::max(dot(N, L), 0.0);
  Vec3 refl = (2.0 * dot(N, L)) * N - L;
  double rdotv = std::max(dot(refl, V), 0.0);
  double w_d = diffuse * ndotl, w_s = specular * rdotv;
  Vec3 rgb = {(ambient + w_d + w_s) * color.x, (ambient + w_d + w_s) * color.y,
              (ambient + w_d + w_s) * color.z};
  rgb.x = std::min(std::max(rgb.x, 0.0), 1.0);
  rgb.y = std::min(std::max(rgb.y, 0.0), 1.0);
  rgb.z = std::min(std::max(rgb.z, 0.0), 1.0);
  return rgb;
}

}  // namespace

extern "C" {

// Register a mesh; colors may be null (gray-160 fallback). Returns mesh id.
int aae_mesh_register(const double* vertices, const double* normals,
                      const double* colors, int n_vertices,
                      const int32_t* faces, int n_faces) {
  Mesh m;
  m.n_verts = n_vertices;
  m.n_faces = n_faces;
  m.verts.assign(vertices, vertices + 3 * n_vertices);
  m.normals.assign(normals, normals + 3 * n_vertices);
  m.colors.resize(3 * n_vertices);
  if (colors) {
    for (int i = 0; i < 3 * n_vertices; ++i) m.colors[i] = colors[i] / 255.0;
  } else {
    std::fill(m.colors.begin(), m.colors.end(), 160.0 / 255.0);
  }
  m.faces.assign(faces, faces + 3 * n_faces);
  g_meshes.push_back(std::move(m));
  return static_cast<int>(g_meshes.size()) - 1;
}

void aae_mesh_clear() { g_meshes.clear(); }

// Render mesh `mesh_id`; out_bgr is H*W*3 uint8, out_depth H*W float32.
// K, R row-major 3x3; t 3; light_pos 3 (GL-eye coords as in the reference).
int aae_render(int mesh_id, int W, int H, const double* K, const double* R,
               const double* t, double near_p, double far_p,
               const double* light_pos, double ambient, double diffuse,
               double specular, uint8_t* out_bgr, float* out_depth) {
  if (mesh_id < 0 || mesh_id >= static_cast<int>(g_meshes.size())) return -1;
  const Mesh& m = g_meshes[mesh_id];

  std::memset(out_bgr, 0, static_cast<size_t>(W) * H * 3);
  std::vector<double> depth_buf(static_cast<size_t>(W) * H, 1e300);

  // ---- vertex stage
  std::vector<VertexAttr> va(m.n_verts);
  const Vec3 light = {light_pos[0], light_pos[1], light_pos[2]};
#pragma omp parallel for schedule(static)
  for (int i = 0; i < m.n_verts; ++i) {
    const double* p = &m.verts[3 * i];
    double x = R[0] * p[0] + R[1] * p[1] + R[2] * p[2] + t[0];
    double y = R[3] * p[0] + R[4] * p[1] + R[5] * p[2] + t[1];
    double z = R[6] * p[0] + R[7] * p[1] + R[8] * p[2] + t[2];
    VertexAttr& a = va[i];
    a.valid = z > 1e-9;
    a.z = z;
    a.inv_z = a.valid ? 1.0 / z : 0.0;
    a.u = a.valid ? (K[0] * x + K[1] * y) / z + K[2] : 0.0;
    a.v = a.valid ? (K[4] * y) / z + K[5] : 0.0;
    const double* n = &m.normals[3 * i];
    Vec3 n_gl = {R[0] * n[0] + R[1] * n[1] + R[2] * n[2],
                 R[3] * n[0] + R[4] * n[1] + R[5] * n[2],
                 -(R[6] * n[0] + R[7] * n[1] + R[8] * n[2])};
    a.n = normalize(n_gl);
    Vec3 p_gl = {x, y, -z};
    a.l = normalize(light - p_gl);
    a.view = {-x, -y, z};
    a.color = {m.colors[3 * i], m.colors[3 * i + 1], m.colors[3 * i + 2]};
  }

  // ---- raster stage: each thread owns a band of rows
#pragma omp parallel
  {
#if defined(_OPENMP)
    const int tid = omp_get_thread_num();
    const int nthreads = omp_get_num_threads();
#else
    const int tid = 0;
    const int nthreads = 1;
#endif
    const int band_y0 = static_cast<int>(static_cast<int64_t>(H) * tid / nthreads);
    const int band_y1 = static_cast<int>(static_cast<int64_t>(H) * (tid + 1) / nthreads) - 1;

    for (int fi = 0; fi < m.n_faces; ++fi) {
      const int32_t* f = &m.faces[3 * fi];
      const VertexAttr& a0 = va[f[0]];
      const VertexAttr& a1 = va[f[1]];
      const VertexAttr& a2 = va[f[2]];
      if (!(a0.valid && a1.valid && a2.valid)) continue;

      const double area = (a1.u - a0.u) * (a2.v - a0.v) - (a1.v - a0.v) * (a2.u - a0.u);
      if (std::fabs(area) < 1e-12) continue;
      const double inv_area = 1.0 / area;

      int x_min = std::max(static_cast<int>(std::floor(std::min({a0.u, a1.u, a2.u}) - 0.5)), 0);
      int x_max = std::min(static_cast<int>(std::ceil(std::max({a0.u, a1.u, a2.u}) - 0.5)), W - 1);
      int y_min = std::max(static_cast<int>(std::floor(std::min({a0.v, a1.v, a2.v}) - 0.5)), band_y0);
      int y_max = std::min(static_cast<int>(std::ceil(std::max({a0.v, a1.v, a2.v}) - 0.5)), band_y1);
      if (x_min > x_max || y_min > y_max) continue;

      for (int py = y_min; py <= y_max; ++py) {
        const double gy = py + 0.5;
        for (int px = x_min; px <= x_max; ++px) {
          const double gx = px + 0.5;
          const double w0 = ((a1.u - gx) * (a2.v - gy) - (a1.v - gy) * (a2.u - gx)) * inv_area;
          const double w1 = ((a2.u - gx) * (a0.v - gy) - (a2.v - gy) * (a0.u - gx)) * inv_area;
          const double w2 = 1.0 - w0 - w1;
          if (w0 < 0.0 || w1 < 0.0 || w2 < 0.0) continue;

          const double iz = w0 * a0.inv_z + w1 * a1.inv_z + w2 * a2.inv_z;
          const double z_frag = 1.0 / std::max(iz, 1e-30);
          if (z_frag < near_p || z_frag > far_p) continue;

          const size_t idx = static_cast<size_t>(py) * W + px;
          if (z_frag >= depth_buf[idx]) continue;
          depth_buf[idx] = z_frag;

          // perspective-correct varying interpolation
          const double c0 = w0 * a0.inv_z / iz, c1 = w1 * a1.inv_z / iz,
                       c2 = w2 * a2.inv_z / iz;
          Vec3 n = c0 * a0.n + c1 * a1.n + c2 * a2.n;
          Vec3 l = c0 * a0.l + c1 * a1.l + c2 * a2.l;
          Vec3 view = c0 * a0.view + c1 * a1.view + c2 * a2.view;
          Vec3 col = c0 * a0.color + c1 * a1.color + c2 * a2.color;

          Vec3 rgb = shade_pixel(n, l, view, col, ambient, diffuse, specular);
          out_bgr[3 * idx + 0] = static_cast<uint8_t>(std::lround(rgb.z * 255.0));
          out_bgr[3 * idx + 1] = static_cast<uint8_t>(std::lround(rgb.y * 255.0));
          out_bgr[3 * idx + 2] = static_cast<uint8_t>(std::lround(rgb.x * 255.0));
        }
      }
    }
  }

  for (size_t i = 0; i < static_cast<size_t>(W) * H; ++i) {
    out_depth[i] = depth_buf[i] > 1e299 ? 0.0f : static_cast<float>(depth_buf[i]);
  }
  return 0;
}

}  // extern "C"
