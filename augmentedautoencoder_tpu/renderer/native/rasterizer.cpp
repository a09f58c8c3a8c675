// Native software rasterizer — the hot backend of the offline render stage.
//
// Mirrors raster_numpy.py exactly (which in turn mirrors the reference GL
// pipeline: auto_pose/meshrenderer/meshrenderer_phong.py + depth_shader_phong
// shaders + gl_utils/camera.py realCamera):
//   * OpenCV pinhole projection, z-buffer on eye-space z, near/far clip
//   * per-fragment Phong (positional light in GL-eye coords, no shininess
//     exponent), perspective-correct varyings
//   * outputs BGR uint8 + eye-space z depth float32, background zero
//
// Performance design (the offline 92k-view codebook render is wall-clock
// bound on this stage):
//   * geometry/depth in double (keeps numpy-backend agreement to rtol 1e-5),
//     shading varyings and Phong math in float (the per-pixel hot path)
//   * incremental edge functions: 3 adds per pixel instead of 6 mul + 6 sub
//   * all frame-sized work (depth clear, depth writeback) restricted to the
//     object's projected screen bbox; output buffers arrive pre-zeroed from
//     numpy (np.zeros), so no full-frame clears happen per render
//   * persistent per-thread depth buffer — no per-call allocation
//
// Parallelism: threads own horizontal bands of the image; every thread scans
// all triangles and rasterizes the band intersection (no locks, no atomics).
//
// C ABI only — bound from Python with ctypes (no pybind11 in this image).
// CONTRACT: out_bgr / out_depth must be zero-initialized by the caller.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

#if defined(__SSE__) || defined(__x86_64__)
#include <immintrin.h>
#define AAE_HAVE_SSE 1
#endif

// 8-wide double span tests + 16-wide float deferred shading (compiled when
// the build host has AVX-512; binding.py builds with -march=native).
#if defined(__AVX512F__) && defined(__AVX512VL__)
#define AAE_AVX512 1
#endif

namespace {

// fast reciprocal square root: hardware estimate + one Newton-Raphson step
// (~22 significant bits — far below the 1/255 color quantum the shading
// output is rounded to)
inline float rsqrt_fast(float x) {
#if defined(AAE_HAVE_SSE)
  float r = _mm_cvtss_f32(_mm_rsqrt_ss(_mm_set_ss(x)));
  return r * (1.5f - 0.5f * x * r * r);
#else
  return 1.0f / std::sqrt(x);
#endif
}

struct Mesh {
  std::vector<double> verts;    // 3V
  std::vector<double> normals;  // 3V
  std::vector<float> colors;    // 3V in [0,1]
  std::vector<int32_t> faces;   // 3F
  int n_verts = 0;
  int n_faces = 0;
  // backface culling is output-identical ONLY for closed, consistently
  // wound meshes (every backface hides behind a frontface on every ray).
  // Detected once at register time; cull_sign is the screen-space signed-
  // area sign of front-facing triangles (+1/-1), 0 = don't cull.
  int cull_sign = 0;
};

// Closed + consistently wound <=> every directed edge (a,b) is matched by
// exactly one twin (b,a). Returns true iff that holds.
bool mesh_is_closed_manifold(const std::vector<int32_t>& faces, int n_faces,
                             int n_verts) {
  std::vector<std::pair<uint64_t, int>> edges;
  edges.reserve(static_cast<size_t>(n_faces) * 3);
  for (int fi = 0; fi < n_faces; ++fi) {
    const int32_t* f = &faces[3 * fi];
    for (int e = 0; e < 3; ++e) {
      const uint64_t a = static_cast<uint32_t>(f[e]);
      const uint64_t b = static_cast<uint32_t>(f[(e + 1) % 3]);
      const uint64_t lo = std::min(a, b), hi = std::max(a, b);
      edges.push_back({(lo << 32) | hi, a < b ? +1 : -1});
    }
  }
  std::sort(edges.begin(), edges.end());
  for (size_t i = 0; i < edges.size();) {
    size_t j = i;
    int sum = 0;
    while (j < edges.size() && edges[j].first == edges[i].first) {
      sum += edges[j].second;
      ++j;
    }
    // exactly two half-edges in opposite directions
    if (j - i != 2 || sum != 0) return false;
    i = j;
  }
  return true;
}

// For a consistently wound mesh, decide which winding is "outward" by
// majority vote of geometric vs vertex normals.
int detect_front_winding(const Mesh& m) {
  double vote = 0.0;
  for (int fi = 0; fi < m.n_faces; ++fi) {
    const int32_t* f = &m.faces[3 * fi];
    const double* p0 = &m.verts[3 * f[0]];
    const double* p1 = &m.verts[3 * f[1]];
    const double* p2 = &m.verts[3 * f[2]];
    const double e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
    const double e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
    const double gn[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                          e1[2] * e2[0] - e1[0] * e2[2],
                          e1[0] * e2[1] - e1[1] * e2[0]};
    const double* n0 = &m.normals[3 * f[0]];
    const double* n1 = &m.normals[3 * f[1]];
    const double* n2 = &m.normals[3 * f[2]];
    vote += gn[0] * (n0[0] + n1[0] + n2[0]) + gn[1] * (n0[1] + n1[1] + n2[1]) +
            gn[2] * (n0[2] + n1[2] + n2[2]);
  }
  if (vote == 0.0) return 0;
  return vote > 0.0 ? +1 : -1;
}

std::vector<Mesh> g_meshes;

struct Vec3f {
  float x, y, z;
};

inline Vec3f operator-(Vec3f a, Vec3f b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3f operator+(Vec3f a, Vec3f b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3f operator*(float s, Vec3f a) { return {s * a.x, s * a.y, s * a.z}; }
inline float dot(Vec3f a, Vec3f b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3f normalize(Vec3f a) {
  float n2 = dot(a, a);
  float inv = n2 > 1e-24f ? rsqrt_fast(n2) : 0.0f;
  return {a.x * inv, a.y * inv, a.z * inv};
}

// Per-vertex eye-space attributes (shader varyings).
struct VertexAttr {
  double u, v;       // pixel coords
  double z;          // eye-space z (OpenCV convention, >0 in front)
  double inv_z;
  Vec3f n, l, view;  // GL-eye normal, to-light, to-eye (float: shading only)
  Vec3f color;
  bool valid;
};

inline Vec3f shade_pixel(Vec3f n, Vec3f l, Vec3f view, Vec3f color, float ambient,
                         float diffuse, float specular) {
  Vec3f N = normalize(n), L = normalize(l), V = normalize(view);
  float ndotl = std::max(dot(N, L), 0.0f);
  Vec3f refl = (2.0f * dot(N, L)) * N - L;
  float rdotv = std::max(dot(refl, V), 0.0f);
  float w = ambient + diffuse * ndotl + specular * rdotv;
  Vec3f rgb = {w * color.x, w * color.y, w * color.z};
  rgb.x = std::min(std::max(rgb.x, 0.0f), 1.0f);
  rgb.y = std::min(std::max(rgb.y, 0.0f), 1.0f);
  rgb.z = std::min(std::max(rgb.z, 0.0f), 1.0f);
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
    for (int i = 0; i < 3 * n_vertices; ++i)
      m.colors[i] = static_cast<float>(colors[i] / 255.0);
  } else {
    std::fill(m.colors.begin(), m.colors.end(), 160.0f / 255.0f);
  }
  m.faces.assign(faces, faces + 3 * n_faces);
  if (mesh_is_closed_manifold(m.faces, n_faces, n_vertices)) {
    m.cull_sign = detect_front_winding(m);
  }
  g_meshes.push_back(std::move(m));
  return static_cast<int>(g_meshes.size()) - 1;
}

void aae_mesh_clear() { g_meshes.clear(); }

// Render mesh `mesh_id`; out_bgr is H*W*3 uint8, out_depth H*W float32 —
// both MUST be zero-initialized by the caller (numpy allocates with zeros).
// K, R row-major 3x3; t 3; light_pos 3 (GL-eye coords as in the reference).
// out_px_bbox (4 int32, may be null): [min_x, min_y, max_x, max_y] of the
// depth>0 pixels, or all -1 when nothing is visible — saves the caller a
// full-frame nonzero scan for bbox extraction.
int aae_render(int mesh_id, int W, int H, const double* K, const double* R,
               const double* t, double near_p, double far_p,
               const double* light_pos, double ambient, double diffuse,
               double specular, uint8_t* out_bgr, float* out_depth,
               int32_t* out_px_bbox) {
  if (out_px_bbox) {
    out_px_bbox[0] = out_px_bbox[1] = out_px_bbox[2] = out_px_bbox[3] = -1;
  }
  if (mesh_id < 0 || mesh_id >= static_cast<int>(g_meshes.size())) return -1;
  const Mesh& m = g_meshes[mesh_id];

  const float amb = static_cast<float>(ambient);
  const float dif = static_cast<float>(diffuse);
  const float spec = static_cast<float>(specular);

  // persistent depth buffer: only the object's bbox region is (re)cleared
  static thread_local std::vector<double> depth_buf;
  if (depth_buf.size() < static_cast<size_t>(W) * H) {
    depth_buf.assign(static_cast<size_t>(W) * H, 1e300);
  }

  // ---- vertex stage (+ projected screen bbox of the whole object)
  std::vector<VertexAttr> va(m.n_verts);
  const Vec3f light = {static_cast<float>(light_pos[0]),
                       static_cast<float>(light_pos[1]),
                       static_cast<float>(light_pos[2])};
  double obj_u0 = 1e300, obj_u1 = -1e300, obj_v0 = 1e300, obj_v1 = -1e300;
#pragma omp parallel for schedule(static) \
    reduction(min : obj_u0, obj_v0) reduction(max : obj_u1, obj_v1)
  for (int i = 0; i < m.n_verts; ++i) {
    const double* p = &m.verts[3 * i];
    double x = R[0] * p[0] + R[1] * p[1] + R[2] * p[2] + t[0];
    double y = R[3] * p[0] + R[4] * p[1] + R[5] * p[2] + t[1];
    double z = R[6] * p[0] + R[7] * p[1] + R[8] * p[2] + t[2];
    VertexAttr& a = va[i];
    a.valid = z > 1e-9;
    a.z = z;
    a.inv_z = a.valid ? 1.0 / z : 0.0;
    // projection reuses inv_z instead of two more ~13-cycle f64 divisions
    // (vs the numpy backend's /z this shifts u,v by <=1 ulp — boundary-pixel
    // effects only, inside the agreement tolerances)
    a.u = a.valid ? (K[0] * x + K[1] * y) * a.inv_z + K[2] : 0.0;
    a.v = a.valid ? (K[4] * y) * a.inv_z + K[5] : 0.0;
    if (a.valid) {
      obj_u0 = std::min(obj_u0, a.u);
      obj_u1 = std::max(obj_u1, a.u);
      obj_v0 = std::min(obj_v0, a.v);
      obj_v1 = std::max(obj_v1, a.v);
    }
    const double* n = &m.normals[3 * i];
    Vec3f n_gl = {static_cast<float>(R[0] * n[0] + R[1] * n[1] + R[2] * n[2]),
                  static_cast<float>(R[3] * n[0] + R[4] * n[1] + R[5] * n[2]),
                  static_cast<float>(-(R[6] * n[0] + R[7] * n[1] + R[8] * n[2]))};
    a.n = normalize(n_gl);
    Vec3f p_gl = {static_cast<float>(x), static_cast<float>(y),
                  static_cast<float>(-z)};
    a.l = normalize(light - p_gl);
    a.view = {static_cast<float>(-x), static_cast<float>(-y),
              static_cast<float>(z)};
    a.color = {m.colors[3 * i], m.colors[3 * i + 1], m.colors[3 * i + 2]};
  }

  // object's clamped screen bbox — all frame-sized work happens inside it
  const int bb_x0 = std::max(static_cast<int>(std::floor(obj_u0 - 1.0)), 0);
  const int bb_x1 = std::min(static_cast<int>(std::ceil(obj_u1 + 1.0)), W - 1);
  const int bb_y0 = std::max(static_cast<int>(std::floor(obj_v0 - 1.0)), 0);
  const int bb_y1 = std::min(static_cast<int>(std::ceil(obj_v1 + 1.0)), H - 1);
  if (bb_x0 > bb_x1 || bb_y0 > bb_y1) return 0;  // fully off-screen

  // NB: capture the master's buffer pointer — depth_buf is thread_local and
  // must not be re-resolved inside the OpenMP region (worker threads would
  // each get their own empty instance). The buffer stores INVERSE z (a
  // max-buffer): the per-pixel division happens only after the depth test.
  double* const dbuf = depth_buf.data();
  for (int py = bb_y0; py <= bb_y1; ++py) {
    std::fill(&dbuf[static_cast<size_t>(py) * W + bb_x0],
              &dbuf[static_cast<size_t>(py) * W + bb_x1 + 1], 0.0);
  }

  // front-to-back face order: overdrawn fragments fail the depth test
  // BEFORE the (expensive) shading stage. Output-identical — the z-buffer
  // decides visibility either way, so an approximate O(n) bucket sort on
  // quantized z is enough (std::sort costs ~0.4 ms at 5k faces).
  std::vector<int32_t> face_order(m.n_faces);
  {
    constexpr int kBuckets = 256;
    std::vector<float> fz(m.n_faces);
    float z_lo = 1e30f, z_hi = -1e30f;
    for (int fi = 0; fi < m.n_faces; ++fi) {
      const int32_t* f = &m.faces[3 * fi];
      const float z = static_cast<float>(va[f[0]].z + va[f[1]].z + va[f[2]].z);
      fz[fi] = z;
      z_lo = std::min(z_lo, z);
      z_hi = std::max(z_hi, z);
    }
    const float scale =
        z_hi > z_lo ? (kBuckets - 1) / (z_hi - z_lo) : 0.0f;
    int counts[kBuckets + 1] = {0};
    std::vector<uint8_t> bucket_of(m.n_faces);
    for (int fi = 0; fi < m.n_faces; ++fi) {
      const int b = static_cast<int>((fz[fi] - z_lo) * scale);
      bucket_of[fi] = static_cast<uint8_t>(b);
      ++counts[b + 1];
    }
    for (int b = 0; b < kBuckets; ++b) counts[b + 1] += counts[b];
    for (int fi = 0; fi < m.n_faces; ++fi) {
      face_order[counts[bucket_of[fi]]++] = fi;
    }
  }

  // ---- raster stage: each thread owns a band of rows
  const double inv_near = 1.0 / std::max(near_p, 1e-30);
  const double inv_far = 1.0 / std::max(far_p, 1e-30);
  const double cull_sign = static_cast<double>(m.cull_sign);
#pragma omp parallel
  {
#if defined(_OPENMP)
    const int tid = omp_get_thread_num();
    const int nthreads = omp_get_num_threads();
#else
    const int tid = 0;
    const int nthreads = 1;
#endif
    const int rows = bb_y1 - bb_y0 + 1;
    const int band_y0 = bb_y0 + static_cast<int>(static_cast<int64_t>(rows) * tid / nthreads);
    const int band_y1 = bb_y0 + static_cast<int>(static_cast<int64_t>(rows) * (tid + 1) / nthreads) - 1;

#if defined(AAE_AVX512)
    // Deferred shading: the span loop interpolates the 12 shading varyings
    // inline (the three vertex attribute sets are register/L1-hot right
    // after the coverage test — re-fetching them in a later pass costs more
    // than the interpolation itself) and appends them to SoA arrays; the
    // latency-chained part of Phong (three normalizes + dots + byte
    // conversion) runs afterwards 16-wide across survivors, where vector
    // ILP breaks the rsqrt dependency chains. Shading survivors in record
    // order reproduces immediate-mode output exactly (later faces
    // overwrite, as the scalar path's in-place writes do). Per-thread
    // buffers: bands are disjoint pixel sets. NB: with ~4 px triangles,
    // per-face SIMD cannot win — vectorizing ACROSS survivors is what pays.
    static thread_local std::vector<int32_t> sv_idx;
    static thread_local std::vector<float> so[12];
    size_t sv_n = 0;
    auto sv_reserve = [&](size_t extra) {
      if (sv_n + extra > sv_idx.size()) {
        const size_t ns = std::max(sv_n + extra, sv_idx.size() * 2 + 4096);
        sv_idx.resize(ns);
        for (int q = 0; q < 12; ++q) so[q].resize(ns);
      }
    };
#endif

    for (int oi = 0; oi < m.n_faces; ++oi) {
      const int fi = face_order[oi];
      const int32_t* f = &m.faces[3 * fi];
      const VertexAttr& a0 = va[f[0]];
      const VertexAttr& a1 = va[f[1]];
      const VertexAttr& a2 = va[f[2]];
      if (!(a0.valid && a1.valid && a2.valid)) continue;

      const double area = (a1.u - a0.u) * (a2.v - a0.v) - (a1.v - a0.v) * (a2.u - a0.u);
      if (std::fabs(area) < 1e-12) continue;
      // screen area > 0 <=> winding's geometric normal points away from the
      // camera under the OpenCV projection (y-down); for closed consistently
      // wound meshes skipping those faces is output-identical (they always
      // lose the depth test to a front face). cull_sign==0 disables.
      if (area * cull_sign > 0.0) continue;
      const double inv_area = 1.0 / area;

      int x_min = std::max(static_cast<int>(std::floor(std::min({a0.u, a1.u, a2.u}) - 0.5)), 0);
      int x_max = std::min(static_cast<int>(std::ceil(std::max({a0.u, a1.u, a2.u}) - 0.5)), W - 1);
      int y_min = std::max(static_cast<int>(std::floor(std::min({a0.v, a1.v, a2.v}) - 0.5)), band_y0);
      int y_max = std::min(static_cast<int>(std::ceil(std::max({a0.v, a1.v, a2.v}) - 0.5)), band_y1);
      if (x_min > x_max || y_min > y_max) continue;

      // barycentric weights are affine in pixel coords: evaluate at the
      // corner once, then step. w0(gx,gy) = (A0 + B0*gx + C0*gy) * inv_area
      // with the same algebra as the direct products (expanded form).
      const double B0 = (a2.v - a1.v) * inv_area;   // d w0 / d gx * -1 sign fold
      const double C0 = (a1.u - a2.u) * inv_area;
      const double A0 = (a1.v * a2.u - a1.u * a2.v) * inv_area;
      const double B1 = (a0.v - a2.v) * inv_area;
      const double C1 = (a2.u - a0.u) * inv_area;
      const double A1 = (a2.v * a0.u - a2.u * a0.v) * inv_area;

#if defined(AAE_AVX512)
      const double gx0 = x_min + 0.5;
      for (int py = y_min; py <= y_max; ++py) {
        const double gy = py + 0.5;
        double w0 = -A0 - B0 * gx0 - C0 * gy;
        double w1 = -A1 - B1 * gx0 - C1 * gy;
        const size_t row = static_cast<size_t>(py) * W;
        sv_reserve(static_cast<size_t>(x_max - x_min) + 1);
        // row coverage is an interval (each w is a monotone sequence under
        // the incremental update, so crosses 0 at most once): after the
        // first covered pixel, the first rejection ends the row.
        // (An analytic per-row interval-entry variant was measured SLOWER:
        // the 3 reciprocals/face + branchy bound math cost more than the
        // ~7x slot overscan it avoids at these ~4 px triangle sizes.)
        bool entered = false;
        for (int px = x_min; px <= x_max; ++px, w0 -= B0, w1 -= B1) {
          const double w2 = 1.0 - w0 - w1;
          if (w0 < 0.0 || w1 < 0.0 || w2 < 0.0) {
            if (entered) break;
            continue;
          }
          entered = true;
          const double iz = w0 * a0.inv_z + w1 * a1.inv_z + w2 * a2.inv_z;
          const size_t idx = row + px;
          if (iz <= dbuf[idx] || iz < inv_far || iz > inv_near) continue;
          dbuf[idx] = iz;
          const double rec = 1.0 / iz;
          const float c0 = static_cast<float>(w0 * a0.inv_z * rec);
          const float c1 = static_cast<float>(w1 * a1.inv_z * rec);
          const float c2 = static_cast<float>(w2 * a2.inv_z * rec);
          sv_idx[sv_n] = static_cast<int32_t>(idx);
          so[0][sv_n] = c0 * a0.n.x + c1 * a1.n.x + c2 * a2.n.x;
          so[1][sv_n] = c0 * a0.n.y + c1 * a1.n.y + c2 * a2.n.y;
          so[2][sv_n] = c0 * a0.n.z + c1 * a1.n.z + c2 * a2.n.z;
          so[3][sv_n] = c0 * a0.l.x + c1 * a1.l.x + c2 * a2.l.x;
          so[4][sv_n] = c0 * a0.l.y + c1 * a1.l.y + c2 * a2.l.y;
          so[5][sv_n] = c0 * a0.l.z + c1 * a1.l.z + c2 * a2.l.z;
          so[6][sv_n] = c0 * a0.view.x + c1 * a1.view.x + c2 * a2.view.x;
          so[7][sv_n] = c0 * a0.view.y + c1 * a1.view.y + c2 * a2.view.y;
          so[8][sv_n] = c0 * a0.view.z + c1 * a1.view.z + c2 * a2.view.z;
          so[9][sv_n] = c0 * a0.color.x + c1 * a1.color.x + c2 * a2.color.x;
          so[10][sv_n] = c0 * a0.color.y + c1 * a1.color.y + c2 * a2.color.y;
          so[11][sv_n] = c0 * a0.color.z + c1 * a1.color.z + c2 * a2.color.z;
          ++sv_n;
        }
      }
#else
      const double gx0 = x_min + 0.5;
      for (int py = y_min; py <= y_max; ++py) {
        const double gy = py + 0.5;
        // w0 = A0 - B0*gx - C0*gy ... verify sign by original formula:
        // orig w0 = ((a1.u-gx)(a2.v-gy) - (a1.v-gy)(a2.u-gx)) * inv_area
        //        = (a1.u*a2.v - a1.v*a2.u - gx*(a2.v-a1.v) - gy*(a1.u-a2.u)) * ia
        double w0 = -A0 - B0 * gx0 - C0 * gy;
        double w1 = -A1 - B1 * gx0 - C1 * gy;
        const size_t row = static_cast<size_t>(py) * W;
        // row coverage is an interval (each w is a monotone sequence under
        // the incremental update): first rejection after entry ends the row
        bool entered = false;
        for (int px = x_min; px <= x_max; ++px, w0 -= B0, w1 -= B1) {
          const double w2 = 1.0 - w0 - w1;
          if (w0 < 0.0 || w1 < 0.0 || w2 < 0.0) {
            if (entered) break;
            continue;
          }
          entered = true;

          const double iz = w0 * a0.inv_z + w1 * a1.inv_z + w2 * a2.inv_z;
          // depth + near/far tests on inverse z — no division needed:
          // z in [near, far] <=> iz in [1/far, 1/near]; z < z_buf <=> iz > izb
          const size_t idx = row + px;
          if (iz <= dbuf[idx] || iz < inv_far || iz > inv_near) continue;
          dbuf[idx] = iz;

          // perspective-correct varying interpolation (float: shading only)
          const double rec = 1.0 / iz;
          const float c0 = static_cast<float>(w0 * a0.inv_z * rec);
          const float c1 = static_cast<float>(w1 * a1.inv_z * rec);
          const float c2 = static_cast<float>(w2 * a2.inv_z * rec);
          Vec3f n = c0 * a0.n + c1 * a1.n + c2 * a2.n;
          Vec3f l = c0 * a0.l + c1 * a1.l + c2 * a2.l;
          Vec3f view = c0 * a0.view + c1 * a1.view + c2 * a2.view;
          Vec3f col = c0 * a0.color + c1 * a1.color + c2 * a2.color;

          Vec3f rgb = shade_pixel(n, l, view, col, amb, dif, spec);
          out_bgr[3 * idx + 0] = static_cast<uint8_t>(std::lround(rgb.z * 255.0f));
          out_bgr[3 * idx + 1] = static_cast<uint8_t>(std::lround(rgb.y * 255.0f));
          out_bgr[3 * idx + 2] = static_cast<uint8_t>(std::lround(rgb.x * 255.0f));
        }
      }
#endif
    }

#if defined(AAE_AVX512)
    // ---- deferred shading: 16 survivors per iteration — normalize N/L/V,
    // Phong, byte conversion (the vector twin of shade_pixel; rsqrt14+Newton
    // vs the scalar SSE rsqrt+Newton differ far below the 1/255 quantum)
    {
      const __m512 fzero = _mm512_setzero_ps();
      const __m512 fone = _mm512_set1_ps(1.0f);
      const __m512 fhalf = _mm512_set1_ps(0.5f);
      const __m512 f3half = _mm512_set1_ps(1.5f);
      const __m512 f255 = _mm512_set1_ps(255.0f);
      const __m512 vamb = _mm512_set1_ps(amb);
      const __m512 vdif = _mm512_set1_ps(dif);
      const __m512 vspec = _mm512_set1_ps(spec);
      const __m512 tiny = _mm512_set1_ps(1e-24f);
      auto vnormalize = [&](__m512& x, __m512& y, __m512& z) {
        const __m512 n2 = _mm512_fmadd_ps(
            x, x, _mm512_fmadd_ps(y, y, _mm512_mul_ps(z, z)));
        __m512 r = _mm512_rsqrt14_ps(n2);
        r = _mm512_mul_ps(
            r, _mm512_fnmadd_ps(_mm512_mul_ps(fhalf, n2),
                                _mm512_mul_ps(r, r), f3half));
        r = _mm512_maskz_mov_ps(_mm512_cmp_ps_mask(n2, tiny, _CMP_GT_OQ), r);
        x = _mm512_mul_ps(x, r);
        y = _mm512_mul_ps(y, r);
        z = _mm512_mul_ps(z, r);
      };

      for (size_t i = 0; i < sv_n; i += 16) {
        const size_t rem = sv_n - i;
        const __mmask16 k =
            rem >= 16 ? static_cast<__mmask16>(0xFFFF)
                      : static_cast<__mmask16>((1u << rem) - 1);
        __m512 Nx = _mm512_maskz_loadu_ps(k, &so[0][i]);
        __m512 Ny = _mm512_maskz_loadu_ps(k, &so[1][i]);
        __m512 Nz = _mm512_maskz_loadu_ps(k, &so[2][i]);
        __m512 Lx = _mm512_maskz_loadu_ps(k, &so[3][i]);
        __m512 Ly = _mm512_maskz_loadu_ps(k, &so[4][i]);
        __m512 Lz = _mm512_maskz_loadu_ps(k, &so[5][i]);
        __m512 Vx = _mm512_maskz_loadu_ps(k, &so[6][i]);
        __m512 Vy = _mm512_maskz_loadu_ps(k, &so[7][i]);
        __m512 Vz = _mm512_maskz_loadu_ps(k, &so[8][i]);
        const __m512 colr = _mm512_maskz_loadu_ps(k, &so[9][i]);
        const __m512 colg = _mm512_maskz_loadu_ps(k, &so[10][i]);
        const __m512 colb = _mm512_maskz_loadu_ps(k, &so[11][i]);
        vnormalize(Nx, Ny, Nz);
        vnormalize(Lx, Ly, Lz);
        vnormalize(Vx, Vy, Vz);
        const __m512 ndl_raw = _mm512_fmadd_ps(
            Nx, Lx, _mm512_fmadd_ps(Ny, Ly, _mm512_mul_ps(Nz, Lz)));
        const __m512 ndl = _mm512_max_ps(ndl_raw, fzero);
        const __m512 two_ndl = _mm512_add_ps(ndl_raw, ndl_raw);
        const __m512 Rx = _mm512_fmsub_ps(two_ndl, Nx, Lx);
        const __m512 Ry = _mm512_fmsub_ps(two_ndl, Ny, Ly);
        const __m512 Rz = _mm512_fmsub_ps(two_ndl, Nz, Lz);
        const __m512 rdv = _mm512_max_ps(
            _mm512_fmadd_ps(Rx, Vx,
                            _mm512_fmadd_ps(Ry, Vy, _mm512_mul_ps(Rz, Vz))),
            fzero);
        const __m512 w = _mm512_fmadd_ps(
            vspec, rdv, _mm512_fmadd_ps(vdif, ndl, vamb));
        auto to_byte = [&](__m512 col) {
          const __m512 c = _mm512_min_ps(
              _mm512_max_ps(_mm512_mul_ps(w, col), fzero), fone);
          // lround for non-negatives == floor(x + 0.5): add then truncate
          return _mm512_cvttps_epi32(_mm512_fmadd_ps(c, f255, fhalf));
        };
        alignas(64) int32_t rr[16], gg[16], bbv[16];
        _mm512_store_si512(reinterpret_cast<__m512i*>(rr), to_byte(colr));
        _mm512_store_si512(reinterpret_cast<__m512i*>(gg), to_byte(colg));
        _mm512_store_si512(reinterpret_cast<__m512i*>(bbv), to_byte(colb));
        const size_t n_lane = rem >= 16 ? 16 : rem;
        for (size_t j = 0; j < n_lane; ++j) {
          const size_t idx = static_cast<size_t>(sv_idx[i + j]);
          out_bgr[3 * idx + 0] = static_cast<uint8_t>(bbv[j]);
          out_bgr[3 * idx + 1] = static_cast<uint8_t>(gg[j]);
          out_bgr[3 * idx + 2] = static_cast<uint8_t>(rr[j]);
        }
      }
    }
#endif
  }

  int px_x0 = W, px_x1 = -1, px_y0 = H, px_y1 = -1;
#if defined(AAE_AVX512)
  {
    const __m512d vzero = _mm512_setzero_pd();
    const __m512d vone = _mm512_set1_pd(1.0);
    for (int py = bb_y0; py <= bb_y1; ++py) {
      const size_t row = static_cast<size_t>(py) * W;
      for (int px = bb_x0; px <= bb_x1; px += 8) {
        const int rem = bb_x1 - px + 1;
        const __mmask8 inb =
            rem >= 8 ? static_cast<__mmask8>(0xFF)
                     : static_cast<__mmask8>((1u << rem) - 1);
        const __m512d izb = _mm512_maskz_loadu_pd(inb, &dbuf[row + px]);
        const __mmask8 vis =
            inb & _mm512_cmp_pd_mask(izb, vzero, _CMP_GT_OQ);
        if (!vis) continue;
        const __m512d z = _mm512_maskz_div_pd(vis, vone, izb);
        _mm256_mask_storeu_ps(&out_depth[row + px], vis,
                              _mm512_cvtpd_ps(z));
        px_x0 = std::min(px_x0, px + __builtin_ctz(vis));
        px_x1 = std::max(px_x1, px + 31 - __builtin_clz(vis));
        px_y0 = std::min(px_y0, py);
        px_y1 = std::max(px_y1, py);
      }
    }
  }
#else
  for (int py = bb_y0; py <= bb_y1; ++py) {
    const size_t row = static_cast<size_t>(py) * W;
    for (int px = bb_x0; px <= bb_x1; ++px) {
      const double izb = dbuf[row + px];
      if (izb > 0.0) {
        out_depth[row + px] = static_cast<float>(1.0 / izb);
        px_x0 = std::min(px_x0, px);
        px_x1 = std::max(px_x1, px);
        px_y0 = std::min(px_y0, py);
        px_y1 = std::max(px_y1, py);
      }
    }
  }
#endif
  if (out_px_bbox && px_x1 >= 0) {
    out_px_bbox[0] = px_x0;
    out_px_bbox[1] = px_y0;
    out_px_bbox[2] = px_x1;
    out_px_bbox[3] = px_y1;
  }
  return 0;
}

}  // extern "C"
