// mesh_recon.cpp — native depth→mesh builder.
//
// C++ implementation of materialist_tpu/geometry/mesh_recon.py::
// depth_to_mesh (itself the rebuild of the reference's
// myutils/mesh_recon.py:41-331 Python triple loops): occlusion-boundary
// detection by triangle-vs-view-ray angle, background-depth propagation
// along refer chains, and 2-triangles-per-quad triangulation with
// duplicated fallback vertices at depth discontinuities. Scalar loops are
// the natural shape for this host-side preprocessing; the Python wrapper
// (geometry/mesh_recon.py) dispatches here via ctypes when the shared
// library is available and falls back to the vectorized numpy path.
//
// ABI (all C, caller allocates nothing; results returned via an opaque
// handle that the caller frees):
//   mesh_build(depth, h, w, fx, fy, cx, cy, min_angle_deg) -> handle
//   mesh_counts(handle, &n_verts, &n_faces, &n_boundary)
//   mesh_copy(handle, verts_out, faces_out, boundary_out)
//   mesh_free(handle)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  double x, y, z;
};

inline V3 sub(const V3& a, const V3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double dot(const V3& a, const V3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline double norm(const V3& a) { return std::sqrt(dot(a, a)); }

// angle (deg) between triangle normal and the view ray through its center
// (mesh_recon.py:43-52; reference myutils/mesh_recon.py:126-134)
double tri_view_angle(const V3& p0, const V3& p1, const V3& p2) {
  V3 n = cross(sub(p0, p1), sub(p0, p2));
  V3 c = {(p0.x + p1.x + p2.x) / 3.0, (p0.y + p1.y + p2.y) / 3.0,
          (p0.z + p1.z + p2.z) / 3.0};
  double denom = norm(n) * norm(c);
  if (denom < 1e-12) denom = 1e-12;
  double s = std::fabs(dot(n, c)) / denom;
  if (s > 1.0) s = 1.0;
  if (s < 0.0) s = 0.0;
  return std::asin(s) * 180.0 / M_PI;
}

struct Mesh {
  std::vector<float> verts;      // 3*n
  std::vector<int32_t> faces;    // 3*m
  std::vector<float> boundary;   // 3*b
};

}  // namespace

extern "C" {

int materialist_native_abi_version() { return 2; }

void* mesh_build(const float* depth_in, int h, int w, double fx, double fy,
                 double cx, double cy, double min_angle) {
  const int64_t n = (int64_t)h * w;
  std::vector<double> depth(depth_in, depth_in + n);

  auto unproject = [&](int i, int j, double d) -> V3 {
    return {(j - cx) / fx * d, (i - cy) / fy * d, d};
  };
  auto at = [&](int i, int j) -> double { return depth[(int64_t)i * w + j]; };

  // ---- boundary detection: 4 fan triangles per interior pixel
  std::vector<int64_t> refer(n);
  for (int64_t k = 0; k < n; ++k) refer[k] = k;
  std::vector<uint8_t> is_boundary(n, 0);
  // fan quadrants [center, below, right, above, left]:
  // (below,right) (right,above) (above,left) (left,below) with the
  // i-offset neighbor listed first (mesh_recon.py:87-90)
  // quadrant q uses neighbors fan[q] and fan[q+1] of
  // below(1,0) right(0,1) above(-1,0) left(0,-1)
  const int fi[5] = {1, 0, -1, 0, 1}, fj[5] = {0, 1, 0, -1, 0};

  for (int i = 1; i < h - 1; ++i) {
    for (int j = 1; j < w - 1; ++j) {
      const int64_t k = (int64_t)i * w + j;
      const double dc = at(i, j);
      const V3 pc = unproject(i, j, dc);
      double best_ref_d = -1e300;
      for (int q = 0; q < 4; ++q) {
        const int ai = i + fi[q], aj = j + fj[q];
        const int bi = i + fi[q + 1], bj = j + fj[q + 1];
        const double da = at(ai, aj), db = at(bi, bj);
        const V3 pa = unproject(ai, aj, da);
        const V3 pb = unproject(bi, bj, db);
        const double ang = tri_view_angle(pc, pa, pb);
        const bool graz = ang < min_angle;
        const bool step = graz && (dc < da || dc < db);
        if (step) {
          is_boundary[k] = 1;
          const bool use_a = da > db;
          const double cand_d = use_a ? da : db;
          if (cand_d > best_ref_d) {
            best_ref_d = cand_d;
            refer[k] = use_a ? (int64_t)ai * w + aj : (int64_t)bi * w + bj;
          }
        }
      }
    }
  }

  Mesh* m = new Mesh();
  for (int64_t k = 0; k < n; ++k) {
    if (is_boundary[k]) {
      const int i = (int)(k / w), j = (int)(k % w);
      const V3 p = unproject(i, j, at(i, j));
      m->boundary.push_back((float)p.x);
      m->boundary.push_back((float)p.y);
      m->boundary.push_back((float)p.z);
    }
  }

  // ---- background-depth propagation: follow refer chains to the root
  // Chains are acyclic (depth strictly increases along refer links), so a
  // bound of n hops resolves any chain fully — matching the numpy path's
  // pointer jumping, which iterates to a fixed point.
  std::vector<double> new_depth(n);
  for (int64_t k = 0; k < n; ++k) {
    int64_t r = k;
    for (int64_t hops = 0; hops < n && refer[r] != r; ++hops) r = refer[r];
    new_depth[k] = depth[r];
  }

  // ---- vertices at propagated depths
  m->verts.resize(3 * n);
  for (int i = 0; i < h; ++i) {
    for (int j = 0; j < w; ++j) {
      const V3 p = unproject(i, j, new_depth[(int64_t)i * w + j]);
      const int64_t k = (int64_t)i * w + j;
      m->verts[3 * k] = (float)p.x;
      m->verts[3 * k + 1] = (float)p.y;
      m->verts[3 * k + 2] = (float)p.z;
    }
  }

  // ---- triangulation: 2 tris per quad with duplicated-vertex fallback
  std::unordered_map<int64_t, int64_t> dup;  // pixel -> extra vertex id
  auto nd = [&](int i, int j) { return new_depth[(int64_t)i * w + j]; };
  auto np_ = [&](int i, int j) { return unproject(i, j, nd(i, j)); };

  auto emit = [&](const int pi[3], const int pj[3]) {
    int64_t idx[3];
    V3 pts[3];
    double d[3];
    double dmax = 0.0;
    bool nonzero = true;
    for (int t = 0; t < 3; ++t) {
      idx[t] = (int64_t)pi[t] * w + pj[t];
      pts[t] = np_(pi[t], pj[t]);
      d[t] = nd(pi[t], pj[t]);
      if (d[t] <= 1e-12) nonzero = false;
      if (d[t] > dmax) dmax = d[t];
    }
    if (!nonzero) return;
    if (tri_view_angle(pts[0], pts[1], pts[2]) >= min_angle) {
      for (int t = 0; t < 3; ++t) m->faces.push_back((int32_t)idx[t]);
      return;
    }
    // fallback: duplicate the closest vertex at the quad's largest depth
    int closest = 0;
    for (int t = 1; t < 3; ++t)
      if (d[t] < d[closest]) closest = t;
    const int ci = pi[closest], cj = pj[closest];
    const int64_t ckey = (int64_t)ci * w + cj;
    V3 dp = unproject(ci, cj, dmax);
    int64_t new_id;
    auto it = dup.find(ckey);
    if (it != dup.end()) {
      new_id = it->second;
    } else {
      new_id = n + (int64_t)dup.size();
      dup.emplace(ckey, new_id);
      m->verts.push_back((float)dp.x);
      m->verts.push_back((float)dp.y);
      m->verts.push_back((float)dp.z);
    }
    V3 pts2[3] = {pts[0], pts[1], pts[2]};
    pts2[closest] = dp;
    if (tri_view_angle(pts2[0], pts2[1], pts2[2]) >= min_angle) {
      for (int t = 0; t < 3; ++t)
        m->faces.push_back((int32_t)(t == closest ? new_id : idx[t]));
    }
  };

  // two passes (all A triangles, then all B) to match the vectorized
  // numpy emitter's vertex-duplication order exactly
  for (int i = 0; i < h - 1; ++i) {
    for (int j = 0; j < w - 1; ++j) {
      const int a_i[3] = {i, i + 1, i}, a_j[3] = {j, j, j + 1};
      emit(a_i, a_j);
    }
  }
  for (int i = 0; i < h - 1; ++i) {
    for (int j = 0; j < w - 1; ++j) {
      const int b_i[3] = {i, i + 1, i + 1}, b_j[3] = {j + 1, j, j + 1};
      emit(b_i, b_j);
    }
  }
  return m;
}

void mesh_counts(void* handle, int64_t* n_verts, int64_t* n_faces,
                 int64_t* n_boundary) {
  Mesh* m = (Mesh*)handle;
  *n_verts = (int64_t)(m->verts.size() / 3);
  *n_faces = (int64_t)(m->faces.size() / 3);
  *n_boundary = (int64_t)(m->boundary.size() / 3);
}

void mesh_copy(void* handle, float* verts, int32_t* faces, float* boundary) {
  Mesh* m = (Mesh*)handle;
  if (verts) std::copy(m->verts.begin(), m->verts.end(), verts);
  if (faces) std::copy(m->faces.begin(), m->faces.end(), faces);
  if (boundary) std::copy(m->boundary.begin(), m->boundary.end(), boundary);
}

void mesh_free(void* handle) { delete (Mesh*)handle; }

}  // extern "C"
