// Native polytope geometry core.
//
// Replaces the reference's cddlib dependency (double-description method,
// used via pycddlib in `bound_planner/utils/util_functions.py:66-88`) with
// a direct 3-D implementation: vertex enumeration by intersecting all
// triples of half-space boundaries (O(m^3) with m <= ~48, exact for the
// small sets this engine produces) and LP-free redundancy removal via
// vertex activity. Exposed through a C ABI and loaded with ctypes
// (no pybind11 dependency).

#include <cmath>
#include <cstring>

namespace {

inline double det3(const double m[3][3]) {
  return m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1]) -
         m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0]) +
         m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]);
}

// Solve 3x3 system M x = rhs by Cramer's rule; returns false if singular.
inline bool solve3(const double m[3][3], const double rhs[3], double x[3],
                   double det_tol) {
  const double d = det3(m);
  if (std::fabs(d) < det_tol) return false;
  double mi[3][3];
  for (int c = 0; c < 3; ++c) {
    std::memcpy(mi, m, sizeof(mi));
    for (int r = 0; r < 3; ++r) mi[r][c] = rhs[r];
    x[c] = det3(mi) / d;
  }
  return true;
}

}  // namespace

extern "C" {

// Enumerate vertices of {x in R^3 : A x <= b}.
//   a: m x 3 row-major, b: m
//   out: cap x 3 output buffer
// Returns the number of vertices written (deduplicated), or -1 on overflow.
int bp_polytope_vertices(const double* a, const double* b, int m, double tol,
                         double* out, int cap) {
  int count = 0;
  for (int i = 0; i < m; ++i) {
    for (int j = i + 1; j < m; ++j) {
      for (int k = j + 1; k < m; ++k) {
        const double mat[3][3] = {
            {a[3 * i], a[3 * i + 1], a[3 * i + 2]},
            {a[3 * j], a[3 * j + 1], a[3 * j + 2]},
            {a[3 * k], a[3 * k + 1], a[3 * k + 2]},
        };
        const double rhs[3] = {b[i], b[j], b[k]};
        double x[3];
        if (!solve3(mat, rhs, x, 1e-10)) continue;
        // feasibility
        bool ok = true;
        for (int r = 0; r < m && ok; ++r) {
          const double v =
              a[3 * r] * x[0] + a[3 * r + 1] * x[1] + a[3 * r + 2] * x[2];
          if (v > b[r] + tol) ok = false;
        }
        if (!ok) continue;
        // dedup
        bool dup = false;
        for (int v = 0; v < count && !dup; ++v) {
          const double dx = out[3 * v] - x[0];
          const double dy = out[3 * v + 1] - x[1];
          const double dz = out[3 * v + 2] - x[2];
          if (dx * dx + dy * dy + dz * dz < 1e-16) dup = true;
        }
        if (dup) continue;
        if (count >= cap) return -1;
        out[3 * count] = x[0];
        out[3 * count + 1] = x[1];
        out[3 * count + 2] = x[2];
        ++count;
      }
    }
  }
  return count;
}

// Mark non-redundant rows of {A x <= b}: a row is kept iff it is active
// (within act_tol) at some vertex; exact duplicates keep only the first.
// Returns the number of kept rows, or -1 on vertex-buffer overflow.
int bp_reduce_ineqs(const double* a, const double* b, int m, double feas_tol,
                    double act_tol, unsigned char* keep) {
  const int cap = 2048;
  double verts[3 * cap];
  const int nv = bp_polytope_vertices(a, b, m, feas_tol, verts, cap);
  if (nv < 0) return -1;
  int kept = 0;
  for (int i = 0; i < m; ++i) {
    keep[i] = 0;
    if (nv == 0) {  // empty/degenerate polytope: keep everything
      keep[i] = 1;
      ++kept;
      continue;
    }
    for (int v = 0; v < nv; ++v) {
      const double s = a[3 * i] * verts[3 * v] + a[3 * i + 1] * verts[3 * v + 1] +
                       a[3 * i + 2] * verts[3 * v + 2];
      if (s > b[i] - act_tol) {
        keep[i] = 1;
        break;
      }
    }
    if (!keep[i]) continue;
    // drop exact duplicates of earlier kept rows
    for (int p = 0; p < i; ++p) {
      if (!keep[p]) continue;
      if (std::fabs(a[3 * p] - a[3 * i]) < 1e-12 &&
          std::fabs(a[3 * p + 1] - a[3 * i + 1]) < 1e-12 &&
          std::fabs(a[3 * p + 2] - a[3 * i + 2]) < 1e-12 &&
          std::fabs(b[p] - b[i]) < 1e-12) {
        keep[i] = 0;
        break;
      }
    }
    if (keep[i]) ++kept;
  }
  return kept;
}

}  // extern "C"
