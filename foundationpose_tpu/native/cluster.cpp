// Native pose-clustering backend (host-side, runs once per object at init).
//
// TPU-native counterpart of the reference's C++ component
// mycpp/src/app/pybind_api.cpp:24-68 (greedy symmetric-geodesic pose dedup),
// exposed through a plain C ABI consumed via ctypes (no pybind11 in this
// environment). Identical greedy semantics: scan poses in input order; drop a
// pose iff some already-kept pose is within dist_diff in translation AND
// within angle_diff geodesic rotation for at least one right-applied symmetry
// transform.

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// 4x4 row-major pose helpers.
inline double rot_trace_mult(const double* A, const double* B) {
  // trace(Ra * Rb^T) for the upper-left 3x3 blocks of two 4x4 row-major mats.
  double tr = 0.0;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) tr += A[i * 4 + j] * B[i * 4 + j];
  return tr;
}

inline void mat4_mult(const double* A, const double* B, double* C) {
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      double s = 0.0;
      for (int k = 0; k < 4; ++k) s += A[i * 4 + k] * B[k * 4 + j];
      C[i * 4 + j] = s;
    }
}

}  // namespace

extern "C" {

// poses: n x 16 row-major doubles; sym_tfs: s x 16; keep: n uint8 out.
// Returns number of kept poses.
int64_t fp_cluster_poses(double angle_diff_deg, double dist_diff,
                         const double* poses, int64_t n,
                         const double* sym_tfs, int64_t n_sym,
                         uint8_t* keep) {
  const double radian_thres = angle_diff_deg / 180.0 * M_PI;
  std::vector<int64_t> kept;
  kept.reserve(n);
  // Precompute pose_i * sym for the candidate side (lazily per pose).
  std::vector<double> tmp(16);
  for (int64_t i = 0; i < n; ++i) keep[i] = 0;
  if (n == 0) return 0;
  keep[0] = 1;
  kept.push_back(0);
  for (int64_t i = 1; i < n; ++i) {
    const double* cur = poses + i * 16;
    bool isnew = true;
    for (int64_t ks = 0; ks < (int64_t)kept.size() && isnew; ++ks) {
      const double* cl = poses + kept[ks] * 16;
      double dx = cl[3] - cur[3];
      double dy = cl[7] - cur[7];
      double dz = cl[11] - cur[11];
      if (std::sqrt(dx * dx + dy * dy + dz * dz) >= dist_diff) continue;
      for (int64_t s = 0; s < n_sym; ++s) {
        mat4_mult(cur, sym_tfs + s * 16, tmp.data());
        double tr = rot_trace_mult(tmp.data(), cl);
        double c = (tr - 1.0) / 2.0;
        if (c > 1.0) c = 1.0;
        if (c < -1.0) c = -1.0;
        if (std::acos(c) < radian_thres) {
          isnew = false;
          break;
        }
      }
    }
    if (isnew) {
      keep[i] = 1;
      kept.push_back(i);
    }
  }
  return (int64_t)kept.size();
}

}  // extern "C"
