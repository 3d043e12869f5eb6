// Native mesh kernels: ray-cast inside tests + exact point-triangle SDF.
//
// TPU-native framework runtime component (C++, OpenMP): geometry sampling
// is host-side preprocessing (SURVEY.md §2.1 geometry row) and the numpy
// implementation in geometry/mesh.py pays large temporaries; this kernel
// streams triangles per point in L1/L2 with no allocation. Loaded through
// ctypes (paddlescience_tpu/native/__init__.py); mesh.py falls back to
// numpy when the shared library is missing.
//
// Build: paddlescience_tpu/native/build.sh (g++ -O3 -march=native -fopenmp)

#include <cmath>
#include <cstdint>

extern "C" {

// Count ray-triangle hits along +z in a pre-rotated frame.
// tri: (F, 9) = [ax,ay,az,bx,by,bz,cx,cy,cz]; pts: (P, 3); out: (P,) hit counts.
void ray_hits_z(const double* tri, int64_t F, const double* pts, int64_t P,
                int64_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t p = 0; p < P; ++p) {
    const double px = pts[3 * p], py = pts[3 * p + 1], pz = pts[3 * p + 2];
    int64_t count = 0;
    for (int64_t f = 0; f < F; ++f) {
      const double* t = tri + 9 * f;
      const double ax = t[0], ay = t[1], az = t[2];
      const double bx = t[3], by = t[4], bz = t[5];
      const double cx = t[6], cy = t[7], cz = t[8];
      const double denom = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy);
      if (denom > -1e-12 && denom < 1e-12) continue;
      const double inv = 1.0 / denom;
      const double w1 = ((by - cy) * (px - cx) + (cx - bx) * (py - cy)) * inv;
      if (w1 < -1e-9) continue;
      const double w2 = ((cy - ay) * (px - cx) + (ax - cx) * (py - cy)) * inv;
      if (w2 < -1e-9) continue;
      const double w3 = 1.0 - w1 - w2;
      if (w3 < -1e-9) continue;
      const double zhit = w1 * az + w2 * bz + w3 * cz;
      if (zhit > pz + 1e-9) ++count;
    }
    out[p] = count;
  }
}

// Exact min point-triangle distance (Ericson's region method simplified to
// the clamped-projection used by the numpy path, kept numerically identical).
// tri as above; out: (P,) unsigned distances.
void unsigned_distance(const double* tri, int64_t F, const double* pts,
                       int64_t P, double* out) {
#pragma omp parallel for schedule(static)
  for (int64_t p = 0; p < P; ++p) {
    const double px = pts[3 * p], py = pts[3 * p + 1], pz = pts[3 * p + 2];
    double best = 1e300;
    for (int64_t f = 0; f < F; ++f) {
      const double* t = tri + 9 * f;
      const double v0x = t[0], v0y = t[1], v0z = t[2];
      const double e1x = t[3] - v0x, e1y = t[4] - v0y, e1z = t[5] - v0z;
      const double e2x = t[6] - v0x, e2y = t[7] - v0y, e2z = t[8] - v0z;
      const double a = e1x * e1x + e1y * e1y + e1z * e1z;
      const double b = e1x * e2x + e1y * e2y + e1z * e2z;
      const double c = e2x * e2x + e2y * e2y + e2z * e2z;
      double det = a * c - b * b;
      if (det <= 0) det = 1e-30;
      const double dx = v0x - px, dy = v0y - py, dz = v0z - pz;
      const double d_ = dx * e1x + dy * e1y + dz * e1z;
      const double e_ = dx * e2x + dy * e2y + dz * e2z;
      double s = (b * e_ - c * d_) / det;
      double tt = (b * d_ - a * e_) / det;
      s = s < 0 ? 0 : (s > 1 ? 1 : s);
      tt = tt < 0 ? 0 : (tt > 1 ? 1 : tt);
      const double sum = s + tt;
      if (sum > 1) {
        s /= sum;
        tt /= sum;
      }
      const double dd = dx * dx + dy * dy + dz * dz;
      const double dist2 = dd + 2 * s * d_ + 2 * tt * e_ + s * s * a +
                           2 * s * tt * b + tt * tt * c;
      if (dist2 < best) best = dist2;
    }
    out[p] = best > 0 ? std::sqrt(best) : 0.0;
  }
}

}  // extern "C"
