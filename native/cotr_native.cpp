// cotr_native: C++ data-path kernels for the cotr_tpu framework.
//
// The reference feeds its GPU from torch DataLoader workers running the full
// geometric supervision pipeline in Python/numpy per sample
// (SURVEY.md §3.1: depth->3D->2D reprojection + occlusion check is the
// CPU-bound stage). Here those inner loops are native:
//
//   * synth_corrs — depth-consistent correspondence synthesis between two
//     RGBD captures (the hot loop of COTR/datasets/cotr_dataset.py:138-167);
//   * count_valid_depth / lift_project — building blocks exposed separately;
//   * parse_images_txt — COLMAP images.txt parsing (large ASCII files;
//     reference colmap_helper.py:117-162).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this toolchain).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Correspondence synthesis.
//
// from_depth: (h1, w1) row-major float32, >0 marks valid pixels
// inv_k_from: 3x3 row-major inverse intrinsics of the source camera
// c2w_from:   4x4 row-major camera-to-world of the source camera
// p_to:       3x4 row-major K_to @ world-to-camera of the target camera
// to_depth:   (h2, w2) float32 depth of the target camera
// out:        caller-allocated (max_out, 4) float32 [x_from, y_from, x_to, y_to]
// Returns number of correspondences written.
//
// Semantics mirror compute_corrs exactly: scan pixels row-major (np.where
// order), lift with z>0, transform to world, project with z_cam>0, crop to
// 0 <= x < w2-1 and 0 <= y < h2-1, occlusion check
// |depth_to[floor(y), floor(x)] - z_proj| < 0.5.
int64_t synth_corrs(const float* from_depth, int64_t h1, int64_t w1,
                    const double* inv_k_from, const double* c2w_from,
                    const double* p_to, const float* to_depth,
                    int64_t h2, int64_t w2, float* out, int64_t max_out) {
  int64_t n = 0;
  for (int64_t y = 0; y < h1 && n < max_out; ++y) {
    for (int64_t x = 0; x < w1 && n < max_out; ++x) {
      const float z = from_depth[y * w1 + x];
      if (z <= 0.0f) continue;
      // lift: cam = inv_K @ [x, y, 1] * z
      const double px = static_cast<double>(x);
      const double py = static_cast<double>(y);
      double cx = (inv_k_from[0] * px + inv_k_from[1] * py + inv_k_from[2]) * z;
      double cy = (inv_k_from[3] * px + inv_k_from[4] * py + inv_k_from[5]) * z;
      double cz = (inv_k_from[6] * px + inv_k_from[7] * py + inv_k_from[8]) * z;
      if (cz <= 0.0) continue;
      // world = c2w @ [cx, cy, cz, 1]
      double wx = c2w_from[0] * cx + c2w_from[1] * cy + c2w_from[2] * cz + c2w_from[3];
      double wy = c2w_from[4] * cx + c2w_from[5] * cy + c2w_from[6] * cz + c2w_from[7];
      double wz = c2w_from[8] * cx + c2w_from[9] * cy + c2w_from[10] * cz + c2w_from[11];
      double ww = c2w_from[12] * cx + c2w_from[13] * cy + c2w_from[14] * cz + c2w_from[15];
      if (ww == 0.0) continue;
      wx /= ww; wy /= ww; wz /= ww;
      // project: cam2 = P_to @ [w, 1]
      const double ix = p_to[0] * wx + p_to[1] * wy + p_to[2] * wz + p_to[3];
      const double iy = p_to[4] * wx + p_to[5] * wy + p_to[6] * wz + p_to[7];
      const double iz = p_to[8] * wx + p_to[9] * wy + p_to[10] * wz + p_to[11];
      if (iz <= 0.0) continue;
      const double ux = ix / iz;
      const double uy = iy / iz;
      if (!(ux >= 0.0 && ux < static_cast<double>(w2 - 1) &&
            uy >= 0.0 && uy < static_cast<double>(h2 - 1))) continue;
      const int64_t fx = static_cast<int64_t>(ux);
      const int64_t fy = static_cast<int64_t>(uy);
      const float zt = to_depth[fy * w2 + fx];
      if (std::fabs(static_cast<double>(zt) - iz) >= 0.5) continue;
      out[n * 4 + 0] = static_cast<float>(x);
      out[n * 4 + 1] = static_cast<float>(y);
      out[n * 4 + 2] = static_cast<float>(ux);
      out[n * 4 + 3] = static_cast<float>(uy);
      ++n;
    }
  }
  return n;
}

// ---------------------------------------------------------------------------
// COLMAP images.txt parsing. Fills caller-allocated arrays:
//   image_ids (n), camera_ids (n), qtvec (n, 7) [qw qx qy qz tx ty tz],
//   names: flat char buffer, name_len bytes per entry (zero-padded).
// Returns number of images parsed, or -1 on format error.
int64_t parse_images_txt(const char* path, int64_t max_images,
                         int64_t* image_ids, int64_t* camera_ids,
                         double* qtvec, char* names, int64_t name_len) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;
  char line[65536];
  // skip 4 header lines
  for (int i = 0; i < 4; ++i) {
    if (!std::fgets(line, sizeof(line), f)) { std::fclose(f); return -1; }
  }
  int64_t n = 0;
  while (n < max_images && std::fgets(line, sizeof(line), f)) {
    long long iid, cid;
    double qw, qx, qy, qz, tx, ty, tz;
    char name[4096];
    int got = std::sscanf(line, "%lld %lf %lf %lf %lf %lf %lf %lf %lld %4095s",
                          &iid, &qw, &qx, &qy, &qz, &tx, &ty, &tz, &cid, name);
    if (got != 10) break;  // end of data
    // skip the POINTS2D line
    if (!std::fgets(line, sizeof(line), f)) { }
    image_ids[n] = iid;
    camera_ids[n] = cid;
    double* q = qtvec + n * 7;
    q[0] = qw; q[1] = qx; q[2] = qy; q[3] = qz; q[4] = tx; q[5] = ty; q[6] = tz;
    std::strncpy(names + n * name_len, name, name_len - 1);
    names[n * name_len + name_len - 1] = '\0';
    ++n;
  }
  std::fclose(f);
  return n;
}

// Valid-depth pixel count (for pre-sizing buffers host-side).
int64_t count_valid_depth(const float* depth, int64_t h, int64_t w) {
  int64_t n = 0;
  const int64_t total = h * w;
  for (int64_t i = 0; i < total; ++i) n += depth[i] > 0.0f;
  return n;
}

// ---------------------------------------------------------------------------
// Greedy squad formation (FasterSparseEngine.form_squad, reference
// sparse_engine.py:295-337), grid-bucketed.
//
// Exact transcription of cotr_tpu.inference.grouped.form_squads: walk the
// permuted candidate order; each still-free task becomes a pilot and is
// claimed FIRST (reference sparse_engine.py:316 clears the pilot's
// bookkeeping before the window scan, so the cap can never truncate the
// pilot out of its own squad); every other free task whose loc_from AND
// loc_to fall strictly inside the pilot's SAFE_AREA windows joins
// (ascending task id, capped at max_load others). The numpy version scans
// all T tasks per pilot (O(P*T) — ~0.5 s at 10k tasks on the 1-core host);
// here candidates come from a uniform grid over loc_from with cell >= the
// window half-width, so each pilot touches only neighboring cells.
//
// lf, lt: (T, 2) float64 task positions; cfx..cty: (T,) per-task pilot patch
// centers (precomputed, clamp-aware); active: (T,) uint8; order: permuted
// candidate ids; squad_of: (T,) int64 out (-1 = unassigned); pilots: (T,)
// int64 out. Returns squad count.
int64_t form_squads(const double* lf, const double* lt,
                    const double* cfx, const double* cfy,
                    const double* ctx, const double* cty,
                    const uint8_t* active, int64_t t,
                    double half_f, double half_t,
                    const int64_t* order, int64_t n_order,
                    int64_t max_load,
                    int64_t* squad_of, int64_t* pilots) {
  for (int64_t i = 0; i < t; ++i) squad_of[i] = -1;
  std::vector<uint8_t> free_(t);
  double minx = 1e300, miny = 1e300, maxx = -1e300, maxy = -1e300;
  int64_t n_free = 0;
  for (int64_t i = 0; i < t; ++i) {
    free_[i] = active[i];
    if (!free_[i]) continue;
    minx = std::min(minx, lf[2 * i]);
    maxx = std::max(maxx, lf[2 * i]);
    miny = std::min(miny, lf[2 * i + 1]);
    maxy = std::max(maxy, lf[2 * i + 1]);
    ++n_free;
  }
  if (n_free == 0) return 0;
  // cell size: at least the window half-width (so a window spans <= 2 cell
  // boundaries per axis), never finer than span/2048 per axis (bounds the
  // grid even when half_f ~ 0 — e.g. a degenerate zero patch size — where
  // an unbounded nx*ny would overflow; members then reduce to forced
  // pilots, matching the numpy scan), and large enough to bound the grid
  // at ~4 cells per free task
  const double spanx = maxx - minx, spany = maxy - miny;
  double cell = std::max({half_f, spanx / 2048.0, spany / 2048.0, 1e-9});
  int64_t nx = static_cast<int64_t>(spanx / cell) + 1;
  int64_t ny = static_cast<int64_t>(spany / cell) + 1;
  while (nx * ny > 4 * n_free + 4) {
    cell *= 1.5;
    nx = static_cast<int64_t>(spanx / cell) + 1;
    ny = static_cast<int64_t>(spany / cell) + 1;
  }
  auto cix = [&](double x) {
    int64_t c = static_cast<int64_t>((x - minx) / cell);
    return std::max<int64_t>(0, std::min(c, nx - 1));
  };
  auto ciy = [&](double y) {
    int64_t c = static_cast<int64_t>((y - miny) / cell);
    return std::max<int64_t>(0, std::min(c, ny - 1));
  };
  // CSR buckets; ascending task id within each cell by construction
  std::vector<int64_t> start(nx * ny + 1, 0);
  for (int64_t i = 0; i < t; ++i)
    if (free_[i]) ++start[ciy(lf[2 * i + 1]) * nx + cix(lf[2 * i]) + 1];
  for (size_t b = 1; b < start.size(); ++b) start[b] += start[b - 1];
  std::vector<int64_t> ids(n_free);
  std::vector<int64_t> cursor(start.begin(), start.end() - 1);
  for (int64_t i = 0; i < t; ++i)
    if (free_[i]) ids[cursor[ciy(lf[2 * i + 1]) * nx + cix(lf[2 * i])]++] = i;

  int64_t g = 0;
  std::vector<int64_t> cand;
  cand.reserve(1024);
  for (int64_t oi = 0; oi < n_order; ++oi) {
    const int64_t pid = order[oi];
    if (!free_[pid]) continue;
    // pilot claimed before the candidate sweep (it is skipped below via
    // free_[pid] == 0); squad then holds the pilot + up to max_load others
    free_[pid] = 0;
    squad_of[pid] = g;
    const double pfx = cfx[pid], pfy = cfy[pid];
    const double ptx = ctx[pid], pty = cty[pid];
    cand.clear();
    const int64_t x0 = cix(pfx - half_f), x1 = cix(pfx + half_f);
    const int64_t y0 = ciy(pfy - half_f), y1 = ciy(pfy + half_f);
    for (int64_t cy = y0; cy <= y1; ++cy) {
      for (int64_t cx = x0; cx <= x1; ++cx) {
        const int64_t b = cy * nx + cx;
        for (int64_t k = start[b]; k < start[b + 1]; ++k) {
          const int64_t i = ids[k];
          if (!free_[i]) continue;
          if (!(std::abs(lf[2 * i] - pfx) < half_f)) continue;
          if (!(std::abs(lf[2 * i + 1] - pfy) < half_f)) continue;
          if (!(std::abs(lt[2 * i] - ptx) < half_t)) continue;
          if (!(std::abs(lt[2 * i + 1] - pty) < half_t)) continue;
          cand.push_back(i);
        }
      }
    }
    std::sort(cand.begin(), cand.end());
    const int64_t take =
        std::min<int64_t>(static_cast<int64_t>(cand.size()), max_load);
    for (int64_t k = 0; k < take; ++k) {
      squad_of[cand[k]] = g;
      free_[cand[k]] = 0;
    }
    pilots[g++] = pid;
  }
  return g;
}

}  // extern "C"
