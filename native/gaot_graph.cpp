// gaot_graph: native host-side stencil graph builder for gaot3d_tpu.
//
// Role: the CPU twin of ops/grid_graph.py's stencil search, for the
// precompute / async-collate workflows (reference counterpart: torch-cluster's
// native radius/knn kernels, which the reference calls from its collate
// functions and its update_pt_files_with_edges precompute pass,
// src/data/collate_functions.py + src/trainer/stat.py:257-272). The
// vectorized-numpy twin (build_edge_slots_np) materializes [N, K] coordinate
// and distance arrays and takes ~26s for a 500K-node DrivAerNet sample on the
// one-core host — 43 hours for the 5817-sample precompute sweep. This builder
// walks the stencil window per point with per-axis partial distances in
// registers and emits (optionally budget-compacted) slots directly:
// ~60x faster single-threaded, and it threads.
//
// Semantics mirror build_edge_slots_np exactly:
//   base_a = clamp(floor((p_a - lo_a)/h_a) - (w_a/2 - 1), 0, max(dim_a-w_a,0))
//   candidate cell (i0,i1,i2) in the w0 x w1 x w2 window; linear id
//   ((i0*dims1)+i1)*dims2+i2; radius mask d2 <= r^2; knn mask marks the
//   k_neighbors smallest-d2 candidates; bidirectional ORs both.
// With budget > 0 the valid slots are packed to the row front IN WINDOW ORDER
// (the same stable order compact_slots produces); overflow beyond the budget
// is dropped (caller validates budget >= max degree, as the trainer does).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -o libgaot_graph.so
//        gaot_graph.cpp -lpthread
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct GridSpec {
  float lo[3];
  float h[3];
  int64_t dims[3];
};

inline int64_t base_index(float p, float lo, float h, int64_t dim, int w) {
  int64_t f = (h == 0.0f) ? 0 : (int64_t)std::floor((p - lo) / h);
  int64_t b = f - (w / 2 - 1);
  int64_t hi = dim - w > 0 ? dim - w : 0;
  if (b < 0) b = 0;
  if (b > hi) b = hi;
  return b;
}

void build_range(const float* pts, int64_t begin, int64_t end, GridSpec g,
                 float radius, int k_neighbors, int flags, int w0, int w1,
                 int w2, int budget, int32_t* out_idx, uint8_t* out_mask,
                 int out_k) {
  const int K = w0 * w1 * w2;
  const bool want_radius = flags & 1;
  const bool want_knn = flags & 2;
  const float r2 = radius * radius;
  std::vector<float> d2s(K);
  std::vector<int32_t> ids(K);
  std::vector<uint8_t> m(K);
  std::vector<float> dd0(w0), dd1(w1), dd2(w2);

  for (int64_t p = begin; p < end; ++p) {
    const float* xyz = pts + 3 * p;
    int64_t b0 = base_index(xyz[0], g.lo[0], g.h[0], g.dims[0], w0);
    int64_t b1 = base_index(xyz[1], g.lo[1], g.h[1], g.dims[1], w1);
    int64_t b2 = base_index(xyz[2], g.lo[2], g.h[2], g.dims[2], w2);
    for (int i = 0; i < w0; ++i) {
      float c = g.lo[0] + (float)(b0 + i) * g.h[0] - xyz[0];
      dd0[i] = c * c;
    }
    for (int i = 0; i < w1; ++i) {
      float c = g.lo[1] + (float)(b1 + i) * g.h[1] - xyz[1];
      dd1[i] = c * c;
    }
    for (int i = 0; i < w2; ++i) {
      float c = g.lo[2] + (float)(b2 + i) * g.h[2] - xyz[2];
      dd2[i] = c * c;
    }
    int s = 0;
    for (int i0 = 0; i0 < w0; ++i0) {
      int64_t row0 = (b0 + i0) * g.dims[1];
      float a0 = dd0[i0];
      for (int i1 = 0; i1 < w1; ++i1) {
        int64_t row1 = (row0 + b1 + i1) * g.dims[2];
        float a01 = a0 + dd1[i1];
        for (int i2 = 0; i2 < w2; ++i2, ++s) {
          float d2 = a01 + dd2[i2];
          d2s[s] = d2;
          ids[s] = (int32_t)(row1 + b2 + i2);
          m[s] = (uint8_t)(want_radius && d2 <= r2);
        }
      }
    }
    if (want_knn) {
      int kk = k_neighbors < K ? k_neighbors : K;
      // partial selection of the kk smallest d2 (K <= a few hundred; kk tiny)
      for (int sel = 0; sel < kk; ++sel) {
        int best = -1;
        float bd = 1e30f;
        for (int s2 = 0; s2 < K; ++s2) {
          if (m[s2] == 2) continue;  // already chosen by knn
          float v = d2s[s2];
          if (v < bd) {
            bd = v;
            best = s2;
          }
        }
        if (best >= 0) m[best] = 2;  // tag; resolved to valid below
      }
      for (int s2 = 0; s2 < K; ++s2)
        if (m[s2] == 2) m[s2] = 1;
    }
    int32_t* oid = out_idx + (int64_t)out_k * p;
    uint8_t* oms = out_mask + (int64_t)out_k * p;
    if (budget > 0) {
      int o = 0;
      for (int s2 = 0; s2 < K && o < out_k; ++s2) {
        if (m[s2]) {
          oid[o] = ids[s2];
          oms[o] = 1;
          ++o;
        }
      }
      for (; o < out_k; ++o) {
        oid[o] = 0;
        oms[o] = 0;
      }
    } else {
      std::memcpy(oid, ids.data(), sizeof(int32_t) * K);
      std::memcpy(oms, m.data(), K);
    }
  }
}

void flatten_range(const int32_t* lat_idx, const uint8_t* mask, int k,
                   int64_t chunk, int64_t c_begin, int64_t c_end, int64_t E,
                   int order_dst, int32_t* src, int32_t* dst, uint8_t* out_mask,
                   int64_t* max_count) {
  std::vector<std::pair<int32_t, int32_t>> buf;  // (dst, src_local)
  buf.reserve((size_t)E);
  int64_t mx = 0;
  for (int64_t c = c_begin; c < c_end; ++c) {
    buf.clear();
    const int64_t n0 = c * chunk;
    for (int64_t n = 0; n < chunk; ++n) {
      const uint8_t* mrow = mask + (n0 + n) * k;
      const int32_t* irow = lat_idx + (n0 + n) * k;
      for (int s = 0; s < k; ++s)
        if (mrow[s]) buf.emplace_back(irow[s], (int32_t)n);
    }
    int64_t cnt = (int64_t)buf.size();
    if (cnt > mx) mx = cnt;
    if (cnt > E) cnt = E;  // caller checks max_count and errors out
    if (order_dst)
      std::stable_sort(buf.begin(), buf.begin() + cnt);  // by (dst, src)
    int32_t* sr = src + c * E;
    int32_t* dr = dst + c * E;
    uint8_t* mr = out_mask + c * E;
    for (int64_t e = 0; e < cnt; ++e) {
      sr[e] = buf[(size_t)e].second;
      dr[e] = buf[(size_t)e].first;
      mr[e] = 1;
    }
    std::memset(sr + cnt, 0, sizeof(int32_t) * (size_t)(E - cnt));
    std::memset(dr + cnt, 0, sizeof(int32_t) * (size_t)(E - cnt));
    std::memset(mr + cnt, 0, (size_t)(E - cnt));
  }
  *max_count = mx;
}

}  // namespace

extern "C" {

// Compact [N, K] slots into per-chunk flat (src_local, dst, mask) lists (the
// FlatEdgeChunks layout, ops/grid_graph.py flatten_slots_host). order_dst=1
// stable-sorts each chunk's valid prefix by destination cell (flat_order
// 'dst'); 0 keeps natural (node, slot) order ('src'). Returns the max valid
// count over chunks (caller errors when it exceeds E), or -1 on bad args.
int64_t gaot_flatten_slots(const int32_t* lat_idx, const uint8_t* mask,
                           int64_t n_points, int k, int64_t chunk, int64_t E,
                           int order_dst, int32_t* src, int32_t* dst,
                           uint8_t* out_mask, int n_threads) {
  if (!lat_idx || !mask || !src || !dst || !out_mask) return -1;
  if (chunk <= 0 || n_points % chunk != 0 || E <= 0) return -1;
  const int64_t nc = n_points / chunk;
  if (nc == 0) return 0;  // empty input: nothing to write (and the thread
  // clamp below would otherwise drive `per` into a divide-by-zero SIGFPE)
  if (n_threads < 1) n_threads = 1;
  if (n_threads > nc) n_threads = (int)nc;
  std::vector<int64_t> maxes((size_t)n_threads, 0);
  if (n_threads == 1) {
    flatten_range(lat_idx, mask, k, chunk, 0, nc, E, order_dst, src, dst,
                  out_mask, &maxes[0]);
  } else {
    std::vector<std::thread> ts;
    int64_t per = (nc + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      int64_t b = t * per;
      int64_t e = std::min<int64_t>(b + per, nc);
      if (b >= e) break;
      ts.emplace_back(flatten_range, lat_idx, mask, k, chunk, b, e, E,
                      order_dst, src, dst, out_mask, &maxes[(size_t)t]);
    }
    for (auto& th : ts) th.join();
  }
  int64_t mx = 0;
  for (int64_t v : maxes) mx = std::max(mx, v);
  return mx;
}

// Returns 0 on success. out_k must be (budget > 0 ? budget : w0*w1*w2).
int gaot_build_slots(const float* pts, int64_t n_points, const float* lo,
                     const float* spacing, const int64_t* dims, float radius,
                     int k_neighbors, int flags, int w0, int w1, int w2,
                     int budget, int32_t* out_idx, uint8_t* out_mask,
                     int out_k, int n_threads) {
  if (!pts || !out_idx || !out_mask || n_points < 0) return 1;
  GridSpec g;
  for (int a = 0; a < 3; ++a) {
    g.lo[a] = lo[a];
    g.h[a] = spacing[a];
    g.dims[a] = dims[a];
  }
  int expect_k = budget > 0 ? budget : w0 * w1 * w2;
  if (out_k != expect_k) return 2;
  if (n_threads < 1) n_threads = 1;
  if (n_threads == 1 || n_points < 4096) {
    build_range(pts, 0, n_points, g, radius, k_neighbors, flags, w0, w1, w2,
                budget, out_idx, out_mask, out_k);
    return 0;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n_points + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t b = t * chunk;
    int64_t e = std::min<int64_t>(b + chunk, n_points);
    if (b >= e) break;
    ts.emplace_back(build_range, pts, b, e, g, radius, k_neighbors, flags, w0,
                    w1, w2, budget, out_idx, out_mask, out_k);
  }
  for (auto& th : ts) th.join();
  return 0;
}

}  // extern "C"
