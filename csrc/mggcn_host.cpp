// Native host-side graph preprocessing for mg_gcn_tpu.
//
// TPU-native equivalent of the reference's TBB-parallel host ops
// (matrix.hpp:340-424 normalize/transpose, dist_matrix.hpp:215-259 block
// partitioning): OpenMP-parallel C++ exposed through a plain C ABI and
// loaded from Python via ctypes (mg_gcn_tpu/native.py). numpy remains the
// always-available fallback; this library exists for papers100M-scale
// preprocessing throughput and to avoid numpy's temporary-array traffic
// (the sandbox VM first-touches memory at ~100-300 MB/s, so fewer passes
// matter more than raw FLOPs).
//
// Conventions: indptr is int64 (nnz can exceed 2^31), indices are int32,
// data is float32. All outputs are caller-allocated.

#include <atomic>
#include <algorithm>
#include <utility>
#include <vector>
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// rows[e] = row id of edge e (CSR indptr expansion).
void mggcn_expand_rows(int64_t n, const int64_t* indptr, int32_t* rows) {
#pragma omp parallel for schedule(static)
  for (int64_t v = 0; v < n; ++v) {
    for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e) rows[e] = (int32_t)v;
  }
}

// Degree-normalize edge weights.
// axis == 0: each row sums to 1 (row-stochastic).
// axis == 1: each column sums to 1 (divide by weighted in-degree) —
//            the GCN normalization (reference matrix.hpp:351-364).
// colsum_scratch must hold m doubles when axis == 1 (unused otherwise).
void mggcn_normalize(int64_t n, int64_t m, const int64_t* indptr,
                     const int32_t* indices, const float* data_in,
                     float* data_out, int axis, double* colsum_scratch) {
  if (axis == 0) {
#pragma omp parallel for schedule(dynamic, 1024)
    for (int64_t v = 0; v < n; ++v) {
      double sum = 0;
      for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e) sum += data_in[e];
      const double inv = sum != 0 ? 1.0 / sum : 0.0;
      for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e)
        data_out[e] = (float)(data_in[e] * inv);
    }
  } else {
    std::memset(colsum_scratch, 0, sizeof(double) * (size_t)m);
#pragma omp parallel
    {
#pragma omp for schedule(static)
      for (int64_t e = 0; e < indptr[n]; ++e) {
        // atomic accumulate into the column sum
        double* slot = &colsum_scratch[indices[e]];
        double val = data_in[e];
#pragma omp atomic
        *slot += val;
      }
#pragma omp for schedule(static)
      for (int64_t e = 0; e < indptr[n]; ++e) {
        const double s = colsum_scratch[indices[e]];
        data_out[e] = s != 0 ? (float)(data_in[e] / s) : 0.0f;
      }
    }
  }
}

// CSR transpose via parallel counting sort, deterministic within columns
// (matching the stable numpy fallback and the reference's transpose_par
// semantics, matrix.hpp:392-424 — ours is a fresh implementation: atomic
// slot claims followed by a per-column sort by source row, which fully
// determines the order because a (row, col) pair appears at most once).
void mggcn_transpose(int64_t n, int64_t m, int64_t nnz, const int64_t* indptr,
                     const int32_t* indices, const float* data,
                     int64_t* t_indptr, int32_t* t_indices, float* t_data) {
  std::atomic<int64_t>* counts = new std::atomic<int64_t>[m + 1];
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c <= m; ++c) counts[c].store(0, std::memory_order_relaxed);

#pragma omp parallel for schedule(static)
  for (int64_t e = 0; e < nnz; ++e)
    counts[indices[e] + 1].fetch_add(1, std::memory_order_relaxed);

  t_indptr[0] = 0;
  for (int64_t c = 1; c <= m; ++c)
    t_indptr[c] = t_indptr[c - 1] + counts[c].load(std::memory_order_relaxed);

  // second pass: claim slots per column with atomic cursors (fast but
  // thread-interleaved, so within-column order is arbitrary here)
  std::atomic<int64_t>* cursor = counts;  // reuse as per-column cursors
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c <= m; ++c) cursor[c].store(0, std::memory_order_relaxed);

#pragma omp parallel for schedule(static)
  for (int64_t v = 0; v < n; ++v) {
    for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e) {
      const int32_t c = indices[e];
      const int64_t loc =
          t_indptr[c] + cursor[c].fetch_add(1, std::memory_order_relaxed);
      t_indices[loc] = (int32_t)v;
      t_data[loc] = data[e];
    }
  }
  delete[] counts;

  // third pass: restore the deterministic (source-row ascending) order the
  // sequential counting sort would produce — float accumulation order
  // downstream must not vary run to run or native-vs-numpy
#pragma omp parallel
  {
    std::vector<std::pair<int32_t, float>> buf;
#pragma omp for schedule(dynamic, 64)
    for (int64_t c = 0; c < m; ++c) {
      const int64_t b = t_indptr[c], e = t_indptr[c + 1];
      if (e - b < 2) continue;
      buf.clear();
      for (int64_t i = b; i < e; ++i) buf.emplace_back(t_indices[i], t_data[i]);
      std::sort(buf.begin(), buf.end(),
                [](const auto& a, const auto& b2) { return a.first < b2.first; });
      for (int64_t i = b; i < e; ++i) {
        t_indices[i] = buf[i - b].first;
        t_data[i] = buf[i - b].second;
      }
    }
  }
}

// P x P communication-volume matrix for a 1-D partition (prep.py:232-272):
// vol[i*P + j] = number of distinct columns in partition j referenced by
// rows of partition i. `marks` must hold P*m bytes (caller-zeroed).
void mggcn_comm_volume(int64_t n, int64_t P, const int64_t* part,
                       const int64_t* indptr, const int32_t* indices,
                       uint8_t* marks, int64_t m, int64_t* vol) {
#pragma omp parallel for schedule(dynamic, 1)
  for (int64_t i = 0; i < P; ++i) {
    uint8_t* mark = marks + i * m;
    for (int64_t v = part[i]; v < part[i + 1]; ++v) {
      for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e) mark[indices[e]] = 1;
    }
    for (int64_t j = 0; j < P; ++j) {
      int64_t cnt = 0;
      for (int64_t c = part[j]; c < part[j + 1]; ++c) cnt += mark[c];
      vol[i * P + j] = cnt;
    }
  }
}

int mggcn_num_threads(void) {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Kernel-schedule builders (VERDICT r2 #7). The edge-tile and serial-gather
// schedule builds (ops/spmm_edges.py, ops/spmm_gather.py) are pure host
// work — a stable sort of the edge list by a tile/window group key plus a
// single-pass fill of the slot arrays. The numpy versions materialize ~15
// temporary arrays per edge batch, which on this host's ~100-300 MB/s
// first-touch memory dominates the cold bench setup (245 s for the weighted
// pair at Reddit scale). Here: a parallel STABLE counting sort (bit-
// identical to np.argsort(kind="stable") on the same keys) and fused fill
// loops; Python keeps the cheap per-group/step metadata math so the packed
// layout stays defined in exactly one place.
// ---------------------------------------------------------------------------

namespace {

// Stable parallel counting sort of `nnz` edges by key[e] in [0, bins):
// thread t histograms its contiguous input slice; the scatter offset of
// slice t / bin b is global_prefix[b] + sum of earlier slices' counts of b,
// which preserves input order within each bin (stability).
void stable_sort_by_key(int64_t nnz, const int32_t* key, int64_t bins,
                        int64_t* perm /* out, caller-allocated nnz */) {
#if defined(_OPENMP)
  int T = omp_get_max_threads();
#else
  int T = 1;
#endif
  if (T < 1) T = 1;
  std::vector<int64_t> hist((size_t)T * bins, 0);
  int64_t chunk = (nnz + T - 1) / T;
#pragma omp parallel num_threads(T)
  {
#if defined(_OPENMP)
    int t = omp_get_thread_num();
#else
    int t = 0;
#endif
    int64_t e0 = t * chunk, e1 = std::min(nnz, e0 + chunk);
    int64_t* h = hist.data() + (size_t)t * bins;
    for (int64_t e = e0; e < e1; ++e) ++h[key[e]];
  }
  // column-major exclusive prefix over (bin, thread)
  int64_t run = 0;
  for (int64_t b = 0; b < bins; ++b) {
    for (int t = 0; t < T; ++t) {
      int64_t c = hist[(size_t)t * bins + b];
      hist[(size_t)t * bins + b] = run;
      run += c;
    }
  }
#pragma omp parallel num_threads(T)
  {
#if defined(_OPENMP)
    int t = omp_get_thread_num();
#else
    int t = 0;
#endif
    int64_t e0 = t * chunk, e1 = std::min(nnz, e0 + chunk);
    int64_t* h = hist.data() + (size_t)t * bins;
    for (int64_t e = e0; e < e1; ++e) perm[h[key[e]]++] = e;
  }
}

}  // namespace

extern "C" {

// Edge-tile schedule sort: expand rows, key = (row/br)*n_sub + (col>>7),
// stable sort; emits sorted rows/cols/data (+wq when int8) and the sorted
// keys. Returns 0 on success, -1 if any key falls outside [0, n_tr*n_sub).
int mggcn_edge_sort(int64_t n_out, int64_t nnz, const int64_t* indptr,
                    const int32_t* indices, const float* data,
                    const int32_t* wq /* nullable (int8 mode) */,
                    int64_t br, int64_t n_sub, int64_t n_tr,
                    int32_t* rows_s, int32_t* cols_s, float* data_s,
                    int32_t* wq_s, int32_t* skey_s) {
  std::vector<int32_t> rows(nnz), key(nnz);
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_out; ++r) {
    for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) rows[e] = (int32_t)r;
  }
  std::atomic<int> bad{0};
#pragma omp parallel for schedule(static)
  for (int64_t e = 0; e < nnz; ++e) {
    int64_t k = (int64_t)(rows[e] / br) * n_sub + (indices[e] >> 7);
    if (k < 0 || k >= n_tr * n_sub) bad.store(1, std::memory_order_relaxed);
    key[e] = (int32_t)k;
  }
  if (bad.load()) return -1;
  std::vector<int64_t> perm(nnz);
  stable_sort_by_key(nnz, key.data(), n_tr * n_sub, perm.data());
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < nnz; ++i) {
    int64_t e = perm[i];
    rows_s[i] = rows[e];
    cols_s[i] = indices[e];
    data_s[i] = data[e];
    skey_s[i] = key[e];
    if (wq) wq_s[i] = wq[e];
  }
  return 0;
}

// Edge-tile slot fill: for chunk c (of S*CPS), slots k in [0, K) cover the
// sorted-edge range [chunk_e0[c], chunk_e1[c]); idx word = (rl*BC + cl) |
// VALID | (wq+128)<<18 in int8 mode; w gets the sorted f32 edge values.
void mggcn_edge_fill(int64_t total_chunks, int64_t K, int64_t BC, int64_t br,
                     const int64_t* chunk_e0, const int64_t* chunk_e1,
                     const int64_t* chunk_tr, const int64_t* chunk_gsub,
                     const int32_t* rows_s, const int32_t* cols_s,
                     const float* data_s, const int32_t* wq_s /* nullable */,
                     int32_t valid_bit, int32_t wq_shift, int32_t wq_bias,
                     int32_t* idx, float* w /* nullable */) {
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < total_chunks; ++c) {
    int64_t e0 = chunk_e0[c], e1 = chunk_e1[c];
    int32_t tr_base = (int32_t)(chunk_tr[c] * br);
    int32_t cw_base = (int32_t)(chunk_gsub[c] * BC);
    int32_t* out = idx + c * K;
    float* wout = w ? w + c * K : nullptr;
    int64_t live = e1 - e0;
    for (int64_t k = 0; k < K; ++k) {
      if (k < live) {
        int64_t e = e0 + k;
        int32_t rl = rows_s[e] - tr_base;
        int32_t cl = cols_s[e] - cw_base;
        int32_t word = (int32_t)(rl * BC + cl) | valid_bit;
        if (wq_s) word |= (wq_s[e] + wq_bias) << wq_shift;
        out[k] = word;
        if (wout) wout[k] = data_s[e];
      } else {
        out[k] = 0;
        if (wout) wout[k] = 0.0f;
      }
    }
  }
}

// Serial-gather schedule sort + pair partition: stable sort by group key
// gkey = (row>>r_bits)*n_win + (col>>14), then detect same-row runs within
// group, mark the odd tail edge of each run as single, and stable-resort by
// gkey*2 + is_single so each group becomes [pair edges..., singles...] —
// bit-identical to the two np.argsort(kind="stable") passes. Emits the
// final sorted rows/cols/data plus per-group (key, count, pair_edges)
// tables; returns the group count, or -1 on a key out of range.
int64_t mggcn_gather_sort(int64_t n_out, int64_t nnz, const int64_t* indptr,
                          const int32_t* indices, const float* data,
                          int64_t n_win, int64_t n_st, int32_t do_pair,
                          int32_t r_bits, int32_t* rows_s, int32_t* cols_s,
                          float* data_s, int64_t* groups, int64_t* gcounts,
                          int64_t* g_pair_edges) {
  std::vector<int32_t> rows(nnz), key(nnz);
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_out; ++r) {
    for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) rows[e] = (int32_t)r;
  }
  std::atomic<int> bad{0};
#pragma omp parallel for schedule(static)
  for (int64_t e = 0; e < nnz; ++e) {
    int64_t k = (int64_t)(rows[e] >> r_bits) * n_win + (indices[e] >> 14);
    if (k < 0 || k >= n_st * n_win) bad.store(1, std::memory_order_relaxed);
    key[e] = (int32_t)k;
  }
  if (bad.load()) return -1;
  std::vector<int64_t> perm(nnz);
  stable_sort_by_key(nnz, key.data(), n_st * n_win, perm.data());
  // pass 2 key: 2*gkey + is_single, evaluated over the FIRST sort's order.
  // runs (same gkey, same row) are contiguous there; the even prefix of
  // each run pairs, the odd tail edge is single.
  std::vector<int32_t> key2(nnz);
  // sequential run walk (runs cross thread boundaries; nnz pass is cheap)
  for (int64_t i = 0; i < nnz;) {
    int64_t e = perm[i];
    int32_t g = key[e];
    int32_t r = rows[e];
    int64_t j = i;
    while (j < nnz && key[perm[j]] == g && rows[perm[j]] == r) ++j;
    int64_t len = j - i;
    int64_t paired = do_pair ? (len & ~int64_t(1)) : 0;
    for (int64_t t = i; t < j; ++t)
      key2[perm[t]] = g * 2 + ((t - i) >= paired ? 1 : 0);
    i = j;
  }
  // the second stable sort must order by position in the FIRST sorted
  // sequence (numpy sorts the already-sorted arrays), so sort perm's
  // values' key2 while keeping perm order as the tie-break: sort an
  // index-into-perm permutation by key2[perm[i]].
  std::vector<int32_t> key2_seq(nnz);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < nnz; ++i) key2_seq[i] = key2[perm[i]];
  std::vector<int64_t> perm2(nnz);
  stable_sort_by_key(nnz, key2_seq.data(), 2 * n_st * n_win, perm2.data());
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < nnz; ++i) {
    int64_t e = perm[perm2[i]];
    rows_s[i] = rows[e];
    cols_s[i] = indices[e];
    data_s[i] = data[e];
  }
  // group tables over the final order
  int64_t ng = 0;
  for (int64_t i = 0; i < nnz;) {
    int64_t e = perm[perm2[i]];
    int32_t g = key[e];
    int64_t j = i, singles = 0;
    while (j < nnz) {
      int64_t e2 = perm[perm2[j]];
      if (key[e2] != g) break;
      singles += (key2[e2] & 1);
      ++j;
    }
    groups[ng] = g;
    gcounts[ng] = j - i;
    g_pair_edges[ng] = (j - i) - singles;
    ++ng;
    i = j;
  }
  return ng;
}

// Serial-gather slot fill: step s's slots cover sorted-edge range
// [s_e0, s_e1); the first 2*lp slots hold pair words (even: c1 | c2<<14,
// odd: shared row-local), the rest single words (rl<<14 | cl).
void mggcn_gather_fill(int64_t S, int64_t E_BLK, const int64_t* s_e0,
                       const int64_t* s_e1, const int64_t* s_st,
                       const int64_t* s_win, const int64_t* s_lp,
                       const int32_t* rows_s, const int32_t* cols_s,
                       const float* data_s, int64_t nnz, int32_t w_bits,
                       int32_t r_bits, int32_t* idx, float* w /* nullable */) {
#pragma omp parallel for schedule(static)
  for (int64_t s = 0; s < S; ++s) {
    int64_t e0 = s_e0[s], e1 = s_e1[s];
    int32_t st_base = (int32_t)(s_st[s] << r_bits);
    int32_t win_base = (int32_t)(s_win[s] << 14);
    int64_t pair_slots = 2 * s_lp[s];
    int32_t* out = idx + s * E_BLK;
    float* wout = w ? w + s * E_BLK : nullptr;
    int64_t live = e1 - e0;
    for (int64_t k = 0; k < E_BLK; ++k) {
      int32_t word = 0;
      float wv = 0.0f;
      if (k < live) {
        int64_t e = e0 + k;
        int32_t rl = rows_s[e] - st_base;
        int32_t cl = cols_s[e] - win_base;
        if (k < pair_slots) {
          if ((k & 1) == 0) {
            int64_t en = e + 1 < nnz ? e + 1 : (nnz ? nnz - 1 : 0);
            int32_t cl2 = cols_s[en] - win_base;
            word = cl | (cl2 << 14);
          } else {
            word = rl;
          }
        } else {
          word = (rl << w_bits) | cl;
        }
        wv = data_s[e];
      }
      out[k] = word;
      if (wout) wout[k] = wv;
    }
  }
}

}  // extern "C"
