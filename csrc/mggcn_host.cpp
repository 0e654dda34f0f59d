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
