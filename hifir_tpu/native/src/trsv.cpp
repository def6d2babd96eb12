// Host sequential sparse triangular solves (unit-diagonal strict factors).
//
// CPU fallback counterpart of the reference solve_as_strict_lower/upper
// (ds/CompressedStorage.hpp:1358,1451); the TPU path uses the level-scheduled
// jitted kernels in hifir_tpu/ops/trsv.py instead.

#include "common.hpp"

HT_API void ht_trsv_lower(i64 n, const i64 *indptr, const i32 *indices,
                          const double *vals, double *x) {
  for (i64 i = 0; i < n; ++i) {
    double acc = x[i];
    for (i64 k = indptr[i]; k < indptr[i + 1]; ++k) {
      const i32 j = indices[k];
      if (j < i) acc -= vals[k] * x[j];
    }
    x[i] = acc;
  }
}

HT_API void ht_trsv_upper(i64 n, const i64 *indptr, const i32 *indices,
                          const double *vals, double *x) {
  for (i64 i = n - 1; i >= 0; --i) {
    double acc = x[i];
    for (i64 k = indptr[i + 1] - 1; k >= indptr[i]; --k) {
      const i32 j = indices[k];
      if (j > i) acc -= vals[k] * x[j];
    }
    x[i] = acc;
  }
}

// Multi-RHS variants over a row-major n-by-k block (counterpart of the
// reference's dedicated mrhs trsv kernels, CompressedStorage.hpp:1382-1518;
// the reference fixes Nrhs at compile time, here k is a runtime argument and
// the inner axpy vectorizes over the contiguous RHS axis).
HT_API void ht_trsv_lower_mrhs(i64 n, const i64 *indptr, const i32 *indices,
                               const double *vals, double *x, i64 k) {
  for (i64 i = 0; i < n; ++i) {
    double *HT_RESTRICT xi = x + i * k;
    for (i64 e = indptr[i]; e < indptr[i + 1]; ++e) {
      const i32 j = indices[e];
      if (j < i) {
        const double v = vals[e];
        const double *HT_RESTRICT xj = x + (i64)j * k;
        for (i64 c = 0; c < k; ++c) xi[c] -= v * xj[c];
      }
    }
  }
}

HT_API void ht_trsv_upper_mrhs(i64 n, const i64 *indptr, const i32 *indices,
                               const double *vals, double *x, i64 k) {
  for (i64 i = n - 1; i >= 0; --i) {
    double *HT_RESTRICT xi = x + i * k;
    for (i64 e = indptr[i + 1] - 1; e >= indptr[i]; --e) {
      const i32 j = indices[e];
      if (j > i) {
        const double v = vals[e];
        const double *HT_RESTRICT xj = x + (i64)j * k;
        for (i64 c = 0; c < k; ++c) xi[c] -= v * xj[c];
      }
    }
  }
}
