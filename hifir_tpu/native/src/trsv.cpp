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
