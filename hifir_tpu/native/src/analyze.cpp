// O(nnz) analysis passes: pattern-symmetry ratio and the static-deferral
// probe (diagonal lookup + row/col max magnitudes) — the remaining hot
// Python-side preprocessing costs at scale.

#include "common.hpp"

// fraction of entries whose transposed position also exists
HT_API double ht_pattern_symm(i64 n, const i64 *indptr, const i32 *indices) {
  const i64 nnz = indptr[n];
  if (!nnz) return 1.0;
  // build transpose pattern via counting
  std::vector<i64> cptr(n + 1, 0);
  for (i64 k = 0; k < nnz; ++k) ++cptr[indices[k] + 1];
  for (i64 c = 0; c < n; ++c) cptr[c + 1] += cptr[c];
  std::vector<i32> crow(nnz);
  {
    std::vector<i64> nxt(cptr.begin(), cptr.end() - 1);
    for (i64 i = 0; i < n; ++i)
      for (i64 k = indptr[i]; k < indptr[i + 1]; ++k)
        crow[nxt[indices[k]]++] = (i32)i;
  }
  // rows i: sorted indices; transpose row i (= column i) sorted by
  // construction; two-pointer intersection per row
  i64 hits = 0;
  for (i64 i = 0; i < n; ++i) {
    i64 a = indptr[i], b = cptr[i];
    const i64 ae = indptr[i + 1], be = cptr[i + 1];
    while (a < ae && b < be) {
      if (indices[a] < crow[b]) ++a;
      else if (indices[a] > crow[b]) ++b;
      else { ++hits; ++a; ++b; }
    }
  }
  return (double)hits / (double)nnz;
}

// For each leading pair (p[i], q[i]): diag value and max(row,col) magnitude.
HT_API void ht_defer_probe(i64 n, const i64 *indptr, const i32 *indices,
                           const double *vals, i64 m0, const i64 *p,
                           const i64 *q, double *diag, double *mx) {
  std::vector<double> rowmax(n, 0.0), colmax(n, 0.0);
  for (i64 i = 0; i < n; ++i)
    for (i64 k = indptr[i]; k < indptr[i + 1]; ++k) {
      const double a = std::fabs(vals[k]);
      if (a > rowmax[i]) rowmax[i] = a;
      if (a > colmax[indices[k]]) colmax[indices[k]] = a;
    }
  for (i64 i = 0; i < m0; ++i) {
    const i64 r = p[i];
    const i32 c = (i32)q[i];
    double dv = 0.0;
    // binary search within the sorted row
    i64 lo = indptr[r], hi = indptr[r + 1];
    while (lo < hi) {
      const i64 mid = (lo + hi) / 2;
      if (indices[mid] < c) lo = mid + 1;
      else hi = mid;
    }
    if (lo < indptr[r + 1] && indices[lo] == c) dv = vals[lo];
    diag[i] = dv;
    double m = rowmax[r] > colmax[c] ? rowmax[r] : colmax[c];
    if (m == 0.0) m = 1.0;
    mx[i] = m;
  }
}
