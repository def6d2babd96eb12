// Permuted + scaled matrix assembly: Ahat = (diag(s) A diag(t))[p, q],
// single O(nnz) pass (ref compute_perm, ds/CompressedStorage.hpp:551).
// Rows are emitted with *unsorted* columns: no consumer requires sorted
// rows (the Crout kernel scatters, the finalize E/F extraction and Schur
// sort their own per-row buffers, and transposes are counting passes), so
// the two counting-sort passes this used to do were pure overhead.

#include "common.hpp"

HT_API void ht_permute_scale(i64 n, const i64 *Ap, const i32 *Ai,
                             const double *Av, const double *s,
                             const double *t, const i64 *p, const i64 *q_inv,
                             i64 *Bp, i32 *Bi, double *Bv) {
  Bp[0] = 0;
  i64 w = 0;
  for (i64 i = 0; i < n; ++i) {
    const i64 r = p[i];
    const double sr = s[r];
    for (i64 k = Ap[r]; k < Ap[r + 1]; ++k, ++w) {
      Bi[w] = (i32)q_inv[Ai[k]];
      Bv[w] = sr * Av[k] * t[Ai[k]];
    }
    Bp[i + 1] = w;
  }
}
