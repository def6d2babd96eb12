// Permuted + scaled matrix assembly: Ahat = (diag(s) A diag(t))[p, q],
// rows sorted, via two counting passes (O(nnz)).  Replaces the scipy
// fancy-indexing path in the level driver (ref compute_perm,
// ds/CompressedStorage.hpp:551).

#include "common.hpp"

HT_API void ht_permute_scale(i64 n, const i64 *Ap, const i32 *Ai,
                             const double *Av, const double *s,
                             const double *t, const i64 *p, const i64 *q_inv,
                             i64 *Bp, i32 *Bi, double *Bv) {
  // pass 1: row pointers of B (row i of B = row p[i] of A)
  Bp[0] = 0;
  for (i64 i = 0; i < n; ++i) Bp[i + 1] = Bp[i] + (Ap[p[i] + 1] - Ap[p[i]]);
  // pass 2: fill with remapped columns, then counting-sort within rows by
  // building through a column-major intermediate
  const i64 nnz = Bp[n];
  std::vector<i64> colcnt(n + 1, 0);
  std::vector<i32> tmp_col(nnz);
  std::vector<i32> tmp_row(nnz);
  std::vector<double> tmp_val(nnz);
  {
    i64 w = 0;
    for (i64 i = 0; i < n; ++i) {
      const i64 r = p[i];
      const double sr = s[r];
      for (i64 k = Ap[r]; k < Ap[r + 1]; ++k, ++w) {
        const i32 c = (i32)q_inv[Ai[k]];
        tmp_col[w] = c;
        tmp_row[w] = (i32)i;
        tmp_val[w] = sr * Av[k] * t[Ai[k]];
        ++colcnt[c + 1];
      }
    }
  }
  for (i64 c = 0; c < n; ++c) colcnt[c + 1] += colcnt[c];
  // scatter to column-major order
  std::vector<i32> cm_row(nnz);
  std::vector<double> cm_val(nnz);
  {
    std::vector<i64> nxt(colcnt.begin(), colcnt.end() - 1);
    for (i64 w = 0; w < nnz; ++w) {
      const i64 pos = nxt[tmp_col[w]]++;
      cm_row[pos] = tmp_row[w];
      cm_val[pos] = tmp_val[w];
    }
  }
  // final pass: column-major traversal emits each row's entries in ascending
  // column order
  {
    std::vector<i64> nxt(Bp, Bp + n);
    for (i64 c = 0; c < n; ++c)
      for (i64 k = colcnt[c]; k < colcnt[c + 1]; ++k) {
        const i32 r = cm_row[k];
        const i64 pos = nxt[r]++;
        Bi[pos] = (i32)c;
        Bv[pos] = cm_val[k];
      }
  }
}
