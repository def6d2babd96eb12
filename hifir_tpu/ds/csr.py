"""Host-side sparse matrix containers.

TPU-native re-design of the reference compressed-storage layer
(``/root/reference/src/hif/ds/CompressedStorage.hpp:827`` CRS, ``:1810`` CCS).
Because JAX arrays are immutable, the reference's wrap-vs-own reference
counting disappears; on host we keep a single CSR class built on numpy arrays,
and column-major access is obtained by an explicit (cached) transpose instead
of a dual CCS class.  The augmented linked-list storage
(``ds/AugmentedStorage.hpp``) is not reproduced: the factorization kernels use
a stable-id dual-adjacency design instead (see ``hifir_tpu/alg``).

Device-side (padded/sliced-ELL) forms live in :mod:`hifir_tpu.ops.spmv`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["CSR", "csr_from_dense"]


class CSR:
    """Compressed sparse row matrix on host (numpy).

    Indices within each row are kept sorted and unique, matching the validity
    contract enforced by the reference (``CompressedStorage.hpp:193``).
    """

    __slots__ = ("nrows", "ncols", "indptr", "indices", "data", "_csc")

    def __init__(self, nrows: int, ncols: int, indptr, indices, data,
                 check: bool = False):
        self.nrows = int(nrows)
        self.ncols = int(ncols)
        self.indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        self.indices = np.ascontiguousarray(indices, dtype=np.int32)
        self.data = np.ascontiguousarray(data)
        self._csc: Optional["CSR"] = None
        if check:
            self.check_validity()

    # -- construction -------------------------------------------------------
    @classmethod
    def from_coo(cls, nrows, ncols, rows, cols, vals) -> "CSR":
        """Build from coordinate triplets; duplicates are summed."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        if rows.size:
            # collapse duplicates
            new_grp = np.empty(rows.size, dtype=bool)
            new_grp[0] = True
            np.not_equal(rows[1:], rows[:-1], out=new_grp[1:])
            same_col = cols[1:] == cols[:-1]
            new_grp[1:] |= ~same_col
            new_grp[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
            grp_id = np.cumsum(new_grp) - 1
            ngrp = grp_id[-1] + 1
            out_vals = np.zeros(ngrp, dtype=vals.dtype)
            np.add.at(out_vals, grp_id, vals)
            keep = np.flatnonzero(new_grp)
            rows, cols, vals = rows[keep], cols[keep], out_vals
        indptr = np.zeros(nrows + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        np.cumsum(indptr, out=indptr)
        return cls(nrows, ncols, indptr, cols.astype(np.int32), vals)

    @classmethod
    def from_scipy(cls, A) -> "CSR":
        A = A.tocsr()
        A.sort_indices()
        return cls(A.shape[0], A.shape[1], A.indptr, A.indices, A.data)

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csr_matrix((self.data, self.indices, self.indptr),
                             shape=(self.nrows, self.ncols))

    @classmethod
    def identity(cls, n: int, dtype=np.float64) -> "CSR":
        return cls(n, n, np.arange(n + 1), np.arange(n, dtype=np.int32),
                   np.ones(n, dtype=dtype))

    # -- basics -------------------------------------------------------------
    @property
    def nnz(self) -> int:
        return int(self.indptr[-1])

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.nrows, self.ncols)

    @property
    def dtype(self):
        return self.data.dtype

    def row_nnz(self) -> np.ndarray:
        return np.diff(self.indptr)

    def copy(self) -> "CSR":
        return CSR(self.nrows, self.ncols, self.indptr.copy(),
                   self.indices.copy(), self.data.copy())

    def astype(self, dtype) -> "CSR":
        return CSR(self.nrows, self.ncols, self.indptr, self.indices,
                   self.data.astype(dtype))

    def check_validity(self) -> None:
        """Structural validation (ref ``CompressedStorage.hpp:193``)."""
        from ..utils.log import hif_error

        if self.indptr.shape[0] != self.nrows + 1:
            hif_error("indptr size %d != nrows+1 %d", self.indptr.shape[0],
                      self.nrows + 1)
        if self.indptr[0] != 0 or self.indptr[-1] != self.indices.shape[0]:
            hif_error("corrupted indptr bounds")
        if np.any(np.diff(self.indptr) < 0):
            hif_error("negative row counts in indptr")
        if self.indices.size:
            if self.indices.min() < 0 or self.indices.max() >= self.ncols:
                hif_error("column index out of bounds")
            # vectorized within-row sorted/unique check: adjacent pairs must
            # strictly increase except across row boundaries
            d = np.diff(self.indices.astype(np.int64))
            boundary = np.zeros(self.indices.size - 1, dtype=bool) \
                if self.indices.size > 1 else np.zeros(0, dtype=bool)
            ends = self.indptr[1:-1]
            ends = ends[(ends > 0) & (ends < self.indices.size)]
            boundary[ends - 1] = True
            if np.any((d <= 0) & ~boundary):
                hif_error("row indices not sorted/unique")

    def todense(self) -> np.ndarray:
        out = np.zeros((self.nrows, self.ncols), dtype=self.data.dtype)
        for i in range(self.nrows):
            s, e = self.indptr[i], self.indptr[i + 1]
            out[i, self.indices[s:e]] = self.data[s:e]
        return out

    # -- transpose / CSC view ----------------------------------------------
    def transpose(self) -> "CSR":
        """Explicit transpose (ref ``convert_storage``, ``:753``); counting
        sort via scipy's C kernel."""
        T = self.to_scipy().tocsc()
        T.sort_indices()
        return CSR(self.ncols, self.nrows, T.indptr.astype(np.int64),
                   T.indices, T.data)

    def tocsc(self) -> "CSR":
        """CSR holding the transpose; (indptr, indices) read as CSC of self."""
        if self._csc is None:
            self._csc = self.transpose()
        return self._csc

    # -- products -----------------------------------------------------------
    def matvec(self, x: np.ndarray) -> np.ndarray:
        """SpMV y = A x; ``x`` may be (ncols,) or an (ncols, k) multi-RHS
        block (ref ``multiply_nt`` ``:1137`` and ``multiply_mrhs_nt``
        ``:1137-1356``)."""
        x = np.asarray(x)
        data = self.data if x.ndim == 1 else self.data[:, None]
        prod = data * x[self.indices]
        shape = (self.nrows,) if x.ndim == 1 else (self.nrows, x.shape[1])
        y = np.zeros(shape, dtype=np.result_type(self.data, x))
        if prod.size:
            nz = np.flatnonzero(np.diff(self.indptr))
            sums = np.add.reduceat(prod, self.indptr[nz], axis=0)
            y[nz] = sums
        return y

    def matvec_tran(self, x: np.ndarray, conj: bool = False) -> np.ndarray:
        x = np.asarray(x)
        data = np.conj(self.data) if conj else self.data
        if x.ndim == 2:
            data = data[:, None]
            y = np.zeros((self.ncols, x.shape[1]),
                         dtype=np.result_type(self.data, x))
        else:
            y = np.zeros(self.ncols, dtype=np.result_type(self.data, x))
        rows = np.repeat(np.arange(self.nrows), self.row_nnz())
        np.add.at(y, self.indices, data * x[rows])
        return y

    # -- scalings & permutations -------------------------------------------
    def scale_diag_left(self, s: np.ndarray) -> "CSR":
        """Row scaling diag(s) @ A (ref ``scale_diag_left``, ``:1045``)."""
        rows = np.repeat(np.arange(self.nrows), self.row_nnz())
        return CSR(self.nrows, self.ncols, self.indptr, self.indices,
                   self.data * s[rows])

    def scale_diag_right(self, t: np.ndarray) -> "CSR":
        return CSR(self.nrows, self.ncols, self.indptr, self.indices,
                   self.data * t[self.indices])

    def permute(self, p: np.ndarray, q_inv: np.ndarray) -> "CSR":
        """Extract A[p, :] with columns remapped by q_inv (ref ``compute_perm``,
        ``CompressedStorage.hpp:551,1680``)."""
        p = np.asarray(p)
        counts = self.row_nnz()[p]
        indptr = np.zeros(self.nrows + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        indices = np.empty(indptr[-1], dtype=np.int32)
        data = np.empty(indptr[-1], dtype=self.data.dtype)
        for i, pi in enumerate(p):
            s, e = self.indptr[pi], self.indptr[pi + 1]
            cols = np.asarray(q_inv)[self.indices[s:e]]
            order = np.argsort(cols, kind="stable")
            o, l = indptr[i], indptr[i + 1]
            indices[o:l] = cols[order]
            data[o:l] = self.data[s:e][order]
        return CSR(self.nrows, self.ncols, indptr, indices, data)

    def extract_leading(self, m: int) -> "CSR":
        """Leading m-by-m block (ref ``extract_leading``, ``:1712``)."""
        indptr = np.zeros(m + 1, dtype=np.int64)
        idx_chunks = []
        val_chunks = []
        for i in range(m):
            s, e = self.indptr[i], self.indptr[i + 1]
            cols = self.indices[s:e]
            keep = cols < m
            idx_chunks.append(cols[keep])
            val_chunks.append(self.data[s:e][keep])
            indptr[i + 1] = indptr[i] + idx_chunks[-1].size
        indices = (np.concatenate(idx_chunks) if idx_chunks
                   else np.empty(0, dtype=np.int32))
        data = (np.concatenate(val_chunks) if val_chunks
                else np.empty(0, dtype=self.data.dtype))
        return CSR(m, m, indptr, indices, data)

    def prune(self, tol: float = 0.0) -> "CSR":
        """Drop entries with magnitude <= tol (ref ``prune``, ``:1733``)."""
        keep = np.abs(self.data) > tol
        rows = np.repeat(np.arange(self.nrows, dtype=np.int64), self.row_nnz())
        return CSR.from_coo(self.nrows, self.ncols, rows[keep],
                            self.indices[keep].astype(np.int64), self.data[keep])

    def diagonal(self) -> np.ndarray:
        nd = min(self.nrows, self.ncols)
        if self.data.dtype == np.float64:
            from ..pre import _native

            out = _native.diagonal(self, nd)
            if out is not None:
                return out
        d = np.zeros(nd, dtype=self.data.dtype)
        rows = np.repeat(np.arange(self.nrows, dtype=np.int64), self.row_nnz())
        on_diag = rows == self.indices
        if nd < self.nrows:
            on_diag &= rows < nd
        d[rows[on_diag]] = self.data[on_diag]
        return d

    # -- triangular solves (host oracles; device versions in ops/trsv) ------
    def solve_as_strict_lower(self, b: np.ndarray) -> np.ndarray:
        """Solve (I + strict_lower(A)) x = b in-place semantics
        (ref ``solve_as_strict_lower``, ``:1358``).  Uses the native C++
        kernel when available; Python loop fallback otherwise."""
        from ..pre import _native

        if (self.data.dtype in (np.float64, np.float32)
                and not np.iscomplexobj(b)):
            x = _native.trsv(self, np.asarray(b, dtype=self.data.dtype), True)
            if x is not None:
                return x
        x = np.array(b, copy=True)
        for i in range(self.nrows):
            s, e = self.indptr[i], self.indptr[i + 1]
            cols = self.indices[s:e]
            mask = cols < i
            if mask.any():
                x[i] -= self.data[s:e][mask] @ x[cols[mask]]
        return x

    def solve_as_strict_upper(self, b: np.ndarray) -> np.ndarray:
        """Solve (I + strict_upper(A)) x = b (ref ``:1451``)."""
        from ..pre import _native

        if (self.data.dtype in (np.float64, np.float32)
                and not np.iscomplexobj(b)):
            x = _native.trsv(self, np.asarray(b, dtype=self.data.dtype),
                             False)
            if x is not None:
                return x
        x = np.array(b, copy=True)
        for i in range(self.nrows - 1, -1, -1):
            s, e = self.indptr[i], self.indptr[i + 1]
            cols = self.indices[s:e]
            mask = cols > i
            if mask.any():
                x[i] -= self.data[s:e][mask] @ x[cols[mask]]
        return x

    # -- analysis ------------------------------------------------------------
    def pattern_symm_ratio(self) -> float:
        """Fraction of entries whose transpose position is also present
        (ref ``compute_pattern_symm_ratio``, ``alg/factor.hpp:507``)."""
        if self.nnz == 0:
            return 1.0
        if self.nrows == self.ncols:
            from ..pre import _native

            r = _native.pattern_symm(self.nrows, self.indptr, self.indices)
            if r is not None:
                return r
        # membership of transposed positions in the (globally sorted)
        # row-major key sequence -- O(nnz log nnz), no products built
        rows = np.repeat(np.arange(self.nrows, dtype=np.int64),
                         self.row_nnz())
        keys = rows * np.int64(self.ncols) + self.indices.astype(np.int64)
        tkeys = self.indices.astype(np.int64) * np.int64(self.ncols) + rows
        pos = np.searchsorted(keys, tkeys)
        pos = np.minimum(pos, keys.size - 1)
        return float((keys[pos] == tkeys).sum()) / float(self.nnz)


def csr_from_dense(M: np.ndarray, tol: float = 0.0) -> CSR:
    rows, cols = np.nonzero(np.abs(M) > tol)
    return CSR.from_coo(M.shape[0], M.shape[1], rows, cols, M[rows, cols])
