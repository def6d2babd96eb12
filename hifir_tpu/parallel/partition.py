"""Partitioned (domain-decomposed) HIF factorization.

The reference is strictly single-node (SURVEY.md §2.7); this module is the
net-new "partitioned factorize" leg of the scaling story (BASELINE.md target
config 5): the matrix is banded with RCM, split into ``nparts`` contiguous
row blocks extended by ``overlap`` rows on each side, and every extended
block is factorized *independently* with a local multilevel HIF — the
factorizations share no state, so they run concurrently across threads here
and across hosts/processes in a `jax.distributed` deployment (each process
owns ``parts where k % nprocs == rank``; the native Crout kernel releases
the GIL, so the thread pool gives real speedup on one host too).

The preconditioner apply is restricted additive Schwarz (RAS):

    M⁻¹ b = Σ_k  R_k^0ᵀ  M_k⁻¹  R_k^δ  b

where ``R_k^δ`` restricts to the δ-overlapped block and ``R_k^0ᵀ``
prolongates only the interior (owned) rows — the standard convergent
Schwarz variant (Cai & Sarkis).  With ``nparts=1`` the apply reduces
exactly to the global ``HIF.solve``.

One-level Schwarz degrades with the partition count (information crosses
one interface per iteration); ``coarse=True`` (default) adds the standard
piecewise-constant (Nicolaides) coarse correction

    M⁻¹ b += R_cᵀ (R_c A R_cᵀ)⁻¹ R_c b,     R_c[k, i] = 1 for i ∈ part k

— an ``nparts × nparts`` dense Galerkin solve that restores
partition-count-robust convergence for elliptic problems.

On device, each partition exports its own jitted ``DevicePrec`` whose apply
involves **no cross-partition collectives** — partitions live on separate
devices/hosts and only the outer Krylov reductions communicate.  This is
the complement of :class:`~hifir_tpu.parallel.prec_sharded.DistPrec`, which
shards one *global* factorization over the mesh.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np

from ..ds.csr import CSR
from ..options import Options, get_default_options

__all__ = ["PartitionedHIF", "band_partition"]


def band_partition(A: CSR, nparts: int):
    """Band the matrix with RCM on the symmetrized pattern and split into
    ``nparts`` contiguous, equal-size row blocks.  Returns ``(perm, bounds)``
    with ``bounds`` of length ``nparts + 1``."""
    from ..pre import _native
    from ..pre.ordering import run_rcm, symmetrize_pattern

    n = A.nrows
    ident = np.arange(n, dtype=np.int64)
    trip = _native.sym_leading_pattern(A, ident, ident, n)
    perm = None
    if trip is not None:
        perm = _native.rcm(n, *trip)
    if perm is None:
        perm = run_rcm(symmetrize_pattern(A))
    bounds = np.linspace(0, n, nparts + 1).astype(np.int64)
    return np.asarray(perm, dtype=np.int64), bounds


@dataclasses.dataclass
class _Part:
    lo: int            # owned range in banded order
    hi: int
    lo_ext: int        # overlapped (factorized) range
    hi_ext: int
    M: object          # local HIF
    M_dist: object = None  # optional DistPrec over this process's devices
                           # (RAS-over-DistPrec, attach_dist_solvers)


class PartitionedHIF:
    """Domain-decomposed multilevel preconditioner (RAS over local HIFs)."""

    def __init__(self):
        self.parts: List[_Part] = []
        self.perm: Optional[np.ndarray] = None   # banded order: pos -> orig
        self.n = 0
        self.nparts = 0
        self.overlap = 0
        self._part_of: Optional[np.ndarray] = None  # banded pos -> part id
        self._coarse_lu = None                      # dense factor of R A R^T

    # -- setup ---------------------------------------------------------------
    def factorize(self, A, nparts: int, params: Optional[Options] = None,
                  overlap: Optional[int] = None,
                  threads: Optional[int] = None,
                  coarse: bool = True,
                  coarse_dim: int = 1,
                  coarse_mode: str = "cheb",
                  process_rank: Optional[int] = None,
                  process_count: Optional[int] = None) -> "PartitionedHIF":
        """Band, split, and factorize all extended diagonal blocks.

        ``overlap=None`` auto-sizes the Schwarz overlap to TWICE the banded
        matrix bandwidth (capped at half a block) — about two grid lines of
        a discretized PDE, the round-4 sweep's best iteration-growth
        setting (examples/partition_study.py).
        ``threads`` caps the concurrent local factorizations (defaults to
        ``min(nparts, os.cpu_count())``).

        In a multi-process deployment (``jax.distributed``; see
        :mod:`.multihost`) pass ``process_rank``/``process_count``: this
        process factorizes only the parts ``k % process_count == rank`` (the
        banding, bounds, overlap, and coarse operator are deterministic, so
        every process agrees on the partition without communicating);
        :meth:`local_contrib` then yields this process's additive share of
        the RAS apply, and summing shares across processes — e.g. with a
        ``psum``/``process_allgather`` — reproduces :meth:`solve` exactly
        (tested in ``tests/test_multihost.py``).
        """
        import os

        from ..api import HIF

        opts = params if params is not None else get_default_options()
        if not isinstance(A, CSR):
            A = CSR.from_scipy(A)
        n = A.nrows
        if nparts < 1 or nparts > n:
            raise ValueError("nparts must be in [1, n]")
        self.n = n
        self.nparts = nparts
        self.overlap = overlap
        if (process_rank is None) != (process_count is None):
            raise ValueError("process_rank and process_count go together")
        self._rank = process_rank
        self._nproc = process_count

        def _mine(k: int) -> bool:
            return process_rank is None or k % process_count == process_rank

        if nparts == 1:
            self.perm = np.arange(n, dtype=np.int64)
            self.overlap = 0
            M = HIF().factorize(A, opts)
            self.parts = [_Part(0, n, 0, n, M)]
            return self

        perm, bounds = band_partition(A, nparts)
        self.perm = perm
        S = A.to_scipy()[perm, :][:, perm].tocsr()
        if overlap is None:
            # two bandwidths (~two grid lines of a discretized PDE): the
            # round-4 sweep (examples/partition_study.py, BASELINE.md) shows
            # 1x-bw overlap costs ~40% more iterations at 16 parts while 2x
            # keeps the growth flat in the partition count
            rows_nz = np.repeat(np.arange(n, dtype=np.int64),
                                np.diff(S.indptr))
            bw = int(np.abs(rows_nz - S.indices).max()) if S.nnz else 0
            overlap = min(max(2 * bw, 8), int(bounds[1] - bounds[0]) // 2)
        self.overlap = overlap

        if coarse:
            # Galerkin coarse operator A_c = R A R^T.  coarse_dim = q basis
            # vectors per part.  coarse_mode:
            #   "cheb" — Chebyshev-like polynomials of the banded position
            #     within the part (q=1 is the classical piecewise-constant
            #     Nicolaides space; q>1 enriches with linear/quadratic
            #     modes);
            #   "geneo" — GenEO-lite spectral space: the q lowest
            #     eigenmodes of each part's (symmetrized) owned diagonal
            #     block via shift-inverted Lanczos.  The low block modes are
            #     exactly what one-level RAS damps worst, so this targets
            #     the iteration floor the round-4 sweep hit (VERDICT r4
            #     Weak #7); unlike the q>=2 Chebyshev modes it stays
            #     well-conditioned at 512^2 (the Galerkin operator of
            #     near-orthonormal eigenvectors is well-scaled).
            q = max(int(coarse_dim), 1)
            self._coarse_dim = q
            part_of = np.searchsorted(bounds[1:], np.arange(n), side="right")
            self._part_of = part_of.astype(np.int64)
            lo_of = bounds[:-1][part_of]
            hi_of = bounds[1:][part_of]
            t = (2.0 * (np.arange(n) - lo_of) / np.maximum(hi_of - lo_of - 1,
                                                           1)) - 1.0
            W = np.empty((q, n))
            for j in range(q):
                W[j] = np.polynomial.chebyshev.chebval(
                    t, np.eye(q)[j])
            if coarse_mode == "geneo":
                import scipy.sparse.linalg as spla

                for k in range(nparts):
                    lo, hi = int(bounds[k]), int(bounds[k + 1])
                    if hi - lo <= q + 2:
                        continue  # tiny part: keep the polynomial modes
                    Bk = S[lo:hi, :][:, lo:hi].tocsc()
                    Bs = (Bk + Bk.T) * 0.5
                    try:
                        _, vecs = spla.eigsh(Bs, k=q, sigma=0.0, which="LM")
                        W[:, lo:hi] = vecs.T
                    except Exception:
                        pass  # keep polynomial modes for this part
            self._coarse_w = W
            rows_nz = np.repeat(np.arange(n, dtype=np.int64),
                                np.diff(S.indptr))
            nc = nparts * q
            Ac = np.zeros((nc, nc), dtype=S.data.dtype)
            ri = part_of[rows_nz] * q
            ci = part_of[S.indices] * q
            for ja in range(q):
                for jb in range(q):
                    np.add.at(Ac, (ri + ja, ci + jb),
                              W[ja, rows_nz] * S.data * W[jb, S.indices])
            import scipy.linalg as sla

            self._coarse_lu = sla.lu_factor(Ac)

        def _fac(k: int) -> _Part:
            lo, hi = int(bounds[k]), int(bounds[k + 1])
            lo_e = max(0, lo - overlap)
            hi_e = min(n, hi + overlap)
            if not _mine(k):
                return _Part(lo, hi, lo_e, hi_e, None)
            blk = S[lo_e:hi_e, :][:, lo_e:hi_e].tocsr()
            blk.sort_indices()
            Ab = CSR(blk.shape[0], blk.shape[1],
                     blk.indptr.astype(np.int64), blk.indices, blk.data)
            return _Part(lo, hi, lo_e, hi_e, HIF().factorize(Ab, opts))

        nthr = threads if threads is not None else min(nparts,
                                                       os.cpu_count() or 1)
        if nthr > 1:
            with ThreadPoolExecutor(max_workers=nthr) as ex:
                self.parts = list(ex.map(_fac, range(nparts)))
        else:
            self.parts = [_fac(k) for k in range(nparts)]
        return self

    # -- stats ----------------------------------------------------------------
    def levels(self) -> int:
        return max(p.M.levels() for p in self.parts if p.M is not None)

    def nnz(self) -> int:
        return sum(p.M.nnz() for p in self.parts if p.M is not None)

    # -- apply ----------------------------------------------------------------
    def _coarse_apply(self, bp: np.ndarray, trans: bool) -> np.ndarray:
        import scipy.linalg as sla

        q = getattr(self, "_coarse_dim", 1)
        bc = np.zeros(self.nparts * q, dtype=bp.dtype)
        for j in range(q):
            np.add.at(bc, self._part_of * q + j, self._coarse_w[j] * bp)
        xc = sla.lu_solve(self._coarse_lu, bc, trans=1 if trans else 0)
        out = np.zeros_like(bp)
        for j in range(q):
            out += self._coarse_w[j] * xc[self._part_of * q + j]
        return out

    def attach_dist_solvers(self, mesh=None, dtype=None, chunk=256,
                            max_halo_chunks: int = 128) -> None:
        """Attach a mesh-distributed M-solve (:class:`.prec_sharded.DistPrec`)
        to every OWNED part — the BASELINE config-5 composition: the
        cross-process coupling is restricted additive Schwarz
        (:meth:`local_contrib` shares summed under ``jax.distributed``)
        while each part's multilevel M-solve runs distributed over this
        process's own device mesh.  ``mesh=None`` builds a local
        ``(1, n_local_devices)`` mesh.  Forward solves use the distributed
        path; transpose solves keep the host path (DistPrec is
        forward-only)."""
        from .mesh import make_mesh
        from .prec_sharded import DistPrec

        if mesh is None:
            mesh = make_mesh(local=True)
        for p in self.parts:
            if p.M is not None:
                p.M_dist = DistPrec.from_host(mesh, p.M, dtype=dtype,
                                              chunk=chunk,
                                              max_halo_chunks=max_halo_chunks)

    def local_contrib(self, b: np.ndarray, trans: bool = False) -> np.ndarray:
        """This process's additive share of the RAS apply, in ORIGINAL (not
        banded) index order: the local solves of the parts this process owns
        plus — on the process owning part 0 — the coarse correction.  Summing
        ``local_contrib`` over all processes equals :meth:`solve`.  With no
        ``process_rank`` set (all parts local) it IS :meth:`solve`."""
        bp = b[self.perm]
        xp = np.zeros_like(bp)
        own0 = True
        for k, p in enumerate(self.parts):
            if p.M is None:
                if k == 0:
                    own0 = False
                continue
            if trans:
                be = np.zeros(p.hi_ext - p.lo_ext, dtype=bp.dtype)
                be[p.lo - p.lo_ext:p.hi - p.lo_ext] = bp[p.lo:p.hi]
                xp[p.lo_ext:p.hi_ext] += p.M.solve(be, trans=True)
            else:
                if p.M_dist is not None:
                    xe = np.asarray(p.M_dist.solve(bp[p.lo_ext:p.hi_ext]))
                else:
                    xe = p.M.solve(bp[p.lo_ext:p.hi_ext], trans=False)
                xp[p.lo:p.hi] = xe[p.lo - p.lo_ext:p.hi - p.lo_ext]
        if own0 and self._coarse_lu is not None:
            xp += self._coarse_apply(bp, trans)
        x = np.zeros_like(xp)
        x[self.perm] = xp
        return x

    def solve(self, b: np.ndarray, trans: bool = False) -> np.ndarray:
        """RAS apply (+ additive coarse correction): local solves on the
        overlapped blocks, interior writeback.

        ``trans=True`` is the *true adjoint* of the forward apply,
        ``Mᵀ⁻¹ = Σ_k R_k^δᵀ M_k⁻ᵀ R_k^0 (+ coarseᵀ)``: restriction and
        prolongation swap roles — restrict to the OWNED rows, transposed
        local solve on the extended block, prolongate the full extended
        result additively — so BiCG/QMR-type solvers relying on M(trans)
        being the adjoint of M(forward) get exact adjoint semantics.
        """
        if any(p.M is None for p in self.parts):
            raise RuntimeError(
                "partial (multi-process) preconditioner: use local_contrib "
                "and sum the shares across processes")
        bp = b[self.perm]
        xp = np.zeros_like(bp)
        if trans:
            for p in self.parts:
                be = np.zeros(p.hi_ext - p.lo_ext, dtype=bp.dtype)
                be[p.lo - p.lo_ext:p.hi - p.lo_ext] = bp[p.lo:p.hi]
                xp[p.lo_ext:p.hi_ext] += p.M.solve(be, trans=True)
        else:
            for p in self.parts:
                xe = p.M.solve(bp[p.lo_ext:p.hi_ext], trans=False)
                xp[p.lo:p.hi] = xe[p.lo - p.lo_ext:p.hi - p.lo_ext]
        if self._coarse_lu is not None:
            xp += self._coarse_apply(bp, trans)
        x = np.empty_like(xp)
        x[self.perm] = xp
        return x

    def solve_mrhs(self, B: np.ndarray) -> np.ndarray:
        Bp = B[self.perm]
        Xp = np.zeros_like(Bp)
        for p in self.parts:
            Xe = p.M.solve_mrhs(Bp[p.lo_ext:p.hi_ext])
            Xp[p.lo:p.hi] = Xe[p.lo - p.lo_ext:p.hi - p.lo_ext]
        if self._coarse_lu is not None:
            for j in range(Xp.shape[1]):
                Xp[:, j] += self._coarse_apply(Bp[:, j], False)
        X = np.empty_like(Xp)
        X[self.perm] = Xp
        return X

    # -- device export ---------------------------------------------------------
    def to_device(self, dtype=None):
        """Per-partition jitted device preconditioners.  Each partition's
        apply runs entirely on its owner device/host (no collectives); the
        returned object mirrors :meth:`solve` with device local solves."""
        return DevicePartitionedPrec(self, dtype)


class DevicePartitionedPrec:
    """Device-side RAS apply over per-partition ``DevicePrec`` objects.

    In a pod deployment each process holds only its own partitions and the
    interior scatter happens into its output shard; on a single controller
    (and in the CPU-mesh tests) the partitions are applied in sequence and
    composed on host — semantics identical, communication-free by
    construction.
    """

    def __init__(self, host: PartitionedHIF, dtype=None):
        self.host = host
        self.device_precs = [p.M.to_device(dtype) for p in host.parts]

    def solve(self, b: np.ndarray) -> np.ndarray:
        import numpy as np

        h = self.host
        bp = b[h.perm]
        xp = np.zeros_like(bp)
        for p, dp in zip(h.parts, self.device_precs):
            xe = np.asarray(dp.solve(bp[p.lo_ext:p.hi_ext]))
            xp[p.lo:p.hi] = xe[p.lo - p.lo_ext:p.hi - p.lo_ext]
        if h._coarse_lu is not None:
            xp += h._coarse_apply(bp, False)
        x = np.empty_like(xp)
        x[h.perm] = xp
        return x
