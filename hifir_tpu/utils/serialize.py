"""Preconditioner checkpoint/restore.

The reference can only export per-level data through bindings
(``Prec::export_sparse_data``, ``/root/reference/src/hif/alg/Prec.hpp:222``);
there is no factorization checkpointing (SURVEY.md §5).  Here the whole
multilevel preconditioner serializes to one ``.npz`` — factorize once, reuse
across runs/jobs, or ship to a serving fleet.
"""

from __future__ import annotations

from typing import List

import numpy as np

__all__ = ["save_prec", "load_prec"]

_MAT_FIELDS = ("L_B", "U_B", "E", "F")
_VEC_FIELDS = ("d", "s", "t", "p", "p_inv", "q", "q_inv")


def save_prec(fname: str, M) -> None:
    """Serialize a factorized :class:`hifir_tpu.api.HIF` to ``.npz``."""
    from ..api import HIF

    payload = {"nlevels": np.int64(len(M.precs)), "stats": M.stats_}
    for i, prec in enumerate(M.precs):
        payload[f"l{i}_mn"] = np.array([prec.m, prec.n], dtype=np.int64)
        for f in _MAT_FIELDS:
            mat = getattr(prec, f)
            payload[f"l{i}_{f}_indptr"] = mat.indptr
            payload[f"l{i}_{f}_indices"] = mat.indices
            payload[f"l{i}_{f}_data"] = mat.data
            payload[f"l{i}_{f}_shape"] = np.array(mat.shape, dtype=np.int64)
        for f in _VEC_FIELDS:
            payload[f"l{i}_{f}"] = getattr(prec, f)
        if prec.dense_matrix is not None:
            payload[f"l{i}_dense"] = prec.dense_matrix
            ds = prec.dense_solver
            if ds is not None:
                payload[f"l{i}_dense_kind"] = np.array(ds.kind)
    np.savez_compressed(fname, **payload)


def load_prec(fname: str):
    """Restore a :class:`hifir_tpu.api.HIF` from ``.npz`` (refactorizes the
    dense tail, which is cheap relative to the sparse levels)."""
    from ..alg.factor import LevelPrec
    from ..api import HIF
    from ..ds.csr import CSR
    from ..small_scale.dense import LUP, QRCP, SYEIG

    with np.load(fname, allow_pickle=False) as z:
        M = HIF()
        M.stats_ = z["stats"].copy()
        nlev = int(z["nlevels"])
        for i in range(nlev):
            m, n = (int(v) for v in z[f"l{i}_mn"])
            mats = {}
            for f in _MAT_FIELDS:
                shape = z[f"l{i}_{f}_shape"]
                mats[f] = CSR(int(shape[0]), int(shape[1]),
                              z[f"l{i}_{f}_indptr"], z[f"l{i}_{f}_indices"],
                              z[f"l{i}_{f}_data"])
            vecs = {f: z[f"l{i}_{f}"].copy() for f in _VEC_FIELDS}
            prec = LevelPrec(m=m, n=n, **mats, **vecs)
            if f"l{i}_dense" in z:
                prec.dense_matrix = z[f"l{i}_dense"].copy()
                kind = str(z[f"l{i}_dense_kind"]) if f"l{i}_dense_kind" in z \
                    else "qrcp"
                solver = {"qrcp": QRCP, "syeig": SYEIG, "lup": LUP}[kind]()
                solver.factorize(prec.dense_matrix)
                prec.dense_solver = solver
            M.precs.append(prec)
        if M.precs:
            M._nrows = M._ncols = M.precs[0].n
    return M
