"""Fill-reducing orderings (ref ``/root/reference/src/hif/pre/reordering.hpp``,
``pre/amd.hpp``, ``pre/rcm.hpp``).

AMD (approximate minimum degree, Amestoy-Davis-Duff) runs in the native C++
library; a scipy reverse-Cuthill-McKee fallback keeps the Python-only path
functional.  Input is the (sorted, symmetric-pattern) leading-block graph.
"""

from __future__ import annotations

import numpy as np

from ..ds.csr import CSR
from . import _native

__all__ = ["run_amd", "run_rcm", "symmetrize_pattern"]


def symmetrize_pattern(B: CSR) -> CSR:
    """Pattern of B + B^T with unit values (orderings need symmetric graphs)."""
    import scipy.sparse as sp

    S = B.to_scipy()
    P = (S + S.T).tocsr()
    P.data = np.ones_like(P.data)
    P.sort_indices()
    return CSR(B.nrows, B.ncols, P.indptr.astype(np.int64), P.indices, P.data)


def run_rcm(B: CSR) -> np.ndarray:
    """Reverse Cuthill-McKee on the symmetrized pattern
    (ref ``pre/rcm.hpp`` George-Liu BFS with pseudo-peripheral root)."""
    P = symmetrize_pattern(B)
    perm = _native.rcm(P.nrows, P.indptr, P.indices)
    if perm is not None:
        return perm
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(
        reverse_cuthill_mckee(P.to_scipy(), symmetric_mode=True),
        dtype=np.int64)


def run_amd(B: CSR) -> np.ndarray:
    """Approximate minimum degree ordering (ref ``pre/amd.hpp``: templated port
    of AMD TOMS 837).  Falls back to RCM when the native library is absent.

    ``HT_AMD_PERM_FILE`` (debug/experiment hook): load the ordering for a
    matching-size block from ``<file>.<n>.npy`` instead of computing it —
    used to replay an external ordering (e.g. the reference library's) for
    quality attribution experiments."""
    import os

    pf = os.environ.get("HT_AMD_PERM_FILE")
    if pf:
        path = f"{pf}.{B.nrows}.raw"
        if os.path.exists(path):
            return np.fromfile(path, dtype=np.int64)
    P = symmetrize_pattern(B)
    perm = _native.amd(P.nrows, P.indptr, P.indices)
    if perm is not None:
        return perm
    return run_rcm(B)
