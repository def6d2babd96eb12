"""Iterative refinement (the "IR" in HIFIR).

Ref ``/root/reference/src/hif/alg/IterRefine.hpp:45-190``: stationary iteration
``x_{k+1} = x_k + M^{-1}(b - A x_k)`` with an optional residual-bounded variant
returning (iterations, flag): flag 0 converged (``||r||/||b|| <= beta[0]``),
>0 diverged (``> beta[1]``), <0 hit the iteration cap.  The reference runs in
boosted precision (``HIF_HIGH_PRECISION_SOLVE``); on host we use float64
throughout, and the device path offers compensated accumulation.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import numpy as np

__all__ = ["iter_refine"]


def iter_refine(M, A, b: np.ndarray, N: int,
                betas: Optional[Tuple[float, float]] = None,
                trans: bool = False, r: int = 0
                ) -> Tuple[np.ndarray, int, int]:
    """Run up to N refinement steps; returns ``(x, iters, flag)``.

    ``A`` may be a host CSR matrix or any callable ``x -> A x`` (the reference
    accepts user mat-vec callbacks, ``builder.hpp:462-463``).
    """
    matvec: Callable[[np.ndarray], np.ndarray]
    if callable(A) and not hasattr(A, "matvec"):
        matvec = A
    elif trans:
        matvec = lambda v: A.matvec_tran(v, conj=np.iscomplexobj(A.data))
    else:
        matvec = A.matvec

    b = np.asarray(b)
    x = np.zeros_like(b)
    beta_ok = betas is not None
    nrm_b = float(np.linalg.norm(b)) if beta_ok else 0.0
    flag = -1
    it = 0
    res = b
    for it in range(1, N + 1):
        if it > 1:
            res = b - matvec(x)
        x = x + M.solve(res, trans=trans, r=r)
        if beta_ok:
            res_new = b - matvec(x)
            rel = float(np.linalg.norm(res_new)) / max(nrm_b, 1e-300)
            if rel <= betas[0]:
                flag = 0
                break
            if rel > betas[1]:
                flag = 1
                break
    return x, it, flag
