"""Beginner demo: complex-valued HIF (ref examples/intermediate/
demo_complex.cpp): factorize the SuiteSparse young1c system and apply
the preconditioner."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hifir_tpu.api import HIF
from hifir_tpu.options import Options
from hifir_tpu.utils import io as hio

REF = "/root/reference/examples/demo_inputs"


def main():
    A = hio.read_mm(os.path.join(REF, "young1c.mtx"))
    assert np.iscomplexobj(A.data)
    # young1c is complex SYMMETRIC (A == A^T): symm_detect classifies it and
    # the one-sided LDL^T kernel runs automatically (the reference requires
    # the user flag — and its own complex is_symm factorizes WRONG, see
    # BASELINE.md round-5; hifir_tpu's complex modes are correct)
    M = HIF().factorize(A, Options(verbose=0))
    b = np.ones(A.nrows, dtype=np.complex128)
    x = M.solve(b)
    print(f"complex HIF (auto-LDL^T): n={A.nrows} levels={M.levels()} "
          f"fill={M.nnz()/A.nnz:.2f} |x|_inf={np.abs(x).max():.4g}")

    from hifir_tpu.solvers import gmres_hif

    rhs = A.matvec(np.ones(A.nrows, dtype=np.complex128))
    _, flag, iters = gmres_hif(A, M, rhs, restart=30, rtol=1e-6, maxit=200)
    print(f"GMRES(30): flag={flag} iters={iters} (reference binary: 2)")

    # Hermitian input (A == A^H) dispatches the conjugated LDL^H mode
    import scipy.sparse as sp

    S = A.to_scipy().tocsr()
    H = (S + S.conj().T) * 0.5 + sp.eye(A.nrows, format="csr") * 4.0
    from hifir_tpu.ds.csr import CSR

    Ah = CSR.from_scipy(H.tocsr())
    Mh = HIF().factorize(Ah, Options(verbose=0))
    bh = Ah.matvec(np.ones(Ah.nrows, dtype=np.complex128))
    xh, it_h, flag_h = Mh.hifir(Ah, bh, 50, betas=(1e-12, 1e8))
    res = np.linalg.norm(bh - Ah.matvec(xh)) / np.linalg.norm(bh)
    print(f"Hermitian LDL^H: levels={Mh.levels()} fill={Mh.nnz()/Ah.nnz:.2f} "
          f"IR flag={flag_h} rel.res={res:.2e}")


if __name__ == "__main__":
    main()
