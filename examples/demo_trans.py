"""Transpose-solve demo (ref examples/beginner/demo_trans.cpp)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hifir_tpu import HIF
from hifir_tpu.options import Options
from hifir_tpu.solvers import gmres_hif
from hifir_tpu.utils import io as hio

REF = "/root/reference/examples/demo_inputs"


class _TransOp:
    """A^T as a matvec operator."""

    def __init__(self, A):
        self.A = A

    def matvec(self, x):
        return self.A.matvec_tran(x)


class _TransPrec:
    def __init__(self, M):
        self.M = M

    def solve(self, b):
        return self.M.solve(b, trans=True)


def main():
    A = hio.read_mm(os.path.join(REF, "A.mm"))
    b = hio.read_mm_vector(os.path.join(REF, "b.mm"))
    M = HIF().factorize(A, Options(tau_L=1e-2, tau_U=1e-2, alpha_L=3,
                                   alpha_U=3, kappa=5, kappa_d=5, verbose=0))
    x, flag, iters = gmres_hif(_TransOp(A), _TransPrec(M), b, restart=30,
                               rtol=1e-6)
    res = np.linalg.norm(b - A.matvec_tran(x)) / np.linalg.norm(b)
    print(f"A^T solve via GMRES + M^-T: flag={flag} iters={iters} "
          f"rel.res={res:.2e}")


if __name__ == "__main__":
    main()
