"""Advanced demo: FGMRES preconditioned through a SPARSIFIER (ref
examples/advanced/demo_fgmres_sparsifier.cpp): factorize the 2nd-order
FDM operator and use it inside adaptive-inner-IR FGMRES to solve the
4th-order system."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hifir_tpu.api import HIF
from hifir_tpu.options import Options
from hifir_tpu.solvers import fgmres_hifir
from hifir_tpu.utils import io as hio

REF = "/root/reference/examples/demo_inputs"


def main():
    A4 = hio.read_mm(os.path.join(REF, "ad-fdm4.mm"))   # the hard operator
    A2 = hio.read_mm(os.path.join(REF, "ad-fdm2.mm"))   # the sparsifier
    M = HIF().factorize(A2, Options(verbose=0))
    print(f"sparsifier factorized: levels={M.levels()} "
          f"fill(vs A2)={M.nnz()/A2.nnz:.2f}")
    b = np.ones(A4.nrows)
    x, flag, iters, nmv = fgmres_hifir(A4, M, b, restart=30, rtol=1e-6,
                                       maxit=200)
    res = np.linalg.norm(b - A4.matvec(x)) / np.linalg.norm(b)
    print(f"FGMRES-HIFIR(sparsifier): iters={iters} ({nmv} matvecs) "
          f"flag={flag} rel.res={res:.3e}")


if __name__ == "__main__":
    main()
