"""Beginner demo: factorize + solve (ref examples/beginner/demo_simple.cpp).

Usage: python examples/demo_simple.py [-Afile A.mm] [-bfile b.mm]
Falls back to the vendored reference demo inputs when present.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hifir_tpu.api import HIF
from hifir_tpu.options import Options
from hifir_tpu.solvers import gmres_hif
from hifir_tpu.utils import io as hio

REF = "/root/reference/examples/demo_inputs"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-Afile", default=os.path.join(REF, "A.mm"))
    ap.add_argument("-bfile", default=os.path.join(REF, "b.mm"))
    ap.add_argument("--robust", action="store_true",
                    help="use robust default parameters instead of optimized")
    args = ap.parse_args()

    A = hio.read_mm(args.Afile)
    b = hio.read_mm_vector(args.bfile)
    if args.robust:
        opts = Options(verbose=0)
    else:
        opts = Options(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3,
                       kappa=5, kappa_d=5, verbose=0)
    M = HIF().factorize(A, opts)
    print(f"HIF(lvls={M.levels()}) nnz ratio {100 * M.nnz() / A.nnz:.2f}%")
    x, flag, iters = gmres_hif(A, M, b, restart=30, rtol=1e-6)
    res = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    print(f"GMRES(30): flag={flag} iters={iters} rel.res={res:.3e}")


if __name__ == "__main__":
    main()
