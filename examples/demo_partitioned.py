"""Partitioned (domain-decomposed) HIF factorization demo.

Bands a 2-D Poisson system, factorizes overlapped diagonal blocks
independently (concurrently across threads here; across hosts in a
`jax.distributed` deployment), and solves with GMRES preconditioned by the
restricted-additive-Schwarz apply + piecewise-constant coarse correction.
Net-new over the reference (strictly single-node, SURVEY.md §2.7); covers
BASELINE.md target config 5's partitioned-factorize leg.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hifir_tpu.models import poisson2d
from hifir_tpu.options import Options
from hifir_tpu.parallel import PartitionedHIF
from hifir_tpu.solvers import gmres_hif


def main():
    A = poisson2d(256)
    b = np.ones(A.nrows)
    opts = Options(verbose=0, tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3,
                   kappa=5, kappa_d=5, dense_thres=500)
    for nparts in (1, 4, 8):
        t0 = time.perf_counter()
        P = PartitionedHIF().factorize(A, nparts, opts)
        t_fac = time.perf_counter() - t0
        x, flag, iters = gmres_hif(A, P, b, restart=30, rtol=1e-6, maxit=500)
        res = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
        print(f"nparts={nparts:2d} overlap={P.overlap:4d}: "
              f"factorize {t_fac:.2f}s fill {P.nnz() / A.nnz:.2f}  "
              f"GMRES(30) flag={flag} iters={iters} rel.res={res:.2e}")


if __name__ == "__main__":
    main()
