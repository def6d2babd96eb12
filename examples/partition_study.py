"""Partition iteration-growth study (BASELINE config 5 leg; VERDICT r3 #8).

Sweeps partition count x Schwarz overlap x coarse-space dimension on
2-D Poisson and records GMRES(30) iterations vs the global (1-part)
preconditioner.  Results land in BASELINE.md.

    python examples/partition_study.py [nx=256] [quick=0]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hifir_tpu.api import HIF
from hifir_tpu.models import poisson2d
from hifir_tpu.options import Options
from hifir_tpu.parallel.partition import PartitionedHIF
from hifir_tpu.solvers import gmres_hif


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    quick = len(sys.argv) > 2 and sys.argv[2] == "1"
    A = poisson2d(nx)
    b = np.ones(A.nrows)
    o = Options(verbose=0, tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3,
                kappa=5, kappa_d=5)
    M = HIF().factorize(A, o)
    x, f, it_g = gmres_hif(A, M, b, restart=30, rtol=1e-6, maxit=500)
    print(f"nx={nx} n={A.nrows} global: iters={it_g} fill={M.nnz()/A.nnz:.2f}",
          flush=True)

    parts_list = (8, 16) if quick else (4, 8, 16)
    ov_list = (1, 2) if quick else (1, 2, 4)
    q_list = (1, 2) if quick else (1, 2, 3)
    for nparts in parts_list:
        for ov_mult in ov_list:
            # auto overlap = bandwidth; scale it
            base_bw = 2 * nx  # poisson2d RCM bandwidth ~ nx; generous base
            overlap = None if ov_mult == 1 else ov_mult * (nx + 1)
            for q in q_list:
                t0 = time.time()
                P = PartitionedHIF().factorize(A, nparts, o, overlap=overlap,
                                               coarse_dim=q)
                tf = time.time() - t0
                x, flag, it = gmres_hif(A, P, b, restart=30, rtol=1e-6,
                                        maxit=500)
                ov_eff = P.overlap
                print(f"parts={nparts:3d} overlap={ov_eff:5d} q={q} : "
                      f"iters={it:4d} (x{it/it_g:.2f} global) flag={flag} "
                      f"fact {tf:.1f}s", flush=True)


if __name__ == "__main__":
    main()
