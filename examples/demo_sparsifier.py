"""Sparsifier demo (ref examples/advanced/demo_sparsifier.cpp): factorize a
cheaper operator (2nd-order Poisson) to precondition a harder one."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hifir_tpu import capi
from hifir_tpu.models import convdiff2d, poisson2d
from hifir_tpu.options import Options


def main():
    nx = 64
    A = convdiff2d(nx, wind=(2.0, 3.0))
    S = poisson2d(nx)
    h = capi.create(A=A, S=S, params=Options(verbose=0))
    capi.setup(h)
    print(f"sparsifier factorized: levels={capi.get_levels(h)} "
          f"nnz={capi.get_nnz(h)}")
    b = np.ones(A.nrows)
    x, iters, flag = capi.apply(h, capi.OP_S, b, nirs=500,
                                betas=(1e-10, 1e8))
    res = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    print(f"HIFIR with sparsifier: {iters} refinements, flag={flag}, "
          f"res={res:.2e}")
    capi.destroy(h)


if __name__ == "__main__":
    main()
