"""Bare HIFIR demo (ref examples/advanced/demo_hifir.cpp): apply M^{-1} with
iterative refinement and residual bounds."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hifir_tpu import HIF
from hifir_tpu.options import Options
from hifir_tpu.utils import io as hio

REF = "/root/reference/examples/demo_inputs"


def main():
    A = hio.read_mm(os.path.join(REF, "A.mm"))
    b = hio.read_mm_vector(os.path.join(REF, "b.mm"))
    M = HIF().factorize(A, Options(verbose=0))
    x, iters, flag = M.hifir(A, b, 10, betas=(1e-6, 1e8))
    res = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    print(f"HIFIR converged in {iters} refinement(s), flag={flag}, "
          f"rel.res={res:.2e} (reference: 1 iteration, 7.38e-08)")


if __name__ == "__main__":
    main()
