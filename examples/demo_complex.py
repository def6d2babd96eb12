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
    M = HIF().factorize(A, Options(verbose=0))
    b = np.ones(A.nrows, dtype=np.complex128)
    x = M.solve(b)
    print(f"complex HIF: n={A.nrows} levels={M.levels()} "
          f"fill={M.nnz()/A.nnz:.2f} |x|_inf={np.abs(x).max():.4g}")


if __name__ == "__main__":
    main()
