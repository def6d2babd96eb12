"""Intermediate demo: multilevel matrix-vector product (ref examples/
intermediate/demo_multiply.cpp): x = M b then M^{-1} x must reproduce b
to near machine precision for a nonsingular M."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hifir_tpu.api import HIF
from hifir_tpu.options import Options
from hifir_tpu.utils import io as hio

REF = "/root/reference/examples/demo_inputs"


def main():
    A = hio.read_mm(os.path.join(REF, "A.mm"))
    b = hio.read_mm_vector(os.path.join(REF, "b.mm"))
    M = HIF().factorize(A, Options(verbose=0))
    x = M.mmultiply(b)          # x = M b
    b2 = M.solve(x)             # M^{-1} x ~= b
    err = np.linalg.norm(b2 - b) / np.linalg.norm(b)
    print(f"relative roundtrip error is {err:.3g}")
    # transpose pair too
    xt = M.mmultiply(b, trans=True)
    b3 = M.solve(xt, trans=True)
    errt = np.linalg.norm(b3 - b) / np.linalg.norm(b)
    print(f"transpose roundtrip error is {errt:.3g}")


if __name__ == "__main__":
    main()
