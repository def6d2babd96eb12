"""Beginner demo: verbose factorization logging
(ref examples/beginner/demo_verbose.cpp): enable the INFO|PRE|PRE_TIME
bitmask and watch per-level preprocessing/factorization reports."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hifir_tpu.api import HIF
from hifir_tpu.options import (VERBOSE_INFO, VERBOSE_PRE, VERBOSE_PRE_TIME,
                               Options)
from hifir_tpu.utils import io as hio

REF = "/root/reference/examples/demo_inputs"


def main():
    A = hio.read_mm(os.path.join(REF, "A.mm"))
    opts = Options(verbose=VERBOSE_INFO | VERBOSE_PRE | VERBOSE_PRE_TIME)
    M = HIF().factorize(A, opts)
    x = M.solve(np.ones(A.nrows))
    print(f"done: levels={M.levels()} |x|_inf={np.abs(x).max():.6g}")


if __name__ == "__main__":
    main()
