"""Mixed-precision demo (ref examples/intermediate/demo_mixedprecision.cpp):
a single-precision preconditioner solving a double-precision system through
iterative refinement (the lhfsd mode of the reference C library)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hifir_tpu import capi
from hifir_tpu.models import poisson2d
from hifir_tpu.options import Options


def main():
    A = poisson2d(48)
    h = capi.create(A=A, params=Options(verbose=0), precision="mixed")
    capi.setup(h)
    b = np.random.default_rng(0).standard_normal(A.nrows)
    x, iters, flag = capi.apply(h, capi.OP_S, b, nirs=100, betas=(1e-12, 1e8))
    res = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    print(f"mixed f32-M / f64-IR: {iters} refinements, flag={flag}, "
          f"rel.res={res:.2e}")
    capi.destroy(h)


if __name__ == "__main__":
    main()
