"""Intermediate demo: parameter tuning (ref examples/intermediate/
demo_params.cpp): set options through the string-keyed setter (the
bindings interface, ref Options.h:446) and compare against the robust
defaults."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hifir_tpu.api import HIF
from hifir_tpu.options import Options, get_default_options
from hifir_tpu.solvers import gmres_hif
from hifir_tpu.utils import io as hio

REF = "/root/reference/examples/demo_inputs"


def main():
    A = hio.read_mm(os.path.join(REF, "A.mm"))
    b = hio.read_mm_vector(os.path.join(REF, "b.mm"))

    robust = get_default_options()
    robust.verbose = 0

    tuned = Options(verbose=0)
    # string-keyed setter returns True on FAILURE (reference convention)
    for k, v in (("tau_L", "1e-2"), ("tau_U", "1e-2"), ("alpha_L", "3"),
                 ("alpha_U", "3"), ("kappa", "5"), ("kappa_d", "5"),
                 ("dense_thres", "500")):
        assert not tuned.set(k, v), k
    assert tuned.set("no_such_option", 1)  # unknown names are flagged

    for name, opts in (("robust", robust), ("optimized", tuned)):
        M = HIF().factorize(A, opts)
        x, flag, iters = gmres_hif(A, M, b, restart=30, rtol=1e-6)
        print(f"{name:9s}: fill {M.nnz()/A.nnz:.2f} levels {M.levels()} "
              f"GMRES(30) iters={iters} flag={flag}")


if __name__ == "__main__":
    main()
