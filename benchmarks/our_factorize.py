"""Head-to-head driver for hifir_tpu: time one robust-params factorize.

Mirrors benchmarks/ref_factorize.cpp (same operator, same robust defaults,
reference src/hif/Options.h:135-163).  Prints one line per rep:
"rep <i> factorize <seconds> nnzM <nnz> levels <L>".
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from hifir_tpu.api import HIF
from hifir_tpu.models.problems import convdiff2d, poisson2d
from hifir_tpu.options import Options


def main() -> None:
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    dtype = sys.argv[3] if len(sys.argv) > 3 else "float64"
    A = convdiff2d(nx) if dtype.startswith("c") else poisson2d(nx)
    if dtype.startswith("c"):
        dtype = "float64"
    opts = Options()  # robust defaults
    if dtype != "float64":
        opts.dtype = dtype
    for r in range(reps):
        M = HIF()
        t0 = time.perf_counter()
        M.factorize(A, params=opts)
        dt = time.perf_counter() - t0
        print(f"rep {r} factorize {dt:.3f} nnzM {M.nnz()} levels {M.levels()}",
              flush=True)


if __name__ == "__main__":
    main()
