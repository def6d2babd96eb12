"""Model problem generators for tests and benchmarks."""
from .problems import (convdiff2d, poisson2d, poisson3d, random_sparse,
                       random_strict_triangular, saddle_point_stokes)
