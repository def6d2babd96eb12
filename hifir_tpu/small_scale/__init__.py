"""Dense last-level solvers (ref layer 4, SURVEY.md §1)."""
from .dense import QRCP, LUP, SYEIG, make_dense_solver
