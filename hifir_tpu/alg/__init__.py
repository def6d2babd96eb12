"""Core algorithms: Crout factorization, Schur, M-solve, IR (ref layer 5)."""
from .factor import LevelPrec, level_factorize
from .crout_np import crout_level_np, CroutResult
from .prec_solve_np import prec_solve_np, prec_prod_np
from .iter_refine import iter_refine
