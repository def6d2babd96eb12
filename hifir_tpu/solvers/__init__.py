"""Krylov solvers consuming the HIF preconditioner (ref examples/advanced)."""
from .gmres_np import gmres_hif, fgmres_hifir
