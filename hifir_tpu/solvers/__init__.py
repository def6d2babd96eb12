"""Krylov solvers consuming the HIF preconditioner (ref examples/advanced,
promoted to library code per SURVEY.md §7.2 L6)."""
from .gmres_np import gmres_hif, fgmres_hifir
from .gmres import (gmres_hif_device, fgmres_hifir_device, ir_apply_device,
                    gmres_mrhs_device)
