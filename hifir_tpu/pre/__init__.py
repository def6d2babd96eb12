"""Preprocessing: matching/scaling + reordering (ref layer 3, SURVEY.md §1)."""
from .driver import do_preprocessing, defer_tiny_diags, fix_poor_scaling
from .matching import mc64_matching, do_matching
from .ordering import run_amd, run_rcm
from .scaling import scale_eye, scale_extreme_values, iterative_scale
