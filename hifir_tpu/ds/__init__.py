"""Data structures: host CSR + device pytrees (ref layer 2, SURVEY.md §1)."""
from .csr import CSR, csr_from_dense
