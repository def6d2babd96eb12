"""Pallas BSR SpMV (ops/pallas_spmv.py) — interpret-mode correctness.

On the real chip the BSR block-matmul path measured 6.7% faster than
sliced-ELL for the banded natural-ordered operator at mrhs=128 (see
BASELINE.md); here the kernel runs in Pallas interpret mode on the CPU
backend and is checked against the dense product, including through the
``ell_matvec`` operator dispatch.
"""
import numpy as np
import pytest

from hifir_tpu.models import poisson2d
from hifir_tpu.ops.pallas_spmv import bsr_from_csr, bsr_matvec_mrhs
from hifir_tpu.ops.spmv import ell_matvec, ell_matvec_mrhs

jnp = pytest.importorskip("jax.numpy")


def test_bsr_matvec_mrhs_interpret():
    A = poisson2d(24)  # n=576, not a multiple of bs -> exercises padding
    B = bsr_from_csr(A, bs=128, dtype=np.float32)
    n = A.nrows
    rng = np.random.default_rng(3)
    X = rng.standard_normal((n, 8)).astype(np.float32)
    npad = B.nbr * B.bs
    Xp = jnp.asarray(np.pad(X, ((0, npad - n), (0, 0))))
    Y = np.asarray(bsr_matvec_mrhs(B, Xp, interpret=True))[:n]
    Yref = A.to_scipy().astype(np.float32) @ X
    assert np.abs(Y - Yref).max() <= 1e-4 * np.abs(Yref).max()


def test_bsr_operator_dispatch():
    A = poisson2d(16)
    B = bsr_from_csr(A, bs=64, dtype=np.float64)
    n = A.nrows
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n)
    y = np.asarray(ell_matvec(B, jnp.asarray(x)))
    np.testing.assert_allclose(y, A.to_scipy() @ x, rtol=1e-12)
    X = rng.standard_normal((n, 3))
    Y = np.asarray(ell_matvec_mrhs(B, jnp.asarray(X)))
    np.testing.assert_allclose(Y, A.to_scipy() @ X, rtol=1e-12)
