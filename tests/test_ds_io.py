"""Data-structure and IO unit tests.

Mirrors the reference dense-oracle test pattern (``tests/common.hpp:47-79``):
random sparse input -> kernel -> compare against dense/scipy reference.
Covers the reference tests test_array/test_crs/test_ccs/test_cs_convert/
test_cs_perm/test_io_mm/test_io_mm_vec/test_native_io/test_scale_diag.
"""

import os

import numpy as np
import pytest

from hifir_tpu.ds import CSR
from hifir_tpu.models import random_sparse, random_strict_triangular
from hifir_tpu.utils import io as hio

REF_DEMO = "/root/reference/examples/demo_inputs"


def test_from_coo_dups_and_dense_roundtrip():
    rows = np.array([0, 0, 1, 2, 0])
    cols = np.array([1, 1, 2, 0, 2])
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    A = CSR.from_coo(3, 3, rows, cols, vals)
    D = A.todense()
    assert D[0, 1] == 3.0 and D[1, 2] == 3.0 and D[2, 0] == 4.0 and D[0, 2] == 5.0
    assert A.nnz == 4


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matvec_vs_dense(seed):
    A = random_sparse(50, 6, seed=seed)
    x = np.random.default_rng(seed).standard_normal(50)
    np.testing.assert_allclose(A.matvec(x), A.todense() @ x, rtol=1e-12)
    np.testing.assert_allclose(A.matvec_tran(x), A.todense().T @ x, rtol=1e-12)


def test_transpose_and_permute_vs_dense():
    A = random_sparse(40, 5, seed=3)
    np.testing.assert_allclose(A.transpose().todense(), A.todense().T)
    rng = np.random.default_rng(0)
    p = rng.permutation(40)
    q = rng.permutation(40)
    q_inv = np.empty(40, dtype=np.int64)
    q_inv[q] = np.arange(40)
    P = A.permute(p, q_inv)
    np.testing.assert_allclose(P.todense(), A.todense()[np.ix_(p, q)])


def test_scale_diag_vs_dense():
    A = random_sparse(30, 4, seed=4)
    s = np.random.default_rng(1).random(30) + 0.5
    t = np.random.default_rng(2).random(30) + 0.5
    np.testing.assert_allclose(A.scale_diag_left(s).todense(),
                               np.diag(s) @ A.todense())
    np.testing.assert_allclose(A.scale_diag_right(t).todense(),
                               A.todense() @ np.diag(t))


def test_triangular_solves_vs_dense():
    n = 60
    L = random_strict_triangular(n, lower=True, seed=5)
    U = random_strict_triangular(n, lower=False, seed=6)
    b = np.random.default_rng(7).standard_normal(n)
    xl = L.solve_as_strict_lower(b)
    np.testing.assert_allclose((np.eye(n) + np.tril(L.todense(), -1)) @ xl, b,
                               atol=1e-10)
    xu = U.solve_as_strict_upper(b)
    np.testing.assert_allclose((np.eye(n) + np.triu(U.todense(), 1)) @ xu, b,
                               atol=1e-10)


def test_extract_leading_and_prune():
    A = random_sparse(25, 5, seed=8)
    B = A.extract_leading(10)
    np.testing.assert_allclose(B.todense(), A.todense()[:10, :10])
    P = A.prune(0.5)
    D = A.todense()
    D[np.abs(D) <= 0.5] = 0.0
    np.testing.assert_allclose(P.todense(), D)


@pytest.mark.skipif(not os.path.isdir(REF_DEMO), reason="reference inputs absent")
def test_read_mm_demo_vs_scipy():
    import scipy.io as sio

    A = hio.read_mm(os.path.join(REF_DEMO, "A.mm"))
    assert A.shape == (2990, 2990) and A.nnz == 44632
    S = sio.mmread(os.path.join(REF_DEMO, "A.mm")).tocsr()
    np.testing.assert_allclose((A.to_scipy() - S).toarray().max(), 0.0, atol=1e-15)
    b = hio.read_mm_vector(os.path.join(REF_DEMO, "b.mm"))
    bs = np.asarray(sio.mmread(os.path.join(REF_DEMO, "b.mm"))).squeeze()
    np.testing.assert_allclose(b, bs)


def test_mm_roundtrip(tmp_path):
    A = random_sparse(20, 4, seed=9)
    f = tmp_path / "a.mm"
    hio.write_mm(str(f), A)
    B = hio.read_mm(str(f))
    np.testing.assert_allclose(A.todense(), B.todense(), rtol=1e-15)
    v = np.random.default_rng(3).standard_normal(20)
    fv = tmp_path / "v.mm"
    hio.write_mm_vector(str(fv), v)
    np.testing.assert_allclose(hio.read_mm_vector(str(fv)), v, rtol=1e-15)


def test_native_roundtrip(tmp_path):
    A = random_sparse(20, 4, seed=10)
    f = tmp_path / "a.npz"
    hio.write_native(str(f), A)
    B = hio.read_native(str(f))
    np.testing.assert_allclose(A.todense(), B.todense())


def test_pattern_symm_ratio():
    # symmetric pattern => ratio 1
    A = random_sparse(30, 4, seed=11)
    S = CSR.from_scipy(A.to_scipy() + A.to_scipy().T)
    assert S.pattern_symm_ratio() == pytest.approx(1.0)
