"""Preprocessing unit tests.

Validates the MC64-equivalent matching by its defining dual-feasibility
properties (scaled matched entries = 1, all scaled entries <= 1), the static
deferral of tiny diagonals, and the ordering wrappers.
"""

import numpy as np
import pytest

from hifir_tpu.ds import CSR
from hifir_tpu.models import poisson2d, random_sparse, saddle_point_stokes
from hifir_tpu.options import Options
from hifir_tpu.pre import (defer_tiny_diags, do_preprocessing, mc64_matching,
                           run_amd, run_rcm)


def _check_mc64(A, p, s, t, tol=1e-10):
    D = np.abs(np.diag(s) @ A.todense() @ np.diag(t))
    n = A.nrows
    # matched entries have magnitude 1
    np.testing.assert_allclose(D[p, np.arange(n)], 1.0, rtol=tol)
    # all entries bounded by 1 (dual feasibility)
    assert D.max() <= 1.0 + 1e-8


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mc64_properties_random(seed):
    A = random_sparse(60, 5, seed=seed)
    p, s, t, info = mc64_matching(A)
    assert info == 0
    assert np.array_equal(np.sort(p), np.arange(60))
    _check_mc64(A, p, s, t)


def test_mc64_poisson():
    A = poisson2d(12)
    p, s, t, info = mc64_matching(A)
    assert info == 0
    _check_mc64(A, p, s, t)


def test_mc64_needs_augmenting_paths():
    # matrix whose greedy max-entry matching collides => requires Dijkstra
    M = np.array([
        [10.0, 9.0, 0.0],
        [10.0, 0.0, 1.0],
        [0.0, 2.0, 3.0],
    ])
    from hifir_tpu.ds.csr import csr_from_dense

    A = csr_from_dense(M)
    p, s, t, info = mc64_matching(A)
    assert info == 0
    _check_mc64(A, p, s, t)


def test_defer_tiny_diags_saddle():
    A = saddle_point_stokes(8)
    n = A.nrows
    p = np.arange(n)
    q = np.arange(n)
    m, p2, q2 = defer_tiny_diags(A, n, p, q)
    # the zero (2,2) block diagonals must all be deferred
    nzero = n - poisson2d(8).nrows
    assert m == n - nzero
    D = A.todense()
    assert np.all(np.abs(np.diag(D)[p2[:m]]) > 0)


def test_orderings_are_permutations():
    A = poisson2d(10)
    for perm in (run_amd(A), run_rcm(A)):
        assert np.array_equal(np.sort(perm), np.arange(A.nrows))


def test_rcm_reduces_bandwidth():
    rng = np.random.default_rng(0)
    p0 = rng.permutation(100)
    A = poisson2d(10)
    S = A.to_scipy()[p0][:, p0].tocsr()
    B = CSR.from_scipy(S)
    perm = run_rcm(B)
    Sp = S[perm][:, perm].tocoo()
    bw_after = np.abs(Sp.row - Sp.col).max()
    S0 = S.tocoo()
    bw_before = np.abs(S0.row - S0.col).max()
    assert bw_after <= bw_before


def test_do_preprocessing_contract():
    A = saddle_point_stokes(8)
    n = A.nrows
    opts = Options()
    s, t, p, q, m = do_preprocessing(A, n, 1, opts, is_symm_pre=False)
    assert np.array_equal(np.sort(p), np.arange(n))
    assert np.array_equal(np.sort(q), np.arange(n))
    assert 0 < m <= n
    # leading diagonals are nonzero after matching + deferral
    D = np.abs(np.diag(s) @ A.todense() @ np.diag(t))
    assert np.all(D[p[:m], q[:m]] > 0.0)
