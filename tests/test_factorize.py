"""Factorization and multilevel-solve correctness tests.

Oracle strategy per SURVEY.md §4: complete (no-dropping) factorization must
reproduce exact block LDU identities and exact solves; dropped factorization
must deliver reference-level GMRES convergence on the vendored demo system.
"""

import os

import numpy as np
import pytest

from hifir_tpu.api import HIF
from hifir_tpu.ds import CSR
from hifir_tpu.models import (convdiff2d, poisson2d, random_sparse,
                              saddle_point_stokes)
from hifir_tpu.options import Options
from hifir_tpu.solvers import fgmres_hifir, gmres_hif

REF_DEMO = "/root/reference/examples/demo_inputs"


def complete_opts(**kw):
    base = dict(tau_L=0.0, tau_U=0.0, alpha_L=-1.0, alpha_U=-1.0,
                kappa=1e18, kappa_d=1e18, rf_par=0, verbose=0)
    base.update(kw)
    return Options(**base)


def test_complete_factorization_block_identities():
    """L_B D U_B = B, E = L_E D U_B, F = L_B D U_F in exact arithmetic."""
    from hifir_tpu.alg.factor import level_factorize
    import scipy.sparse as sp

    A = saddle_point_stokes(6)
    n = A.nrows
    opts = complete_opts(dense_thres=5)
    stats = np.zeros(6, dtype=np.int64)
    prec, S, _, _ = level_factorize(A, n, n, 1, opts, None, None, stats)
    m = prec.m
    assert 0 < m < n
    # reconstruct the permuted scaled matrix blocks
    Ahat = (sp.diags(prec.s) @ A.to_scipy() @ sp.diags(prec.t)
            ).tocsr()[prec.p, :][:, prec.q].toarray()
    B, F = Ahat[:m, :m], Ahat[:m, m:]
    E, C = Ahat[m:, :m], Ahat[m:, m:]
    I = np.eye(m)
    Lb = np.tril(prec.L_B.todense(), -1)
    Ub = np.triu(prec.U_B.todense(), 1)
    D = np.diag(prec.d)
    np.testing.assert_allclose((I + Lb) @ D @ (I + Ub), B, atol=1e-10)
    np.testing.assert_allclose(prec.E.todense(), E, atol=1e-12)
    np.testing.assert_allclose(prec.F.todense(), F, atol=1e-12)
    # exact Schur
    S_exact = C - E @ np.linalg.inv(B) @ F
    S_got = S.todense() if S is not None else prec.dense_matrix
    np.testing.assert_allclose(S_got, S_exact, atol=1e-8)


@pytest.mark.parametrize("gen,seed", [("random", 0), ("random", 3),
                                      ("saddle", 0), ("convdiff", 0)])
def test_complete_solve_exact(gen, seed):
    if gen == "random":
        A = random_sparse(80, 6, seed=seed)
    elif gen == "saddle":
        A = saddle_point_stokes(7, seed=seed)
    else:
        A = convdiff2d(9)
    n = A.nrows
    M = HIF().factorize(A, complete_opts(dense_thres=10))
    rng = np.random.default_rng(seed)
    b = rng.standard_normal(n)
    x = M.solve(b)
    xd = np.linalg.solve(A.todense(), b)
    np.testing.assert_allclose(x, xd, rtol=0, atol=1e-8 * np.abs(xd).max())
    # transpose solve
    xt = M.solve(b, trans=True)
    xtd = np.linalg.solve(A.todense().T, b)
    np.testing.assert_allclose(xt, xtd, rtol=0, atol=1e-8 * np.abs(xtd).max())
    # forward product roundtrip
    np.testing.assert_allclose(M.mmultiply(x), b, rtol=0,
                               atol=1e-8 * np.abs(b).max())


def test_solve_mrhs():
    A = random_sparse(50, 5, seed=1)
    M = HIF().factorize(A, complete_opts())
    B = np.random.default_rng(2).standard_normal((50, 3))
    X = M.solve_mrhs(B)
    np.testing.assert_allclose(A.todense() @ X, B, atol=1e-8)


def test_hifir_ir_converges():
    A = convdiff2d(12)
    opts = Options(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3, kappa=5,
                   kappa_d=5, verbose=0)
    M = HIF().factorize(A, opts)
    b = np.random.default_rng(0).standard_normal(A.nrows)
    x, iters, flag = M.hifir(A, b, 20, betas=(1e-12, 1e8))
    assert flag == 0
    res = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    assert res <= 1e-10


def test_stats_and_accessors():
    A = saddle_point_stokes(6)
    M = HIF().factorize(A, complete_opts(dense_thres=5))
    assert M.levels() >= 2  # dense tail counts as a level (builder.hpp:141)
    assert M.nnz() > 0 and M.nnz_ldu() > 0 and M.nnz_ef() > 0
    assert M.rank() == A.nrows  # nonsingular
    assert M.schur_size() >= 0
    assert M.stats(0) >= 0


def test_nsp_filter():
    from hifir_tpu.nsp import NspFilter

    A = poisson2d(6)
    M = HIF().factorize(A, complete_opts())
    M.nsp = NspFilter()
    b = np.random.default_rng(0).standard_normal(A.nrows)
    x = M.solve(b)
    assert abs(x.mean()) < 1e-12


@pytest.mark.skipif(not os.path.isdir(REF_DEMO), reason="reference inputs absent")
def test_stokes_demo_gmres_parity():
    """Reference baseline: GMRES(30) rtol=1e-6 converges in 2 iterations with
    fill ratio 2.278 (BASELINE.md measured table).  Accept <= 4 iterations."""
    from hifir_tpu.utils import io as hio

    A = hio.read_mm(os.path.join(REF_DEMO, "A.mm"))
    b = hio.read_mm_vector(os.path.join(REF_DEMO, "b.mm"))
    opts = Options(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3, kappa=5,
                   kappa_d=5, verbose=0)
    M = HIF().factorize(A, opts)
    x, flag, iters = gmres_hif(A, M, b, restart=30, rtol=1e-6)
    assert flag == 0
    assert iters <= 4
    res = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    assert res <= 1e-6
    assert M.nnz() / A.nnz < 3.5


@pytest.mark.skipif(not os.path.isdir(REF_DEMO), reason="reference inputs absent")
def test_stokes_demo_fgmres():
    from hifir_tpu.utils import io as hio

    A = hio.read_mm(os.path.join(REF_DEMO, "A.mm"))
    b = hio.read_mm_vector(os.path.join(REF_DEMO, "b.mm"))
    opts = Options(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3, kappa=5,
                   kappa_d=5, verbose=0)
    M = HIF().factorize(A, opts)
    x, flag, iters, nmv = fgmres_hifir(A, M, b, restart=30, rtol=1e-6)
    assert flag == 0 and iters <= 4
    res = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    assert res <= 1e-6


def test_pivoting_complete_exact():
    """Rook-pivoting kernel (ref PivotCrout.hpp) on a zero-diagonal matrix:
    complete factorization must still solve exactly, without deferrals."""
    from hifir_tpu.ds.csr import csr_from_dense
    from hifir_tpu.options import PIVOTING_ON

    A0 = random_sparse(70, 6, seed=0)
    D = A0.todense().copy()
    rng = np.random.default_rng(2)
    for i in rng.choice(70, size=12, replace=False):
        D[i, i] = 0.0
    if abs(np.linalg.det(D)) < 1e-8:
        pytest.skip("random matrix accidentally singular")
    A = csr_from_dense(D)
    opts = complete_opts(no_pre=1, pivot=PIVOTING_ON)
    M = HIF().factorize(A, opts)
    b = rng.standard_normal(70)
    x = M.solve(b)
    xd = np.linalg.solve(D, b)
    np.testing.assert_allclose(x, xd, atol=1e-9 * np.abs(xd).max())


def test_pivoting_dropped_ilu():
    from hifir_tpu.options import PIVOTING_ON

    A = saddle_point_stokes(7)
    opts = Options(verbose=0, pivot=PIVOTING_ON, dense_thres=20)
    M = HIF().factorize(A, opts)
    b = np.random.default_rng(3).standard_normal(A.nrows)
    x, iters, flag = M.hifir(A, b, 100, betas=(1e-10, 1e8))
    assert flag == 0
    assert np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b) <= 1e-10


@pytest.mark.parametrize("kind", ["diag", "tiny", "one", "denserow"])
def test_edge_cases(kind):
    """Degenerate inputs must factorize and solve."""
    from hifir_tpu.ds.csr import csr_from_dense

    rng = np.random.default_rng(0)
    if kind == "diag":
        D = np.diag(rng.random(30) + 1.0)
    elif kind == "tiny":
        D = np.array([[2.0, 1.0], [1.0, 3.0]])
    elif kind == "one":
        D = np.array([[4.0]])
    else:
        D = np.diag(rng.random(40) + 1.0)
        D[0, :] = rng.standard_normal(40)  # one dense row
        D[0, 0] = 50.0
    A = csr_from_dense(D)
    M = HIF().factorize(A, Options(verbose=0, dense_thres=0))
    b = rng.standard_normal(A.nrows)
    x = M.solve(b)
    xd = np.linalg.solve(D, b)
    np.testing.assert_allclose(x, xd, atol=1e-7 * max(1.0, np.abs(xd).max()))


def test_singular_pseudoinverse_accuracy():
    """epsilon-accurate pseudoinverse on a singular system: HIFIR solution
    must match the least-norm solution (BASELINE config 4)."""
    from hifir_tpu.ds.csr import csr_from_dense
    from hifir_tpu.nsp import NspFilter

    rng = np.random.default_rng(5)
    n = 40
    # rank-deficient symmetric system with known null space (constants)
    B = rng.standard_normal((n, n))
    D = B @ B.T
    D -= np.outer(D.sum(1), np.ones(n)) / n  # rows sum to 0
    D -= np.outer(np.ones(n), D.sum(0)) / n  # cols sum to 0
    A = csr_from_dense(D, tol=1e-14)
    b = rng.standard_normal(n)
    b -= b.mean()
    M = HIF().factorize(A, Options(verbose=0, dense_thres=50))
    M.nsp = NspFilter()
    x, iters, flag = M.hifir(A, b, 500, betas=(1e-10, 1e6))
    x_star = np.linalg.pinv(D) @ b
    res = np.linalg.norm(b - D @ x) / np.linalg.norm(b)
    assert res <= 1e-8
    np.testing.assert_allclose(x, x_star, atol=1e-6 * np.abs(x_star).max())


def test_auto_pivot_retry():
    """All-zero diagonal without preprocessing: the non-pivoting kernel
    defers everything (post_flag=2) and PIVOTING_AUTO must retry the level
    with rook pivoting (ref builder.hpp:552-567)."""
    from hifir_tpu.ds.csr import csr_from_dense

    rng = np.random.default_rng(0)
    n = 60
    D = rng.standard_normal((n, n))
    np.fill_diagonal(D, 0.0)
    A = csr_from_dense(D)
    opts = complete_opts(no_pre=1, dense_thres=0)  # pivot defaults to AUTO
    M = HIF().factorize(A, opts)
    b = rng.standard_normal(n)
    x = M.solve(b)
    xd = np.linalg.solve(D, b)
    np.testing.assert_allclose(x, xd, atol=1e-9 * np.abs(xd).max())


def test_native_pivot_matches_anchor():
    """Native rook-pivoting kernel must reproduce the Python anchor."""
    from hifir_tpu.options import PIVOTING_ON
    from hifir_tpu.pre import _native

    if not _native.has_pivot():
        pytest.skip("native library not built")
    A = saddle_point_stokes(7)
    o1 = Options(verbose=0, pivot=PIVOTING_ON, dense_thres=20)
    o2 = Options(verbose=0, pivot=PIVOTING_ON, dense_thres=20, use_native=0)
    M1 = HIF().factorize(A, o1)
    M2 = HIF().factorize(A, o2)
    assert M1.nnz() == M2.nnz()
    b = np.random.default_rng(5).standard_normal(A.nrows)
    np.testing.assert_allclose(M1.solve(b), M2.solve(b), rtol=1e-12,
                               atol=1e-12)


def test_symmetric_block_mirror_mode():
    """User-declared symmetric leading block (factorize(..., m0=n)) selects
    the mirror kernel (ref level_factorize<IsSymm=true>, builder.hpp:534):
    L_B == U_B^T, native matches the anchor, and the complete factorization
    on a value-symmetric matrix still solves exactly."""
    import scipy.sparse as sp
    from hifir_tpu.alg.crout_np import crout_level_np
    from hifir_tpu.ds.csr import CSR
    from hifir_tpu.options import determine_fac_pars
    from hifir_tpu.pre import _native

    rng = np.random.default_rng(3)
    n = 90
    P = sp.random(n, n, density=0.08, random_state=4).tocsr()
    pat = ((P + P.T) != 0)
    rows, cols = pat.nonzero()
    A = sp.coo_matrix((rng.standard_normal(rows.size), (rows, cols)),
                      shape=(n, n)).tocsr()
    diag = 4.0 + rng.random(n)
    diag[rng.choice(n, 4, replace=False)] = 1e-9  # force deferrals
    A = (A + sp.diags(diag)).tocsr()
    A.sort_indices()
    Ac = CSR(n, n, A.indptr.astype(np.int64), A.indices.astype(np.int32),
             A.data)
    d0 = A.diagonal()
    opts = Options(verbose=0, tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3)
    ref = np.maximum(np.diff(A.indptr), 2).astype(np.int64)

    res = crout_level_np(Ac, d0, n, 1, opts, ref, ref, symm_mode=2)
    LB_a = res.L_B.to_scipy().toarray()
    UB_a = res.U_B.to_scipy().toarray()
    np.testing.assert_allclose(LB_a, UB_a.T, rtol=0, atol=0)

    if _native.has_crout():
        pars = determine_fac_pars(opts, 1)
        m, Lt, Ut, *_rest = _native.crout(Ac, d0, n, pars, ref, ref,
                                          3.0, 3.0, symmetric=2)
        assert m == res.m
        np.testing.assert_allclose(CSR(m, m, *Lt).to_scipy().toarray(),
                                   LB_a, rtol=1e-10, atol=1e-13)
        np.testing.assert_allclose(CSR(m, m, *Ut).to_scipy().toarray(),
                                   UB_a, rtol=1e-10, atol=1e-13)

    # end-to-end: symmetric values, complete factorization => exact solve
    As = (A + A.T).tocsr()
    As.sort_indices()
    Asym = CSR(n, n, As.indptr.astype(np.int64), As.indices.astype(np.int32),
               As.data)
    M = HIF().factorize(Asym, complete_opts(), m0=n)
    b = rng.standard_normal(n)
    np.testing.assert_allclose(M.solve(b),
                               np.linalg.solve(As.toarray(), b),
                               rtol=1e-8, atol=1e-8)


def _assert_precs_bit_identical(M1, M2):
    assert len(M1.precs) == len(M2.precs)
    for p1, p2 in zip(M1.precs, M2.precs):
        assert p1.m == p2.m and p1.n == p2.n
        for name in ("L_B", "U_B", "E", "F"):
            a, b = getattr(p1, name), getattr(p2, name)
            assert np.array_equal(a.indptr, b.indptr), name
            assert np.array_equal(a.indices, b.indices), name
            assert np.array_equal(a.data, b.data), name
        for name in ("d", "s", "t", "p", "q"):
            assert np.array_equal(getattr(p1, name), getattr(p2, name)), name
        if p1.dense_matrix is None:
            assert p2.dense_matrix is None
        else:
            assert np.array_equal(p1.dense_matrix, p2.dense_matrix)


def test_mt_serial_bit_identity(capfd):
    """The dual-thread Crout kernel (crout.cpp:crout_core_mt, engaged for
    n >= 16384, nnz >= 12n) must produce BIT-IDENTICAL factors to the serial
    kernel (HT_NO_MT=1).  The squared 128^2 Poisson operator (n=16,384,
    nnz/row ~12.8) crosses the engagement gate."""
    from hifir_tpu.pre import _native

    if not _native.has_crout():
        pytest.skip("native library not built")
    S = poisson2d(128).to_scipy()
    S2 = (S @ S).tocsr()
    S2.sort_indices()
    n = S2.shape[0]
    assert n >= 16384 and S2.nnz >= 12 * n  # gate precondition
    A = CSR(n, n, S2.indptr.astype(np.int64), S2.indices.astype(np.int32),
            S2.data)
    # symm_detect=0: this test exercises the GENERAL dual-thread kernel; the
    # symmetric operator would otherwise auto-dispatch to LDL^T (serial)
    opts = Options(verbose=0, tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3,
                   kappa=5, kappa_d=5, symm_detect=0)

    env = dict(os.environ)
    try:
        os.environ["HT_PROFILE"] = "1"
        os.environ.pop("HT_NO_MT", None)
        os.environ["HT_MT"] = "1"   # force engagement on few-core hosts
        M_mt = HIF().factorize(A, opts)
        err_mt = capfd.readouterr().err
        assert "[ht_crout mt]" in err_mt  # the MT path actually engaged
        os.environ["HT_NO_MT"] = "1"
        M_ser = HIF().factorize(A, opts)
        err_ser = capfd.readouterr().err
        assert "[ht_crout mt]" not in err_ser
    finally:
        os.environ.clear()
        os.environ.update(env)

    _assert_precs_bit_identical(M_mt, M_ser)


@pytest.mark.parametrize("mode", ["general", "ldlt", "general-f32",
                                  "ldlt-f32"])
def test_native_matches_anchor_kernels(mode):
    """Native == anchor equivalence for the general (mode 0) and LDL^T
    (mode 1) kernels under real dropping (the pivot and mirror kernels have
    their own equivalence tests), in both f64 and native f32 working
    precision.  The anchor (crout_np.py) is the spec."""
    from hifir_tpu.pre import _native

    if not _native.has_crout():
        pytest.skip("native library not built")
    if mode.startswith("general"):
        A = convdiff2d(24)
        opts = dict(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3,
                    kappa=5, kappa_d=5)
    else:
        A = poisson2d(20)
        opts = dict(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3,
                    kappa=5, kappa_d=5, is_symm=1)
    if mode.endswith("-f32"):
        if not _native.has_crout_dtype(np.float32):
            pytest.skip("native f32 kernel not built")
        opts["dtype"] = "float32"
    o_nat = Options(verbose=0, **opts)
    o_anc = Options(verbose=0, use_native=0, **opts)
    M1 = HIF().factorize(A, o_nat)
    M2 = HIF().factorize(A, o_anc)
    assert len(M1.precs) == len(M2.precs)
    for p1, p2 in zip(M1.precs, M2.precs):
        assert p1.m == p2.m and p1.n == p2.n
        for name in ("p", "q"):
            assert np.array_equal(getattr(p1, name), getattr(p2, name)), name
        for name in ("L_B", "U_B", "E", "F"):
            a, b = getattr(p1, name), getattr(p2, name)
            assert np.array_equal(a.indptr, b.indptr), name
            assert np.array_equal(a.indices, b.indices), name
            np.testing.assert_allclose(a.data, b.data, rtol=1e-10,
                                       atol=1e-14, err_msg=name)
        np.testing.assert_allclose(p1.d, p2.d, rtol=1e-10, atol=1e-14)
    b = np.random.default_rng(7).standard_normal(A.nrows)
    # the sparse factors above matched bit-exactly; the dense tails come
    # from differently-ordered Schur accumulations (native fused vs scipy),
    # so the solve agreement is at working precision, not bit-exact
    tol = 2e-5 if mode.endswith("-f32") else 1e-9
    np.testing.assert_allclose(M1.solve(b), M2.solve(b), rtol=tol,
                               atol=tol * np.abs(M2.solve(b)).max())


def test_host_solve_mrhs_batched():
    """Batched host mrhs solve must match per-column solves exactly and not
    fall back to a Python column loop (native mrhs trsv path)."""
    A = poisson2d(24)
    M = HIF().factorize(A, Options(verbose=0, tau_L=1e-2, tau_U=1e-2,
                                   alpha_L=3, alpha_U=3))
    rng = np.random.default_rng(11)
    B = rng.standard_normal((A.nrows, 7))
    X = M.solve_mrhs(B)
    for k in range(B.shape[1]):
        np.testing.assert_allclose(X[:, k], M.solve(B[:, k]),
                                   rtol=1e-13, atol=1e-13)
    # transpose mrhs
    XT = M.solve_mrhs(B, trans=True)
    for k in range(B.shape[1]):
        np.testing.assert_allclose(XT[:, k], M.solve(B[:, k], trans=True),
                                   rtol=1e-13, atol=1e-13)


def test_native_f32_end_to_end():
    """opts.dtype='float32' factorizes *natively* in single precision (the
    reference's HIF<float> instantiation, builder.hpp:109,589 +
    libhifir.cpp:595+): every level's factors come out float32 with no f64
    upcast, FGMRES iteration count matches the f64 factorization, and the
    flexible outer solve still reaches full f64 accuracy (the reference's
    demo_mixedprecision behavior)."""
    from hifir_tpu.solvers.gmres_np import fgmres_hifir

    A = poisson2d(96)
    b = np.ones(A.nrows)
    res = {}
    for dt in ("float64", "float32"):
        M = HIF().factorize(A, Options(verbose=0, dtype=dt))
        x, flag, iters, _ = fgmres_hifir(A, M, b, restart=30, rtol=1e-6,
                                         maxit=500)
        r = np.linalg.norm(b - A.to_scipy() @ np.asarray(x, np.float64))
        res[dt] = (flag, iters, r / np.linalg.norm(b), M)
    f64_flag, f64_iters, f64_res, _ = res["float64"]
    f32_flag, f32_iters, f32_res, M32 = res["float32"]
    assert f64_flag == 0 and f32_flag == 0
    assert abs(f32_iters - f64_iters) <= 1 + 0.1 * f64_iters
    assert f32_res <= 1e-6
    for p in M32.precs:
        if p.m:
            assert p.d.dtype == np.float32
            assert p.L_B.data.dtype == np.float32
            assert p.s.dtype == np.float32
        if p.dense_matrix is not None:
            assert p.dense_matrix.dtype == np.float32


def test_native_c64_smoke():
    """complex64 working precision: native c kernel, complex64 factors,
    IR-refined solve reaches single-precision accuracy."""
    from hifir_tpu.ds.csr import CSR as _CSR

    Ar = poisson2d(24)
    A = _CSR(Ar.nrows, Ar.ncols, Ar.indptr, Ar.indices,
             (Ar.data + 0.1j * Ar.data).astype(np.complex128))
    M = HIF().factorize(A, Options(verbose=0, dtype="float32"))
    assert all(p.d.dtype == np.complex64 for p in M.precs if p.m)
    b = np.ones(A.nrows, dtype=np.complex64)
    x, it, flag = M.hifir(A, b, 10, betas=(1e-6, 1e6))
    r = np.linalg.norm(np.asarray(b, np.complex128)
                       - A.to_scipy() @ np.asarray(x, np.complex128))
    assert r / np.linalg.norm(b) < 1e-5

def test_anchor_ldlt_mode1_semantics():
    """Anchor mode 1 (LDLᵀ) is the spec for the native mode-1 kernel: on a
    symmetric matrix with symmetric dropping parameters it must agree with
    the general anchor kernel (mode 0) — U = Lᵀ, identical d and ordering —
    since the general Crout on symmetric input preserves the symmetry
    (ref factor.hpp:818-820, the IsSymm LDLᵀ variant)."""
    from hifir_tpu.alg.crout_np import crout_level_np

    A = poisson2d(16)
    n = A.nrows
    opts = Options(verbose=0, tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3,
                   kappa=5, kappa_d=5)
    d0 = A.diagonal()
    ref = np.diff(A.indptr)
    r0 = crout_level_np(A, d0, n, 1, opts, ref, ref, symm_mode=0)
    r1 = crout_level_np(A, d0, n, 1, opts, ref, ref, symm_mode=1)
    assert r1.m == r0.m
    np.testing.assert_array_equal(r1.ord_final, r0.ord_final)
    np.testing.assert_array_equal(r1.d, r0.d)
    for name in ("L_B", "U_B", "L_E", "U_F"):
        a, b = getattr(r1, name), getattr(r0, name)
        np.testing.assert_array_equal(a.indptr, b.indptr, err_msg=name)
        np.testing.assert_array_equal(a.indices, b.indices, err_msg=name)
        np.testing.assert_array_equal(a.data, b.data, err_msg=name)
    # and the defining property: U_B == L_Bᵀ
    LT = r1.L_B.transpose()
    np.testing.assert_array_equal(LT.to_scipy().toarray(),
                                  r1.U_B.to_scipy().toarray())


def test_boosted_precision_host_ir():
    """HIF_HIGH_PRECISION_SOLVE parity (ref utils/common.hpp:219-246,
    builder.hpp:125-131): with boost=True the IR accumulates x and the
    residual in long double, so on an ill-conditioned system the forward
    error against the exact solution of the *stored* f64 system converges
    to ~machine eps instead of stalling at cond(A)·eps."""
    from hifir_tpu.ds.csr import csr_from_dense

    rng = np.random.default_rng(11)
    n = 30
    # cond(A) ~ 1e9 via a log-spaced spectrum
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    D = (Q * np.logspace(0, -9, n)) @ Q.T
    A = csr_from_dense(D)
    b = rng.standard_normal(n)
    # exact solution of the STORED (f64) system via long-double GE with
    # partial pivoting -- the only x both IR variants can converge to
    W = np.hstack([D.astype(np.longdouble), b[:, None].astype(np.longdouble)])
    for k in range(n):
        piv = k + int(np.argmax(np.abs(W[k:, k])))
        W[[k, piv]] = W[[piv, k]]
        W[k + 1:] -= (W[k + 1:, k:k + 1] / W[k, k]) * W[k:k + 1]
    x_exact = np.zeros(n, dtype=np.longdouble)
    for k in range(n - 1, -1, -1):
        x_exact[k] = (W[k, n] - W[k, k + 1:n] @ x_exact[k + 1:]) / W[k, k]
    M = HIF().factorize(A, Options(verbose=0, dense_thres=50))  # exact (LUP)
    errs = {}
    for boost in (False, True):
        x, _, _ = M.hifir(A, b, 12, betas=(1e-30, 1e6), boost=boost)
        errs[boost] = float(
            np.linalg.norm((x.astype(np.longdouble) - x_exact)
                           .astype(np.float64))
            / np.linalg.norm(x_exact.astype(np.float64)))
    # plain f64 stalls near cond*eps (~1e-8 here); boosted is limited by
    # cond*eps_longdouble (~1e-12) -- require three orders of magnitude,
    # robust to spectrum draws
    assert errs[True] < errs[False] * 1e-3, errs
    assert errs[True] < 1e-11, errs


def test_symm_detect_dispatch():
    """Auto-LDL^T dispatch (api.factorize + Options.symm_detect): an exactly
    symmetric real input takes the mode-1 kernel by default; one asymmetric
    entry, complex input, or symm_detect=0 must all keep the general path.
    The dispatched factorization solves the complete (no-dropping) system
    exactly like the general one."""
    import scipy.sparse as sp

    A = poisson2d(24)                       # exactly symmetric
    b = np.arange(A.nrows, dtype=np.float64)

    # detection on (default): LDL^T engaged -> U_B == L_B^T exactly
    M1 = HIF().factorize(A, Options(verbose=0))
    p1 = next(p for p in M1.precs if p.m)
    LBT = p1.L_B.to_scipy().T.tocsr()
    UB = p1.U_B.to_scipy().tocsr()
    assert (LBT != UB).nnz == 0

    # opt-out keeps the general path (independent sides; still solves)
    M0 = HIF().factorize(A, Options(verbose=0, symm_detect=0))
    np.testing.assert_allclose(M0.solve(b), M1.solve(b), rtol=1e-8,
                               atol=1e-8 * np.abs(M1.solve(b)).max())

    # one asymmetric entry disables detection: the general kernel runs and
    # the (dropped) preconditioner still drives IR to convergence on the
    # asymmetric system
    S = A.to_scipy().tolil()
    S[0, 1] = 3.14159           # S[1, 0] unchanged -> not symmetric
    An = CSR.from_scipy(S.tocsr())
    Mn = HIF().factorize(An, Options(verbose=0))
    x, _, flag = Mn.hifir(An, b, 50, betas=(1e-12, 1e8))
    assert flag == 0
    assert (np.linalg.norm(b - An.matvec(x)) / np.linalg.norm(b)) <= 1e-10

    # complex symmetric input keeps the general path (mode 1 is real-only)
    Ac = CSR(A.nrows, A.ncols, A.indptr, A.indices,
             A.data.astype(np.complex128))
    Mc = HIF().factorize(Ac, Options(verbose=0))
    bc = b.astype(np.complex128)
    xc, _, flagc = Mc.hifir(Ac, bc, 50, betas=(1e-12, 1e8))
    assert flagc == 0
    assert np.linalg.norm(Ac.matvec(xc) - bc) / np.linalg.norm(bc) <= 1e-10


def test_dense_defer_cost_aware_switch():
    """Cost-aware dense-switch refinement (Options.dense_defer, default on):
    poisson2d(256) with robust defaults is the measured case where the
    reference's static dense_thres floor (ref factor.hpp:1231-1235) triggers
    an O(nm^3) QRCP on a healthy 1932-row tail (reference: fill 17.2 at
    ~4.6 s).  Deferring until the c_d*N^(1/3) floor keeps the fill near the
    sparse-path level without losing preconditioner quality."""
    A = poisson2d(256)
    M1 = HIF().factorize(A, Options(verbose=0))            # dense_defer=1
    assert M1.nnz() / A.nnz < 8.0
    # opt-out reproduces the reference semantics: the static 2000 floor
    # takes a large dense tail on this operator
    M0 = HIF().factorize(A, Options(verbose=0, dense_defer=0))
    tail0 = next(p.n - p.m for p in M0.precs if p.dense_matrix is not None)
    assert tail0 > 1500
    assert M0.nnz() / A.nnz > 12.0
    # quality parity: 10 Richardson steps land within ~2x of each other
    # (measured trajectories: 8.5e-4 deferred vs 4.5e-4 reference-semantics)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.nrows)
    rels = {}
    for dd, M in ((1, M1), (0, M0)):
        x = np.zeros(A.nrows)
        for _ in range(10):
            x = x + M.solve(b - A.matvec(x))
        rels[dd] = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    assert rels[1] < 5e-3, rels
    assert rels[1] < 3.0 * rels[0], rels


def _hermitian_test_matrix(nx: int, herm: bool) -> CSR:
    """Complex 2-D Poisson-like operator: Hermitian (A == A^H) when herm,
    complex-symmetric (A == A^T) otherwise.  Diagonally dominant."""
    import scipy.sparse as sp

    A = poisson2d(nx).to_scipy().astype(np.complex128).tolil()
    n = A.shape[0]
    rng = np.random.default_rng(3)
    rows, cols = A.nonzero()
    for r, c in zip(rows, cols):
        if r < c:
            v = complex(A[r, c]) + 1j * 0.3 * rng.standard_normal()
            A[r, c] = v
            A[c, r] = np.conj(v) if herm else v
    return CSR.from_scipy(A.tocsr())


@pytest.mark.parametrize("kind", ["hermitian", "cplx-symmetric"])
def test_complex_symmetric_hermitian_ldl(kind):
    """Complex one-sided modes (VERDICT r4 Missing #1): LDL^H for Hermitian
    input, LDL^T for complex-symmetric input — both auto-detected and both
    native==anchor.  NOTE this is a deviation from the reference, whose own
    is_symm on complex input produces a broken preconditioner (measured
    err ~1 vs 5e-16 on its general path, BASELINE.md round-5); these modes
    are validated against the general path instead."""
    herm = kind == "hermitian"
    A = _hermitian_test_matrix(16, herm)
    b = A.matvec(np.ones(A.nrows, dtype=np.complex128))

    # auto-detection classifies and engages the one-sided kernel
    M = HIF().factorize(A, Options(verbose=0))
    p1 = next(p for p in M.precs if p.m)
    LBT = p1.L_B.to_scipy().T.tocsr()
    if herm:
        LBT.data = np.conj(LBT.data)
    UB = p1.U_B.to_scipy().tocsr()
    assert (LBT != UB).nnz == 0, "U_B must mirror L_B"
    if herm:
        # real up to the rounding drift of (l/d)*conj(l) (the two cross
        # products round independently)
        assert (np.abs(p1.d.imag).max()
                < 1e-14 * np.abs(p1.d.real).max()), "LDL^H diag must be real"

    # solves match the general path (same input, symm_detect off)
    Mg = HIF().factorize(A, Options(verbose=0, symm_detect=0))
    xg = Mg.solve(b)
    xs = M.solve(b)
    np.testing.assert_allclose(xs, xg, rtol=1e-8,
                               atol=1e-8 * np.abs(xg).max())

    # anchor == native bit-identity (the anchor is the spec)
    from hifir_tpu.pre import _native
    if _native.has_crout() and _native.has_crout_dtype(np.complex128):
        Ma = HIF().factorize(A, Options(verbose=0, use_native=0))
        assert len(M.precs) == len(Ma.precs)
        for pn, pa in zip(M.precs, Ma.precs):
            assert pn.m == pa.m and pn.n == pa.n
            for name in ("L_B", "U_B", "E", "F"):
                a_, b_ = getattr(pn, name), getattr(pa, name)
                assert np.array_equal(a_.indptr, b_.indptr), name
                assert np.array_equal(a_.indices, b_.indices), name
                np.testing.assert_allclose(a_.data, b_.data, rtol=1e-12,
                                           atol=1e-15, err_msg=name)
            np.testing.assert_allclose(pn.d, pa.d, rtol=1e-12, atol=1e-15)

    # IR drives the preconditioned residual to zero (end-to-end quality)
    x, _, flag = M.hifir(A, b, 50, betas=(1e-12, 1e8))
    assert flag == 0
    assert (np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)) <= 1e-10
