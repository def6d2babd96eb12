"""API-layer tests: capi handles, sparsifier, mixed precision, serialization,
symmetric mode, options parity."""

import numpy as np
import pytest

from hifir_tpu import capi
from hifir_tpu.api import HIF
from hifir_tpu.ds import CSR
from hifir_tpu.models import convdiff2d, poisson2d, saddle_point_stokes
from hifir_tpu.options import Options, get_default_options


def test_options_defaults_match_reference():
    """Defaults mirror hif_get_default_options (Options.h:135-163)."""
    o = get_default_options()
    assert o.tau_L == o.tau_U == 1e-4
    assert o.kappa == o.kappa_d == 3.0
    assert o.alpha_L == o.alpha_U == 10.0
    assert o.rho == 0.5 and o.c_d == 10.0 and o.c_h == 2.0
    assert o.N == -1 and o.verbose == 1 and o.rf_par == 1
    assert o.reorder == 2 and o.pivot == 2 and o.beta == 1e3
    assert o.symm_pre_lvls == -2 and o.nzp_thres == 0.65
    assert o.dense_thres == 2000
    assert len(o._REF_FIELDS) == 28


def test_options_string_setter():
    o = Options()
    assert not o.set("tau_L", "0.01")
    assert o.tau_L == 0.01
    assert o.set("bogus", 1)  # failure returns True like the reference
    o.set_options(alpha_L=3, kappa=5)
    assert o.alpha_L == 3.0 and o.kappa == 5.0
    assert "tau_L" in o.repr_options()


def test_capi_lifecycle_and_apply_modes():
    A = poisson2d(14)
    h = capi.create(A=A, params=Options(verbose=0))
    assert capi.empty(h)
    capi.setup(h)
    assert not capi.empty(h)
    assert capi.get_levels(h) >= 1
    assert capi.get_nnz(h) > 0
    b = np.random.default_rng(0).standard_normal(A.nrows)
    x, _, _ = capi.apply(h, capi.OP_S, b)
    y, _, _ = capi.apply(h, capi.OP_M, x)
    np.testing.assert_allclose(y, b, atol=1e-10)
    xh, _, _ = capi.apply(h, capi.OP_SH, b)
    yh, _, _ = capi.apply(h, capi.OP_MH, xh)
    np.testing.assert_allclose(yh, b, atol=1e-10)
    x2, iters, flag = capi.apply(h, capi.OP_S, b, nirs=50, betas=(1e-11, 1e8))
    assert flag == 0
    assert np.linalg.norm(b - A.matvec(x2)) / np.linalg.norm(b) <= 1e-11
    assert capi.get_stats(h).shape == (6,)
    capi.destroy(h)
    with pytest.raises(Exception):
        capi.get_levels(h)


def test_capi_sparsifier():
    """Factorize a sparsifier to precondition a different operator
    (ref demo_sparsifier.cpp: 2nd-order FDM preconditioning 4th-order)."""
    A = convdiff2d(16, wind=(1.0, 2.0))
    S = poisson2d(16)
    h = capi.create(A=A, S=S, params=Options(verbose=0))
    capi.setup(h)
    b = np.ones(A.nrows)
    x, iters, flag = capi.apply(h, capi.OP_S, b, nirs=200, betas=(1e-10, 1e8))
    assert flag == 0
    assert np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b) <= 1e-10
    capi.destroy(h)


def test_capi_update_refactorize():
    A = poisson2d(12)
    h = capi.create(A=A, params=Options(verbose=0))
    capi.setup(h)
    nnz1 = capi.get_nnz(h)
    A2 = convdiff2d(12, wind=(1.0, 2.0))
    capi.update(h, A2)  # new operator, same preconditioner
    b = np.ones(A2.nrows)
    x, iters, flag = capi.apply(h, capi.OP_S, b, nirs=300, betas=(1e-8, 1e8))
    assert flag == 0
    capi.refactorize(h, A2)
    assert not capi.empty(h)
    capi.destroy(h)


def test_capi_mixed_precision():
    """Single-precision M + double IR reaches ~double accuracy
    (ref lhfsdApply, libhifir.h:1231)."""
    A = poisson2d(14)
    h = capi.create(A=A, params=Options(verbose=0), precision="mixed")
    capi.setup(h)
    assert capi.is_mixed(h)
    b = np.random.default_rng(1).standard_normal(A.nrows)
    x, iters, flag = capi.apply(h, capi.OP_S, b, nirs=60, betas=(1e-12, 1e8))
    assert flag == 0
    assert np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b) <= 1e-12
    capi.destroy(h)


def test_serialization_roundtrip(tmp_path):
    from hifir_tpu.utils.serialize import load_prec, save_prec

    A = saddle_point_stokes(7)
    opts = Options(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3, kappa=5,
                   kappa_d=5, verbose=0, dense_thres=20)
    M = HIF().factorize(A, opts)
    b = np.random.default_rng(2).standard_normal(A.nrows)
    x1 = M.solve(b)
    f = tmp_path / "prec.npz"
    save_prec(str(f), M)
    M2 = load_prec(str(f))
    assert M2.levels() == M.levels()
    x2 = M2.solve(b)
    np.testing.assert_allclose(x2, x1, rtol=1e-10, atol=1e-10)


def test_is_symm_mode():
    A = poisson2d(12)
    opts = Options(is_symm=1, verbose=0, dense_thres=20)
    M = HIF().factorize(A, opts)
    b = np.random.default_rng(3).standard_normal(A.nrows)
    x, iters, flag = M.hifir(A, b, 100, betas=(1e-10, 1e8))
    assert flag == 0
    if M.precs[-1].dense_solver is not None:
        assert M.precs[-1].dense_solver.kind == "syeig"


def test_singular_system_pseudoinverse():
    """epsilon-accurate pseudoinverse for a singular system via truncated
    RRQR + null-space filter (ref QRCP.hpp:144-180, NspFilter.hpp)."""
    from hifir_tpu.nsp import NspFilter

    # singular Neumann-like Poisson: A = poisson - row-sum diag (constant null)
    A0 = poisson2d(8)
    D = A0.todense()
    D -= np.diag(D.sum(axis=1))
    from hifir_tpu.ds.csr import csr_from_dense

    A = csr_from_dense(D)
    n = A.nrows
    opts = Options(verbose=0, dense_thres=10)
    M = HIF().factorize(A, opts)
    M.nsp = NspFilter()
    rng = np.random.default_rng(4)
    b = rng.standard_normal(n)
    b -= b.mean()  # consistent RHS
    x, iters, flag = M.hifir(A, b, 200, betas=(1e-9, 1e8))
    res = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    assert res <= 1e-8
    assert abs(x.mean()) <= 1e-10  # constant mode filtered


def test_complex_system_young1c():
    """Complex (z) precision end-to-end on the vendored SuiteSparse matrix
    (ref examples/intermediate/demo_complex.cpp)."""
    import os

    path = "/root/reference/examples/demo_inputs/young1c.mtx"
    if not os.path.exists(path):
        pytest.skip("reference inputs absent")
    from hifir_tpu.solvers import gmres_hif
    from hifir_tpu.utils import io as hio

    A = hio.read_mm(path)
    assert np.iscomplexobj(A.data)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.nrows) + 1j * rng.standard_normal(A.nrows)
    M = HIF().factorize(A, Options(verbose=0, use_native=0))
    x, flag, iters = gmres_hif(A, M, b, restart=30, rtol=1e-8, maxit=200)
    assert flag == 0 and iters <= 10
    res = np.linalg.norm(b - A.matvec(x)) / np.linalg.norm(b)
    assert res <= 1e-8
    # Hermitian-transpose solve consistency
    xt = M.solve(b, trans=True)
    yt = M.mmultiply(xt, trans=True)
    np.testing.assert_allclose(yt, b, atol=1e-8 * np.abs(b).max())


def test_options_stream_roundtrip():
    """Stream extraction parity (ref Options.h:566-575 operator>>: 27
    whitespace-separated values in field order, pivot excluded)."""
    from hifir_tpu.options import Options

    o = Options()
    assert Options.from_stream(o.to_stream()).to_stream() == o.to_stream()
    o3 = Options.from_stream(
        "1e-2 1e-2 5 5 3 3 0.5 10 2 -1 0 1 2 0 1 0 -2 0 1 0 0 1 1e3 0 0 "
        "0.65 500")
    assert o3.tau_L == 1e-2 and o3.kappa == 5 and o3.dense_thres == 500
    import io

    assert Options.from_stream(io.StringIO(o.to_stream())).tau_L == o.tau_L


def test_verbose_fac_streamer_and_info2(capsys):
    """VERBOSE_FAC streams every Crout step (ref builder.hpp:266-267, via
    the anchor kernel); INFO2 dumps the per-level min/max |kappa| (ref
    factor.hpp:1063-1110, native and anchor paths)."""
    from hifir_tpu.models import poisson2d
    from hifir_tpu.options import (Options, VERBOSE_FAC, VERBOSE_INFO,
                                   VERBOSE_INFO2)

    A = poisson2d(8)
    HIF().factorize(A, Options(verbose=VERBOSE_FAC))
    out = capsys.readouterr().out
    assert out.count("Crout step") >= A.nrows // 2

    HIF().factorize(A, Options(verbose=VERBOSE_INFO | VERBOSE_INFO2))
    out = capsys.readouterr().out
    assert "|kappa_u| in [" in out
