"""Multi-device tests on the 8-virtual-device CPU mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifir_tpu.api import HIF
from hifir_tpu.models import convdiff2d, poisson2d, random_strict_triangular
from hifir_tpu.options import Options
from hifir_tpu.parallel import (DistPrec, make_mesh, make_sharded_ir_step,
                                shard_ell_rows, shard_trsv_schedule,
                                sharded_spmv, sharded_trsv_apply)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, rhs=2)


@pytest.fixture(scope="module")
def mesh_rows():
    return make_mesh(8, rhs=1)


def test_sharded_spmv(mesh):
    A = convdiff2d(12)
    Ae = shard_ell_rows(mesh, A)
    x = np.random.default_rng(0).standard_normal(A.nrows)
    y = np.asarray(sharded_spmv(mesh, Ae, jnp.asarray(x)))[: A.nrows]
    np.testing.assert_allclose(y, A.matvec(x), rtol=1e-12)


@pytest.mark.parametrize("lower", [True, False])
def test_distributed_trsv(mesh_rows, lower):
    n = 300
    T = random_strict_triangular(n, lower=lower, seed=4)
    st = shard_trsv_schedule(mesh_rows, T, lower=lower, chunk=64)
    b = np.random.default_rng(1).standard_normal(n)
    x = np.asarray(sharded_trsv_apply(st, b))
    xr = T.solve_as_strict_lower(b) if lower else T.solve_as_strict_upper(b)
    np.testing.assert_allclose(x, xr, atol=1e-10)


def test_distributed_prec_solve(mesh_rows):
    A = convdiff2d(16)
    opts = Options(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3, kappa=5,
                   kappa_d=5, verbose=0, dense_thres=30)
    M = HIF().factorize(A, opts)
    dp = DistPrec.from_host(mesh_rows, M, chunk=32)
    b = np.random.default_rng(0).standard_normal(A.nrows)
    xd = np.asarray(dp.solve(b))
    xh = M.solve(b)
    np.testing.assert_allclose(xd, xh, atol=1e-12 * np.abs(xh).max())


def test_sharded_ir_step_converges(mesh):
    A = poisson2d(10)
    n = A.nrows
    Ae = shard_ell_rows(mesh, A)
    opts = Options(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3, kappa=5,
                   kappa_d=5, verbose=0, dense_thres=30)
    M = HIF().factorize(A, opts)
    dev = M.to_device()
    levels, tail = dev.operands()
    step = make_sharded_ir_step(mesh, n)
    npad = Ae.nrows
    nrhs = 4
    B = np.random.default_rng(1).standard_normal((n, nrhs))
    Bp = np.concatenate([B, np.zeros((npad - n, nrhs))])
    X = jnp.zeros((npad, nrhs))
    for _ in range(30):
        X = step(Ae.indices, Ae.values, levels, tail, X, jnp.asarray(Bp))
    Xn = np.asarray(X)[:n]
    res = max(np.linalg.norm(B[:, k] - A.matvec(Xn[:, k]))
              / np.linalg.norm(B[:, k]) for k in range(nrhs))
    assert res <= 1e-10


def test_halo_spmv(mesh_rows):
    """Neighbor-only ppermute halo exchange for banded operators."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hifir_tpu.parallel.halo import build_halo_spmv, halo_spmv

    A = poisson2d(16)  # banded in natural ordering
    H = build_halo_spmv(mesh_rows, A)
    n = A.nrows
    x = np.random.default_rng(0).standard_normal(H.nb * 8)
    x[n:] = 0.0
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh_rows, P("rows")))
    y = np.asarray(halo_spmv(H, xs))
    np.testing.assert_allclose(y[:n], A.matvec(x[:n]), rtol=1e-12)

    from hifir_tpu.models import random_sparse

    with pytest.raises(ValueError):
        build_halo_spmv(mesh_rows, random_sparse(1024, 6, seed=1))


def test_partitioned_hif_exact_single_part():
    """nparts=1 must reduce exactly to the global HIF."""
    from hifir_tpu.api import HIF
    from hifir_tpu.parallel.partition import PartitionedHIF

    A = poisson2d(32)
    o = Options(verbose=0)
    b = np.ones(A.nrows)
    P = PartitionedHIF().factorize(A, 1, o)
    M = HIF().factorize(A, o)
    np.testing.assert_array_equal(P.solve(b), M.solve(b))


def test_partitioned_hif_converges():
    """RAS + coarse correction over independently factorized blocks keeps
    GMRES convergence partition-count-robust (net-new vs the reference,
    BASELINE.md target config 5)."""
    from hifir_tpu.parallel.partition import PartitionedHIF
    from hifir_tpu.solvers import gmres_hif

    A = poisson2d(64)
    b = np.ones(A.nrows)
    o = Options(verbose=0, tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3,
                kappa=5, kappa_d=5, dense_thres=200)
    iters = {}
    for nparts in (2, 4, 8):
        P = PartitionedHIF().factorize(A, nparts, o)
        x, flag, it = gmres_hif(A, P, b, restart=30, rtol=1e-6, maxit=300)
        assert flag == 0
        r = b - A.matvec(x)
        assert np.linalg.norm(r) <= 1e-5 * np.linalg.norm(b)
        iters[nparts] = it
    # doubling partitions must not blow up the iteration count
    assert iters[8] <= 3 * iters[2]


def test_partitioned_hif_mrhs_and_trans():
    from hifir_tpu.parallel.partition import PartitionedHIF

    A = poisson2d(24)
    o = Options(verbose=0)
    P = PartitionedHIF().factorize(A, 4, o, overlap=12)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((A.nrows, 3))
    X = P.solve_mrhs(B)
    for j in range(3):
        np.testing.assert_allclose(X[:, j], P.solve(B[:, j]),
                                   rtol=1e-12, atol=1e-12)
    # transpose solve consistent with transposed operator preconditioning
    x_t = P.solve(B[:, 0], trans=True)
    assert np.all(np.isfinite(x_t))


@pytest.mark.parametrize("lower", [True, False])
def test_halo_trsv_exact_and_compact(mesh_rows, lower):
    """Per-chunk halo-exchange trsv (ppermute + compact all_gather legs)
    is exact and moves strictly less than the tiled-all_gather scheme."""
    from hifir_tpu.parallel import build_halo_op, halo_trsv_apply

    n = 400
    T = random_strict_triangular(n, lower=lower, seed=9)
    op = build_halo_op(mesh_rows, T, lower=lower, chunk=64)
    assert op is not None
    b = np.random.default_rng(1).standard_normal(n)
    x = np.asarray(halo_trsv_apply(op, b))
    xr = T.solve_as_strict_lower(b) if lower else T.solve_as_strict_upper(b)
    np.testing.assert_allclose(x, xr, atol=1e-10)
    assert 0 < op.comm_elems < op.allgather_elems


def test_dist_prec_halo_exact_and_comm_reduction(mesh_rows):
    """DistPrec carried by halo trsv ops on a >=3-level, >=8-chunk/level
    factorization: exact vs host recursion, with host-counted exchange
    volume well below the tiled-all_gather scheme (VERDICT r1 item 3)."""
    A = poisson2d(64)
    opts = Options(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3, kappa=5,
                   kappa_d=5, verbose=0, dense_thres=50)
    M = HIF().factorize(A, opts)
    assert M.levels() >= 3
    dp = DistPrec.from_host(mesh_rows, M, chunk=64)
    from hifir_tpu.parallel.trsv_halo import HaloOp

    assert dp.n_halo >= 4   # every non-trivial L/U factor carried by halo
    assert all(isinstance(l.L_op, HaloOp) and l.L_op.nchunks >= 8
               for l in dp.levels[:2])
    # exchange volume must be a real reduction, not a tie
    assert dp.comm_elems < 0.5 * dp.allgather_elems
    b = np.random.default_rng(0).standard_normal(A.nrows)
    xd = np.asarray(dp.solve(b))
    xh = M.solve(b)
    np.testing.assert_allclose(xd, xh, atol=1e-12 * np.abs(xh).max())
    # the all_gather fallback path stays available and equally exact
    dp_ag = DistPrec.from_host(mesh_rows, M, chunk=64, halo=False)
    assert dp_ag.n_halo == 0
    np.testing.assert_allclose(np.asarray(dp_ag.solve(b)), xh,
                               atol=1e-12 * np.abs(xh).max())

def test_dist_prec_ef_exchange_link(mesh_rows):
    """Inter-level E-output exchange (VERDICT r3 #6): levels >= 2 fetch
    their permuted input via ppermute packages / compact AG instead of a
    full-vector all_gather of the previous level's E-SpMV output — exact,
    engaged on every eligible level, and a real comm reduction."""
    A = poisson2d(64)
    opts = Options(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3, kappa=5,
                   kappa_d=5, verbose=0, dense_thres=50)
    M = HIF().factorize(A, opts)
    assert M.levels() >= 3
    dp = DistPrec.from_host(mesh_rows, M, chunk=64)
    # every level after the first with a preceding E block carries the plan
    assert all(l.xin is not None for l in dp.levels[1:])
    D = mesh_rows.shape["rows"]
    for l in dp.levels[1:]:
        # exchange strictly cheaper than replicating the producer vector
        assert l.xin.comm_elems < l.xin.allgather_elems
    b = np.random.default_rng(3).standard_normal(A.nrows)
    xd = np.asarray(dp.solve(b))
    xh = M.solve(b)
    np.testing.assert_allclose(xd, xh, atol=1e-12 * np.abs(xh).max())
    # plans off (shard_vectors=False) stays exact through the legacy link
    dp0 = DistPrec.from_host(mesh_rows, M, chunk=64, shard_vectors=False)
    assert all(l.xin is None for l in dp0.levels)
    np.testing.assert_allclose(np.asarray(dp0.solve(b)), xh,
                               atol=1e-12 * np.abs(xh).max())



def test_schur_spgemm_ring_vs_dense_oracle(mesh_rows):
    """Distributed ring SpGEMM (column panels rotated via ppermute) equals
    the dense Schur S = C - L_E D U_F (ref Schur.hpp:214 semantics)."""
    from hifir_tpu.ds.csr import csr_from_dense
    from hifir_tpu.models import random_sparse
    from hifir_tpu.parallel.schur import schur_spgemm_ring

    rng = np.random.default_rng(7)
    m, nm = 90, 53   # deliberately not divisible by 8
    L_E = random_sparse(nm, 6, seed=1, ncols=m)
    U_F = random_sparse(m, 5, seed=2, ncols=nm)
    C = random_sparse(nm, 4, seed=3, ncols=nm)
    d = rng.standard_normal(m) + 2.0
    S = schur_spgemm_ring(C, L_E, d, U_F, mesh=mesh_rows)
    S_dense = C.todense() - L_E.todense() @ np.diag(d) @ U_F.todense()
    np.testing.assert_allclose(S.todense(), S_dense, rtol=1e-12, atol=1e-12)


def test_dist_schur_in_multilevel_factorize(mesh_rows):
    """opts.dist_schur=1 runs every level's Schur as the distributed ring
    SpGEMM on the 8-device mesh; the resulting multilevel preconditioner
    must match the host-Schur factorization to fp roundoff."""
    A = convdiff2d(40)
    base = dict(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3, kappa=5,
                kappa_d=5, verbose=0, dense_thres=20, use_native=0)
    M_host = HIF().factorize(A, Options(**base))
    M_dist = HIF().factorize(A, Options(dist_schur=1, **base))
    assert M_host.levels() == M_dist.levels() >= 3
    # per-level agreement: identical structure, dense tail to roundoff
    for ph, pd in zip(M_host.precs, M_dist.precs):
        assert ph.m == pd.m and ph.n == pd.n
        if ph.dense_matrix is not None:
            np.testing.assert_allclose(pd.dense_matrix, ph.dense_matrix,
                                       rtol=1e-12, atol=1e-13)
    b = np.random.default_rng(0).standard_normal(A.nrows)
    xh = M_host.solve(b)
    xd = M_dist.solve(b)
    np.testing.assert_allclose(xd, xh, rtol=1e-12,
                               atol=1e-12 * np.abs(xh).max())


def test_geneo_coarse_space():
    """GenEO-lite spectral coarse space (coarse_mode='geneo'): stable and at
    least as strong as the polynomial default at moderate partition counts
    (BASELINE.md round-5 sweep: q=3 beats the global preconditioner at 4-8
    parts; the r4 Chebyshev q>=2 instability does not recur)."""
    import numpy as np

    from hifir_tpu.api import HIF
    from hifir_tpu.models import poisson2d
    from hifir_tpu.options import Options
    from hifir_tpu.parallel.partition import PartitionedHIF
    from hifir_tpu.solvers import gmres_hif

    A = poisson2d(96)
    o = Options(verbose=0, tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3,
                kappa=5, kappa_d=5, dense_thres=500)
    b = A.matvec(np.ones(A.nrows))
    iters = {}
    for mode, q in [("cheb", 1), ("geneo", 3)]:
        P = PartitionedHIF().factorize(A, 4, o, coarse_mode=mode,
                                       coarse_dim=q)
        _, flag, it = gmres_hif(A, P, b, restart=30, rtol=1e-6, maxit=400)
        assert flag == 0, (mode, q)
        iters[mode] = it
    assert iters["geneo"] <= iters["cheb"] + 2, iters
