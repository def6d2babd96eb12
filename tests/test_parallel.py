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
