"""Fully distributed multilevel M-solve.

Composes the distributed level-scheduled trsv (``trsv_sharded``) with
row-sharded E/F SpMV into one ``shard_map``-ped multilevel solve: the factor
operands — the memory that grows with fill — are sharded over the ``rows``
axis; the solution vector stays replicated and is reassembled per chunk/block
with tiled ``all_gather`` over ICI.  This supersedes the replicated M-solve
in ``parallel/sharded.py`` for large factors.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..alg.prec import DenseTail, tail_solve
from ..ops.spmv import ELL, ell_from_csr
from ..ops.trsv import build_trsv_schedule
from .sharded import pad_rows

__all__ = ["DistPrec"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DistLevel:
    """Distributed operands of one level; `.spec()` mirrors the pytree with
    PartitionSpecs for shard_map."""

    p: jax.Array
    q_inv: jax.Array
    s_p: jax.Array
    t: jax.Array
    d: jax.Array
    L_in_rows: jax.Array
    L_cols: jax.Array      # sharded (nchunks, C, K) over axis 1
    L_vals: jax.Array
    L_out: jax.Array
    U_in_rows: jax.Array
    U_cols: jax.Array
    U_vals: jax.Array
    U_out: jax.Array
    E_idx: jax.Array       # row-sharded ELL of E (rows padded)
    E_val: jax.Array
    F_idx: jax.Array
    F_val: jax.Array
    m: int
    n: int
    chunk: int
    L_nchunks: int
    U_nchunks: int
    E_rows: int            # padded row count of E
    F_rows: int

    _ARRAYS = ("p", "q_inv", "s_p", "t", "d",
               "L_in_rows", "L_cols", "L_vals", "L_out",
               "U_in_rows", "U_cols", "U_vals", "U_out",
               "E_idx", "E_val", "F_idx", "F_val")
    _AUX = ("m", "n", "chunk", "L_nchunks", "U_nchunks", "E_rows", "F_rows")

    def tree_flatten(self):
        return (tuple(getattr(self, f) for f in self._ARRAYS),
                tuple(getattr(self, f) for f in self._AUX))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def spec(self) -> "DistLevel":
        sharded3 = P(None, "rows", None)
        sharded2 = P("rows", None)
        rep = P()
        vals = dict(p=rep, q_inv=rep, s_p=rep, t=rep, d=rep,
                    L_in_rows=rep, L_cols=sharded3, L_vals=sharded3, L_out=rep,
                    U_in_rows=rep, U_cols=sharded3, U_vals=sharded3, U_out=rep,
                    E_idx=sharded2, E_val=sharded2,
                    F_idx=sharded2, F_val=sharded2)
        return DistLevel(*[vals[f] for f in self._ARRAYS],
                         *[getattr(self, f) for f in self._AUX])


def _dist_trsv(lvl_prefix, in_rows, cols, vals, out, nchunks, chunk, b):
    """In-shard_map distributed trsv (see trsv_sharded for the layout)."""
    if nchunks == 0:
        return b
    ndev = jax.lax.psum(1, "rows")
    my = jax.lax.axis_index("rows").astype(jnp.int32)
    Cloc = chunk // ndev
    b_ext = jnp.concatenate([b, jnp.zeros((1,), dtype=b.dtype)])
    x = b_ext[in_rows]
    x = jnp.concatenate([x, jnp.zeros((1,), dtype=b.dtype)])

    def body(carry, inputs):
        x, c = carry
        cc, vv = inputs
        g = x[cc]
        contrib = (vv * g).sum(axis=1)
        cur = jax.lax.dynamic_slice(x, (c + my * jnp.int32(Cloc),), (Cloc,))
        new_full = jax.lax.all_gather(cur - contrib, "rows", axis=0,
                                      tiled=True)
        x = jax.lax.dynamic_update_slice(x, new_full, (c,))
        return (x, c + jnp.int32(chunk)), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.int32(0)), (cols, vals))
    return x[out]


def _dist_spmv(idx, val, x, out_rows):
    """Row-sharded ELL SpMV: local rows -> all_gather -> trim."""
    x_ext = jnp.concatenate([x, jnp.zeros((1,), dtype=x.dtype)])
    y_local = (val * x_ext[idx]).sum(axis=1)
    y = jax.lax.all_gather(y_local, "rows", axis=0, tiled=True)
    return y[:out_rows]


def _dist_solve(levels: List[DistLevel], tail: Optional[DenseTail],
                b: jax.Array) -> jax.Array:
    wbs = []
    rhs = b
    for lvl in levels:
        wb = lvl.s_p * rhs[lvl.p]
        m = lvl.m
        x1 = _dist_trsv(lvl, lvl.L_in_rows, lvl.L_cols, lvl.L_vals, lvl.L_out,
                        lvl.L_nchunks, lvl.chunk, wb[:m])
        x1 = x1 / lvl.d
        x1 = _dist_trsv(lvl, lvl.U_in_rows, lvl.U_cols, lvl.U_vals, lvl.U_out,
                        lvl.U_nchunks, lvl.chunk, x1)
        y2 = wb[m:] - _dist_spmv(lvl.E_idx, lvl.E_val, x1, lvl.n - m)
        wbs.append(wb)
        rhs = y2
    x_tail = tail_solve(tail, rhs)
    for lvl, wb in zip(reversed(levels), reversed(wbs)):
        m = lvl.m
        if lvl.n - m:
            z = wb[:m] - _dist_spmv(lvl.F_idx, lvl.F_val, x_tail, m)
        else:
            z = wb[:m]
        z = _dist_trsv(lvl, lvl.L_in_rows, lvl.L_cols, lvl.L_vals, lvl.L_out,
                       lvl.L_nchunks, lvl.chunk, z)
        z = z / lvl.d
        z = _dist_trsv(lvl, lvl.U_in_rows, lvl.U_cols, lvl.U_vals, lvl.U_out,
                       lvl.U_nchunks, lvl.chunk, z)
        sol = jnp.concatenate([z, x_tail])
        x_tail = lvl.t * sol[lvl.q_inv]
    return x_tail


class DistPrec:
    """Mesh-distributed multilevel preconditioner."""

    def __init__(self, mesh: Mesh, levels: List[DistLevel],
                 tail: Optional[DenseTail]):
        self.mesh = mesh
        self.levels = levels
        self.tail = tail
        specs = [l.spec() for l in levels]
        tail_spec = None if tail is None else jax.tree_util.tree_map(
            lambda _: P(), tail)
        fn = jax.shard_map(_dist_solve, mesh=mesh,
                           in_specs=(specs, tail_spec, P()), out_specs=P(),
                           check_vma=False)
        self._jit = jax.jit(fn)

    @classmethod
    def from_host(cls, mesh: Mesh, M, dtype=None, chunk: int = 256
                  ) -> "DistPrec":
        """Build from a factorized host :class:`hifir_tpu.api.HIF`."""
        dtype = jnp.float64 if dtype is None else dtype
        ndev = mesh.shape["rows"]
        C = max(chunk, ndev)
        C -= C % ndev
        sh3 = NamedSharding(mesh, P(None, "rows", None))
        sh2 = NamedSharding(mesh, P("rows", None))
        rep = NamedSharding(mesh, P())
        levels = []
        for prec in M.precs:
            m, n = prec.m, prec.n
            Ls = build_trsv_schedule(prec.L_B, lower=True, chunk=C,
                                     dtype=dtype)
            Us = build_trsv_schedule(prec.U_B, lower=False, chunk=C,
                                     dtype=dtype)
            Ee = ell_from_csr(pad_rows(prec.E, ndev), dtype=dtype)
            Fe = ell_from_csr(pad_rows(prec.F, ndev), dtype=dtype)
            levels.append(DistLevel(
                p=jax.device_put(jnp.asarray(prec.p, jnp.int32), rep),
                q_inv=jax.device_put(jnp.asarray(prec.q_inv, jnp.int32), rep),
                s_p=jax.device_put(jnp.asarray(prec.s[prec.p], dtype), rep),
                t=jax.device_put(jnp.asarray(prec.t, dtype), rep),
                d=jax.device_put(jnp.asarray(prec.d, dtype), rep),
                L_in_rows=jax.device_put(Ls.in_rows, rep),
                L_cols=jax.device_put(Ls.cols, sh3),
                L_vals=jax.device_put(Ls.vals, sh3),
                L_out=jax.device_put(Ls.out_slots, rep),
                U_in_rows=jax.device_put(Us.in_rows, rep),
                U_cols=jax.device_put(Us.cols, sh3),
                U_vals=jax.device_put(Us.vals, sh3),
                U_out=jax.device_put(Us.out_slots, rep),
                E_idx=jax.device_put(Ee.indices, sh2),
                E_val=jax.device_put(Ee.values, sh2),
                F_idx=jax.device_put(Fe.indices, sh2),
                F_val=jax.device_put(Fe.values, sh2),
                m=m, n=n, chunk=C,
                L_nchunks=Ls.nchunks, U_nchunks=Us.nchunks,
                E_rows=Ee.nrows, F_rows=Fe.nrows))
        tail = None
        if M.precs[-1].dense_solver is not None:
            from ..alg.prec import DevicePrec

            dp = DevicePrec.from_host(M.precs, dtype=dtype, chunk=C)
            tail = dp.tail
        return cls(mesh, levels, tail)

    def solve(self, b) -> jax.Array:
        """x = M^{-1} b; b and x replicated across the mesh."""
        return self._jit(self.levels, self.tail, jnp.asarray(b))
