"""Fully distributed multilevel M-solve.

Composes a distributed level-scheduled trsv with row-sharded E/F SpMV into
one ``shard_map``-ped multilevel solve: the factor operands — the memory
that grows with fill — are sharded over the ``rows`` axis.  Each level's
L/U triangular solve is carried by one of two interchangeable op objects:

* :class:`~.trsv_halo.HaloOp` (default) — the working vector lives
  *distributed* (own slots + exact host-counted halo); cross-device
  dependencies ride per-chunk ``ppermute``/compact-``all_gather`` packages
  sized to the real fan-in, overlapped with the next chunk's local FMA.
* :class:`AGTrsvOp` (fallback; also ``halo=False``) — the replicated
  working vector reassembled per chunk with a tiled ``all_gather``.

This supersedes the replicated M-solve in ``parallel/sharded.py`` for large
factors.  Reference serial recursion being distributed:
``/root/reference/src/hif/alg/prec_solve.hpp:333`` over
``CompressedStorage.hpp:2268`` solves.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..alg.prec import DenseTail, tail_solve
from ..ops.spmv import ELL, ell_from_csr
from ..ops.trsv import build_trsv_schedule
from .sharded import pad_rows
from .trsv_halo import HaloOp, build_halo_op, halo_op_kernel

__all__ = ["DistPrec", "AGTrsvOp"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AGTrsvOp:
    """Tiled-all_gather trsv operand (one level's L or U factor)."""

    in_rows: jax.Array     # (nslots,) replicated
    cols: jax.Array        # (nchunks, C, K) sharded over axis 1
    vals: jax.Array
    out_slots: jax.Array   # (n,) replicated
    nchunks: int
    chunk: int
    n: int

    def tree_flatten(self):
        return ((self.in_rows, self.cols, self.vals, self.out_slots),
                (self.nchunks, self.chunk, self.n))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def spec(self) -> "AGTrsvOp":
        sh3 = P(None, "rows", None)
        return AGTrsvOp(P(), sh3, sh3, P(), self.nchunks, self.chunk, self.n)


def ag_op_kernel(op: AGTrsvOp, b: jax.Array) -> jax.Array:
    """shard_map-internal tiled-all_gather trsv (see trsv_sharded)."""
    if op.nchunks == 0:
        return b
    ndev = jax.lax.psum(1, "rows")
    my = jax.lax.axis_index("rows").astype(jnp.int32)
    Cloc = op.chunk // ndev
    b_ext = jnp.concatenate([b, jnp.zeros((1,), dtype=b.dtype)])
    x = b_ext[op.in_rows]
    x = jnp.concatenate([x, jnp.zeros((1,), dtype=b.dtype)])

    def body(carry, inputs):
        x, c = carry
        cc, vv = inputs
        contrib = (vv * x[cc]).sum(axis=1)
        cur = jax.lax.dynamic_slice(x, (c + my * jnp.int32(Cloc),), (Cloc,))
        new_full = jax.lax.all_gather(cur - contrib, "rows", axis=0,
                                      tiled=True)
        x = jax.lax.dynamic_update_slice(x, new_full, (c,))
        return (x, c + jnp.int32(op.chunk)), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.int32(0)), (op.cols, op.vals))
    return x[op.out_slots]


def _trsv_op_kernel(op, b):
    if isinstance(op, HaloOp):
        return halo_op_kernel(op, b)
    return ag_op_kernel(op, b)


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
    L_op: Union[AGTrsvOp, HaloOp]
    U_op: Union[AGTrsvOp, HaloOp]
    E_idx: jax.Array       # row-sharded ELL of E (rows padded)
    E_val: jax.Array
    F_idx: jax.Array
    F_val: jax.Array
    m: int
    n: int
    E_rows: int            # padded row count of E
    F_rows: int

    _ARRAYS = ("p", "q_inv", "s_p", "t", "d", "L_op", "U_op",
               "E_idx", "E_val", "F_idx", "F_val")
    _AUX = ("m", "n", "E_rows", "F_rows")

    def tree_flatten(self):
        return (tuple(getattr(self, f) for f in self._ARRAYS),
                tuple(getattr(self, f) for f in self._AUX))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def spec(self) -> "DistLevel":
        sharded2 = P("rows", None)
        rep = P()
        vals = dict(p=rep, q_inv=rep, s_p=rep, t=rep, d=rep,
                    L_op=self.L_op.spec(), U_op=self.U_op.spec(),
                    E_idx=sharded2, E_val=sharded2,
                    F_idx=sharded2, F_val=sharded2)
        return DistLevel(*[vals[f] for f in self._ARRAYS],
                         *[getattr(self, f) for f in self._AUX])


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
        x1 = _trsv_op_kernel(lvl.L_op, wb[:m])
        x1 = x1 / lvl.d
        x1 = _trsv_op_kernel(lvl.U_op, x1)
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
        z = _trsv_op_kernel(lvl.L_op, z)
        z = z / lvl.d
        z = _trsv_op_kernel(lvl.U_op, z)
        sol = jnp.concatenate([z, x_tail])
        x_tail = lvl.t * sol[lvl.q_inv]
    return x_tail


class DistPrec:
    """Mesh-distributed multilevel preconditioner.

    ``comm_elems`` / ``allgather_elems`` aggregate the host-counted halo
    exchange volume over all halo-carried factors vs what the tiled
    all_gather scheme would have moved for the same factors (per solve,
    per trsv application).
    """

    def __init__(self, mesh: Mesh, levels: List[DistLevel],
                 tail: Optional[DenseTail], comm_elems: int = 0,
                 allgather_elems: int = 0, n_halo: int = 0):
        self.mesh = mesh
        self.levels = levels
        self.tail = tail
        self.comm_elems = comm_elems
        self.allgather_elems = allgather_elems
        self.n_halo = n_halo
        specs = [l.spec() for l in levels]
        tail_spec = None if tail is None else jax.tree_util.tree_map(
            lambda _: P(), tail)
        fn = jax.shard_map(_dist_solve, mesh=mesh,
                           in_specs=(specs, tail_spec, P()), out_specs=P(),
                           check_vma=False)
        self._jit = jax.jit(fn)

    @classmethod
    def from_host(cls, mesh: Mesh, M, dtype=None, chunk: int = 256,
                  halo: bool = True) -> "DistPrec":
        """Build from a factorized host :class:`hifir_tpu.api.HIF`.

        ``halo=True`` carries every level's L/U solve with the compact
        per-chunk halo exchange (:mod:`.trsv_halo`); factors it cannot
        carry (single-device mesh, empty factor) fall back to the tiled
        all_gather op.
        """
        dtype = jnp.float64 if dtype is None else dtype
        ndev = mesh.shape["rows"]
        C = max(chunk, ndev)
        C -= C % ndev
        sh3 = NamedSharding(mesh, P(None, "rows", None))
        sh2 = NamedSharding(mesh, P("rows", None))
        rep = NamedSharding(mesh, P())
        comm = ag_comm = n_halo = 0

        def make_op(T, lower):
            nonlocal comm, ag_comm, n_halo
            if halo:
                op = build_halo_op(mesh, T, lower=lower, chunk=C, dtype=dtype)
                if op is not None:
                    comm += op.comm_elems
                    ag_comm += op.allgather_elems
                    n_halo += 1
                    return op
            s = build_trsv_schedule(T, lower=lower, chunk=C, dtype=dtype)
            return AGTrsvOp(
                in_rows=jax.device_put(s.in_rows, rep),
                cols=jax.device_put(s.cols, sh3),
                vals=jax.device_put(s.vals, sh3),
                out_slots=jax.device_put(s.out_slots, rep),
                nchunks=s.nchunks, chunk=C, n=s.n)

        levels = []
        for prec in M.precs:
            m, n = prec.m, prec.n
            Ee = ell_from_csr(pad_rows(prec.E, ndev), dtype=dtype)
            Fe = ell_from_csr(pad_rows(prec.F, ndev), dtype=dtype)
            levels.append(DistLevel(
                p=jax.device_put(jnp.asarray(prec.p, jnp.int32), rep),
                q_inv=jax.device_put(jnp.asarray(prec.q_inv, jnp.int32), rep),
                s_p=jax.device_put(jnp.asarray(prec.s[prec.p], dtype), rep),
                t=jax.device_put(jnp.asarray(prec.t, dtype), rep),
                d=jax.device_put(jnp.asarray(prec.d, dtype), rep),
                L_op=make_op(prec.L_B, True),
                U_op=make_op(prec.U_B, False),
                E_idx=jax.device_put(Ee.indices, sh2),
                E_val=jax.device_put(Ee.values, sh2),
                F_idx=jax.device_put(Fe.indices, sh2),
                F_val=jax.device_put(Fe.values, sh2),
                m=m, n=n, E_rows=Ee.nrows, F_rows=Fe.nrows))
        tail = None
        if M.precs[-1].dense_solver is not None:
            from ..alg.prec import DevicePrec

            dp = DevicePrec.from_host(M.precs, dtype=dtype, chunk=C)
            tail = dp.tail
        return cls(mesh, levels, tail, comm, ag_comm, n_halo)

    def solve(self, b) -> jax.Array:
        """x = M^{-1} b; b and x replicated across the mesh."""
        return self._jit(self.levels, self.tail, jnp.asarray(b))
