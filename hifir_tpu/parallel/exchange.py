"""Generic sharded-vector exchange plans (ppermute packages + compact AG).

A producer-distributed vector (device o owns the contiguous block
``[o*blk, (o+1)*blk)``) is consumed by per-device *need lists* of arbitrary
entry ids.  Instead of replicating the whole vector with a tiled
``all_gather`` (O(n) per device), the host builds a three-leg plan sized to
the real cross-device footprint (the same transport mix as
:mod:`.trsv_halo`):

* ring-neighbor entries ride two ``ppermute`` package sends;
* the far remainder rides one compact ``all_gather`` (union of what any
  non-neighbor device reads, padded to the widest producer);
* a pure compact all_gather is chosen instead when the host count says the
  mix is not cheaper.

Used by :class:`~.prec_sharded.DistPrec` for the inter-level link of the
M-solve down-sweep: the E-SpMV output stays distributed and the next
level's permutation gather fetches exactly its footprint (VERDICT r3 #6 —
this replaces the full-vector all_gather at prec_sharded.py:170-179).

Reference being distributed: the serial inter-level hand-off of
``prec_solve`` (``/root/reference/src/hif/alg/prec_solve.hpp:359-369``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["XPlan", "build_exchange_plan", "xplan_fetch"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class XPlan:
    """Exchange + fetch plan (a pytree; shard_map-able).

    The receive buffer layout on every device is
    ``[own block (blk) | zero sentinel (1) | from-left (Wl) |
    from-right (Wr) | all-gathered (D*Wag)]`` and ``fetch`` holds each
    device's need list pre-translated to buffer coordinates.
    """

    sends: Tuple[jax.Array, ...]  # up to 3 legs of (D, W) producer coords
    fetch: jax.Array              # (D, need_len) buffer coords
    meta: tuple                   # (Wl, Wr, Wag)
    blk: int
    D: int
    comm_elems: int               # host-counted exchanged elements
    allgather_elems: int          # what a tiled all_gather would move

    def tree_flatten(self):
        return ((self.sends, self.fetch),
                (self.meta, self.blk, self.D, self.comm_elems,
                 self.allgather_elems))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def spec(self) -> "XPlan":
        return XPlan(tuple(P("rows", None) for _ in self.sends),
                     P("rows", None), self.meta, self.blk, self.D,
                     self.comm_elems, self.allgather_elems)


def build_exchange_plan(mesh: Mesh, n: int, blk: int,
                        need: np.ndarray) -> XPlan:
    """Build the plan for a producer-block-distributed vector of ``n`` live
    entries (device o owns ``[o*blk, (o+1)*blk)``; ids >= n fetch zero).

    ``need``: (D, need_len) int array of entry ids each device fetches.
    """
    D = mesh.shape["rows"]
    assert need.shape[0] == D
    LIVE = need < n
    owner = np.where(LIVE, need // blk, np.arange(D)[:, None])
    me = np.arange(D)[:, None]
    sentinel = blk  # own-block coord of the appended zero

    # per-consumer foreign sets, split by transport
    fl, fr, far = [], [], []
    for k in range(D):
        f = np.unique(need[k][LIVE[k] & (owner[k] != k)])
        o = f // blk
        fl.append(f[o == k - 1])
        fr.append(f[o == k + 1])
        far.append(f[(o != k - 1) & (o != k + 1)])
    Wl = max((len(s) for s in fl), default=0)
    Wr = max((len(s) for s in fr), default=0)
    union = [np.unique(np.concatenate(
        [far[k][far[k] // blk == o] for k in range(D)]))
        for o in range(D)]
    Wag = max((len(u) for u in union), default=0)
    # pure compact AG alternative (ring legs folded in)
    all_foreign = [np.unique(need[k][LIVE[k] & (owner[k] != k)])
                   for k in range(D)]
    union_all = [np.unique(np.concatenate(
        [all_foreign[k][all_foreign[k] // blk == o] for k in range(D)]))
        for o in range(D)]
    Wag_all = max((len(u) for u in union_all), default=0)
    if D * Wag_all < Wl + Wr + D * Wag:
        fl = [s[:0] for s in fl]
        fr = [s[:0] for s in fr]
        far, union = all_foreign, union_all
        Wl = Wr = 0
        Wag = Wag_all

    off_l = blk + 1
    off_r = off_l + Wl
    off_ag = off_r + Wr
    comm = 0

    # local buffer coordinate of every entry id, per device
    loc = np.full((D, n + 1), sentinel, dtype=np.int64)
    for k in range(D):
        lo, hi = k * blk, min((k + 1) * blk, n)
        if hi > lo:
            loc[k, lo:hi] = np.arange(hi - lo)

    sends = []
    if Wl:
        send_r = np.full((D, Wl), sentinel, dtype=np.int64)
        for k in range(D):
            if k + 1 < D and len(fl[k + 1]):
                send_r[k, :len(fl[k + 1])] = fl[k + 1] - k * blk
            loc[k, fl[k]] = off_l + np.arange(len(fl[k]))
        sends.append(send_r)
        comm += (D - 1) * Wl
    if Wr:
        send_l = np.full((D, Wr), sentinel, dtype=np.int64)
        for k in range(D):
            if k - 1 >= 0 and len(fr[k - 1]):
                send_l[k, :len(fr[k - 1])] = fr[k - 1] - k * blk
            loc[k, fr[k]] = off_r + np.arange(len(fr[k]))
        sends.append(send_l)
        comm += (D - 1) * Wr
    if Wag:
        send = np.full((D, Wag), sentinel, dtype=np.int64)
        for o in range(D):
            if len(union[o]):
                send[o, :len(union[o])] = union[o] - o * blk
            rank = {s: r for r, s in enumerate(union[o])}
            for k in range(D):
                mine = far[k][far[k] // blk == o]
                if len(mine):
                    loc[k, mine] = off_ag + o * Wag \
                        + np.array([rank[s] for s in mine])
        sends.append(send)
        comm += D * (D - 1) * Wag

    fetch = np.where(LIVE, 0, sentinel)
    fetch = np.take_along_axis(
        loc, np.where(LIVE, need, 0).astype(np.int64), axis=1)
    fetch = np.where(LIVE, fetch, sentinel)

    sh2 = NamedSharding(mesh, P("rows", None))
    return XPlan(
        sends=tuple(jax.device_put(jnp.asarray(s.astype(np.int32)), sh2)
                    for s in sends),
        fetch=jax.device_put(jnp.asarray(fetch.astype(np.int32)), sh2),
        meta=(Wl, Wr, Wag), blk=blk, D=D, comm_elems=comm,
        allgather_elems=(D - 1) * D * blk)


def xplan_fetch(plan: XPlan, y_loc: jax.Array) -> jax.Array:
    """shard_map-internal: exchange and fetch.  ``y_loc`` is this device's
    (blk,) producer block; returns the (need_len,) fetched entries."""
    D = plan.D
    Wl, Wr, Wag = plan.meta
    buf = jnp.concatenate([y_loc, jnp.zeros((1,), y_loc.dtype)])
    legs = iter(plan.sends)
    if Wl:
        right = [(d, d + 1) for d in range(D - 1)]
        buf = jnp.concatenate(
            [buf, jax.lax.ppermute(buf[next(legs)[0]], "rows", right)])
    if Wr:
        left = [(d, d - 1) for d in range(1, D)]
        buf = jnp.concatenate(
            [buf, jax.lax.ppermute(buf[next(legs)[0]], "rows", left)])
    if Wag:
        pkg = buf[next(legs)[0]]
        buf = jnp.concatenate(
            [buf, jax.lax.all_gather(pkg, "rows", axis=0, tiled=True)])
    return buf[plan.fetch[0]]
