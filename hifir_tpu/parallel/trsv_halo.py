"""Distributed level-scheduled trsv with neighbor-halo ``ppermute`` exchange.

Replaces the per-chunk full-vector tiled ``all_gather`` of
:mod:`.trsv_sharded` (the BASELINE north-star item: "partitioned triangular
solve with halo exchange of vector segments via ppermute overlapped with
local compute"; the serial kernel it distributes is the reference
``solve_as_strict_lower``, ``/root/reference/src/hif/ds/CompressedStorage.hpp:2268``).

Layout
------
Chunks of the level schedule are split across the ``rows`` mesh axis exactly
as in :mod:`.trsv_sharded` (device k owns slot slice ``[c*C + k*Cloc,
c*C + (k+1)*Cloc)`` of every chunk c), but the solution now lives
*distributed*: device k keeps only its own slices — ``nchunks*Cloc``
entries — plus a halo region holding the foreign slots its rows actually
read.  For banded/RCM-ordered factors the positional split of each level
set means those foreign slots live on the ring neighbors k±1 (the same
geometric-locality argument as :mod:`.halo` for SpMV); the builder verifies
this and returns ``None`` when any dependency crosses more than one device,
so callers fall back to the all_gather variant.

Per chunk the exchange is two ``ppermute`` package sends (right and left)
whose width is the *dependency halo* — host-counted, typically ≪ C — instead
of the ``C - Cloc`` elements every device receives from the tiled
all_gather.  The packages for chunk c are sent right after c's local FMA
completes, while the (independent) gather/FMA of the next chunk can overlap
under XLA's async collectives.  ``comm_elems`` / ``allgather_elems`` record
the host-counted exchange volume for both schemes; tests assert the
reduction.

Entry/exit remain single collectives (gather b, reassemble x) — the
O(n)-per-device *working* state of the old scheme is what this removes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.trsv import build_trsv_schedule

__all__ = ["HaloTrsv", "build_halo_trsv", "halo_trsv_apply"]


@dataclasses.dataclass
class HaloTrsv:
    """Host container of the placed per-device schedule arrays."""

    mesh: Mesh
    gcols: jax.Array        # (D, nchunks, Cloc, K) int32 LOCAL coords
    gvals: jax.Array        # (D, nchunks, Cloc, K)
    in_rows: jax.Array      # (D, nchunks*Cloc) int32 rows feeding own slots
    out_slots: jax.Array    # (n,) int32 slot of each row (replicated)
    send_r: jax.Array       # (D, nchunks, Wr) int32 local coords to send right
    send_l: jax.Array       # (D, nchunks, Wl)
    hl_off: jax.Array       # (nchunks,) int32 halo-from-left write offsets
    hr_off: jax.Array       # (nchunks,) int32
    n: int
    nchunks: int
    chunk: int
    Cloc: int
    own_len: int            # nchunks * Cloc
    buf_len: int            # own + halo + 1 pad slot
    Wr: int
    Wl: int
    comm_elems: int         # host-counted exchanged elements (both dirs, all devs)
    allgather_elems: int    # what the tiled all_gather scheme would move


def build_halo_trsv(mesh: Mesh, T, lower: bool, chunk: int = 256,
                    dtype=None) -> Optional[HaloTrsv]:
    """Build the halo schedule; ``None`` when a dependency is non-neighbor
    (caller should fall back to the all_gather variant)."""
    D = mesh.shape["rows"]
    C = max(chunk, D)
    C -= C % D
    sched = build_trsv_schedule(T, lower=lower, chunk=C, dtype=dtype)
    nchunks = sched.nchunks
    if nchunks == 0 or D == 1:
        return None
    Cloc = C // D
    nslots = nchunks * C
    n = sched.n

    cols = np.asarray(sched.cols)          # (nchunks, C, K) global slot ids
    vals = np.asarray(sched.vals)
    K = cols.shape[2]
    own_len = nchunks * Cloc

    # ownership / local own coordinate of every global slot
    slot = np.arange(nslots, dtype=np.int64)
    owner = (slot % C) // Cloc
    own_coord = (slot // C) * Cloc + (slot % C) - owner * Cloc

    # per device: dependency analysis
    dep = cols.reshape(nchunks, D, Cloc, K).transpose(1, 0, 2, 3)  # (D,...)
    dvals = vals.reshape(nchunks, D, Cloc, K).transpose(1, 0, 2, 3)
    pad = dep >= nslots  # sentinel
    dep_owner = np.where(pad, -1, owner[np.minimum(dep, nslots - 1)])
    me = np.arange(D)[:, None, None, None]
    foreign = (~pad) & (dep_owner != me)
    delta = dep_owner - me
    if np.any(foreign & (np.abs(delta) > 1)):
        return None  # non-neighbor dependency: fall back

    # halo slot sets per (receiving device k, producing chunk pc, direction)
    # direction left = produced on k-1 (arrives via send-right), right = k+1
    dep_chunk = dep // C
    halo_sets_l = [[np.unique(dep[k][foreign[k] & (delta[k] == -1)
                                      & (dep_chunk[k] == pc)])
                    for pc in range(nchunks)] for k in range(D)]
    halo_sets_r = [[np.unique(dep[k][foreign[k] & (delta[k] == 1)
                                      & (dep_chunk[k] == pc)])
                    for pc in range(nchunks)] for k in range(D)]
    Wr = max((len(s) for dev in halo_sets_l for s in dev), default=0)
    Wl = max((len(s) for dev in halo_sets_r for s in dev), default=0)
    Wr = max(Wr, 1)
    Wl = max(Wl, 1)

    buf_len = own_len + nchunks * (Wr + Wl) + 1
    LPAD = buf_len - 1
    hl_off = own_len + np.arange(nchunks, dtype=np.int32) * Wr
    hr_off = (own_len + nchunks * Wr
              + np.arange(nchunks, dtype=np.int32) * Wl)

    # local coordinate of a foreign dependency inside the halo regions
    gcols = np.full((D, nchunks, Cloc, K), LPAD, dtype=np.int32)
    send_r = np.full((D, nchunks, Wr), LPAD, dtype=np.int32)
    send_l = np.full((D, nchunks, Wl), LPAD, dtype=np.int32)
    comm = 0
    for k in range(D):
        # map: global slot -> local coord on device k
        loc = np.full(nslots + 1, LPAD, dtype=np.int64)
        mine = owner == k
        loc[:nslots][mine] = own_coord[mine]
        for pc in range(nchunks):
            sl = halo_sets_l[k][pc]
            loc[sl] = hl_off[pc] + np.arange(len(sl))
            sr = halo_sets_r[k][pc]
            loc[sr] = hr_off[pc] + np.arange(len(sr))
            comm += len(sl) + len(sr)
        dk = np.where(pad[k], nslots, dep[k])
        gcols[k] = loc[dk]
        # what k must SEND: the sets its neighbors receive, in their order
        for pc in range(nchunks):
            if k + 1 < D:
                s = halo_sets_l[k + 1][pc]   # produced on k, consumed on k+1
                send_r[k, pc, :len(s)] = own_coord[s]
            if k - 1 >= 0:
                s = halo_sets_r[k - 1][pc]
                send_l[k, pc, :len(s)] = own_coord[s]

    in_rows = np.asarray(sched.in_rows).reshape(nchunks, D, Cloc) \
        .transpose(1, 0, 2).reshape(D, own_len)

    sh = NamedSharding(mesh, P("rows"))
    shn = NamedSharding(mesh, P())

    def put(a, spec):
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

    return HaloTrsv(
        mesh=mesh,
        gcols=put(gcols, P("rows", None, None, None)),
        gvals=put(dvals.copy(), P("rows", None, None, None)),
        in_rows=put(in_rows, P("rows", None)),
        out_slots=put(np.asarray(sched.out_slots), P()),
        send_r=put(send_r, P("rows", None, None)),
        send_l=put(send_l, P("rows", None, None)),
        hl_off=put(hl_off, P()),
        hr_off=put(hr_off, P()),
        n=n, nchunks=nchunks, chunk=C, Cloc=Cloc, own_len=own_len,
        buf_len=buf_len, Wr=Wr, Wl=Wl, comm_elems=comm,
        allgather_elems=D * nchunks * (C - Cloc))


def _halo_kernel(nchunks, Cloc, own_len, buf_len, Wr, Wl, D,
                 gcols, gvals, in_rows, out_slots, send_r, send_l,
                 hl_off, hr_off, b):
    gcols, gvals = gcols[0], gvals[0]            # (nchunks, Cloc, K)
    in_rows, send_r, send_l = in_rows[0], send_r[0], send_l[0]
    right = [(d, d + 1) for d in range(D - 1)]
    left = [(d, d - 1) for d in range(1, D)]

    b_ext = jnp.concatenate([b, jnp.zeros((1,), dtype=b.dtype)])
    x = jnp.zeros((buf_len,), dtype=b.dtype)
    x = jax.lax.dynamic_update_slice(x, b_ext[in_rows], (0,))

    def body(carry, xs):
        x, own_off = carry
        cc, vv, sr, sl, hlo, hro = xs
        contrib = (vv * x[cc]).sum(axis=1)
        cur = jax.lax.dynamic_slice(x, (own_off,), (Cloc,))
        x = jax.lax.dynamic_update_slice(x, cur - contrib, (own_off,))
        # neighbor halo exchange of just-produced slots (edge devices
        # receive zeros -- never read by construction)
        pkg_r = x[sr]
        recv_l = jax.lax.ppermute(pkg_r, "rows", right)
        x = jax.lax.dynamic_update_slice(x, recv_l, (hlo,))
        pkg_l = x[sl]
        recv_r = jax.lax.ppermute(pkg_l, "rows", left)
        x = jax.lax.dynamic_update_slice(x, recv_r, (hro,))
        return (x, own_off + jnp.int32(Cloc)), None

    (x, _), _ = jax.lax.scan(
        body, (x, jnp.int32(0)),
        (gcols, gvals, send_r, send_l, hl_off, hr_off))
    # reassemble: own slices -> full slot vector -> row order (one collective)
    own = x[:own_len].reshape(nchunks, Cloc)
    full = jax.lax.all_gather(own, "rows", axis=1, tiled=True)  # (nchunks, C)
    return full.reshape(-1)[out_slots]


def halo_trsv_apply(ht: HaloTrsv, b: jax.Array) -> jax.Array:
    """Solve (I + strict(T)) x = b; b and x replicated at the interface,
    the working vector sharded."""
    D = ht.mesh.shape["rows"]
    fn = jax.shard_map(
        functools.partial(_halo_kernel, ht.nchunks, ht.Cloc, ht.own_len,
                          ht.buf_len, ht.Wr, ht.Wl, D),
        mesh=ht.mesh,
        in_specs=(P("rows", None, None, None), P("rows", None, None, None),
                  P("rows", None), P(), P("rows", None, None),
                  P("rows", None, None), P(), P(), P()),
        out_specs=P(),
        check_vma=False)
    return jax.jit(fn)(ht.gcols, ht.gvals, ht.in_rows, ht.out_slots,
                       ht.send_r, ht.send_l, ht.hl_off, ht.hr_off,
                       jnp.asarray(b))
