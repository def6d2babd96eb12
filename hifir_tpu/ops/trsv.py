"""Level-scheduled sparse triangular solve for TPU.

This is the make-or-break kernel of the M-solve path (SURVEY.md §7.3.3),
replacing the inherently sequential reference trsv
(``/root/reference/src/hif/ds/CompressedStorage.hpp:1358,1451``) with a
TPU-friendly formulation:

1. **Host schedule** (built once at factorize time): compute the dependency
   levels of the triangular factor; rows within a level are independent.
2. **Chunk alignment**: rows are laid out level-by-level into fixed-size
   chunks of C rows; each level is padded up to a chunk boundary, so a chunk
   never contains intra-chunk dependencies.  Total padding is bounded by
   (#levels * C).
3. **Slot-ordered storage, scatter-free**: the solution vector is kept in
   *slot order* (the schedule order); dependency column ids are remapped to
   slot ids on host.  Each scan step is then gather (fast on TPU) + FMA +
   ``dynamic_update_slice`` of a contiguous chunk — no scatter at all, which
   matters because XLA TPU serializes scatters with (possibly duplicate)
   dynamic indices.  Entry/exit are single gathers between row and slot order.

The same machinery solves the strict upper factor by scheduling on reversed
dependencies.  Multiple RHS vectorize with ``jax.vmap``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TrsvSchedule", "build_trsv_schedule", "trsv_apply",
           "trsv_apply_mrhs"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrsvSchedule:
    """Chunked level schedule of a unit-diagonal triangular factor."""

    in_rows: jax.Array   # (nslots,) int32: row feeding each slot (pad -> n)
    cols: jax.Array      # (nchunks, C, K) int32 slot ids of deps (pad -> nslots)
    vals: jax.Array      # (nchunks, C, K)
    out_slots: jax.Array  # (n,) int32: slot holding each row's solution
    n: int               # static
    nchunks: int         # static
    chunk: int           # static
    nlevels: int         # static

    def tree_flatten(self):
        return ((self.in_rows, self.cols, self.vals, self.out_slots),
                (self.n, self.nchunks, self.chunk, self.nlevels))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _compute_levels(n, indptr, indices, lower: bool) -> np.ndarray:
    from ..pre import _native

    lev = _native.trsv_levels(n, indptr, indices, lower)
    if lev is not None:
        return lev
    lev = np.zeros(n, dtype=np.int64)
    rng = range(n) if lower else range(n - 1, -1, -1)
    for i in rng:
        mx = -1
        for k in range(indptr[i], indptr[i + 1]):
            j = indices[k]
            dep = j < i if lower else j > i
            if dep and lev[j] > mx:
                mx = lev[j]
        lev[i] = mx + 1
    return lev


def _segment_gather(starts, lens):
    """Flat positions of concatenated segments [starts_i, starts_i + lens_i)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    seg_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return (np.repeat(starts, lens)
            + np.arange(total, dtype=np.int64) - np.repeat(seg_off, lens))


def build_trsv_schedule(T, lower: bool, chunk: int = 256, dtype=None
                        ) -> TrsvSchedule:
    """Build the device schedule for ``(I + strict(T))^{-1}``.

    ``T`` is a host CSR whose strict lower (or upper) triangle is the factor.
    """
    n = T.nrows
    indptr, indices, data = T.indptr, T.indices, T.data
    zdt = data.dtype if dtype is None else dtype
    if n == 0:
        return TrsvSchedule(jnp.zeros((0,), jnp.int32),
                            jnp.zeros((0, chunk, 1), jnp.int32),
                            jnp.zeros((0, chunk, 1), zdt),
                            jnp.zeros((0,), jnp.int32), 0, 0, chunk, 0)

    # strict dependency entries (vectorized)
    rows_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    keep = (indices < rows_of) if lower else (indices > rows_of)
    dep_rows = rows_of[keep]
    dep_cols = indices[keep].astype(np.int64)
    dep_vals = data[keep]
    dcount = np.bincount(dep_rows, minlength=n)
    dstart = np.concatenate([[0], np.cumsum(dcount)])

    lev = _compute_levels(n, indptr, indices, lower)
    nlev = int(lev.max()) + 1

    # rows sorted by level; pad each level to a chunk boundary
    row_order = np.argsort(lev, kind="stable")
    lev_sizes = np.bincount(lev, minlength=nlev)
    padded_sizes = -(-lev_sizes // chunk) * chunk
    total_slots = int(padded_sizes.sum())
    all_rows = np.full(total_slots, n, dtype=np.int64)
    out_start = np.concatenate([[0], np.cumsum(padded_sizes)[:-1]])
    pos_in_level = np.arange(n, dtype=np.int64) - np.concatenate(
        [[0], np.cumsum(lev_sizes)[:-1]])[lev[row_order]]
    slot_of = np.empty(n, dtype=np.int64)
    slots = out_start[lev[row_order]] + pos_in_level
    all_rows[slots] = row_order
    slot_of[row_order] = slots

    nchunks = total_slots // chunk
    K = max(int(dcount.max()) if n else 0, 1)
    cols2d = np.full((total_slots, K), total_slots, dtype=np.int32)
    vals2d = np.zeros((total_slots, K), dtype=zdt)

    real_slots = np.flatnonzero(all_rows < n)
    rr = all_rows[real_slots]
    lens = dcount[rr]
    flat = _segment_gather(dstart[rr], lens)
    out_slot = np.repeat(real_slots, lens)
    out_off = (np.arange(flat.size, dtype=np.int64)
               - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]), lens))
    cols2d[out_slot, out_off] = slot_of[dep_cols[flat]]
    vals2d[out_slot, out_off] = dep_vals[flat]

    return TrsvSchedule(jnp.asarray(all_rows.astype(np.int32)),
                        jnp.asarray(cols2d.reshape(nchunks, chunk, K)),
                        jnp.asarray(vals2d.reshape(nchunks, chunk, K)),
                        jnp.asarray(slot_of.astype(np.int32)),
                        n, nchunks, chunk, nlev)


def trsv_apply(sched: TrsvSchedule, b: jax.Array) -> jax.Array:
    """Solve (I + strict(T)) x = b on device via the chunked level scan."""
    if sched.nchunks == 0:
        return b
    C = sched.chunk
    b_ext = jnp.concatenate([b, jnp.zeros((1,), dtype=b.dtype)])
    x = b_ext[sched.in_rows]                       # slot order, pads read 0
    x = jnp.concatenate([x, jnp.zeros((1,), dtype=b.dtype)])  # sentinel slot

    def body(carry, inputs):
        x, c = carry
        cols, vals = inputs
        g = x[cols]                                # (C, K)
        contrib = (vals * g).sum(axis=1)
        cur = jax.lax.dynamic_slice(x, (c,), (C,))
        x = jax.lax.dynamic_update_slice(x, cur - contrib, (c,))
        return (x, c + C), None

    (x, _), _ = jax.lax.scan(body, (x, 0), (sched.cols, sched.vals))
    return x[sched.out_slots]


def trsv_apply_mrhs(sched: TrsvSchedule, B: jax.Array) -> jax.Array:
    """Solve with multiple RHS, B of shape (n, nrhs)."""
    if sched.nchunks == 0:
        return B
    C = sched.chunk
    nrhs = B.shape[1]
    B_ext = jnp.concatenate([B, jnp.zeros((1, nrhs), dtype=B.dtype)])
    x = B_ext[sched.in_rows]
    x = jnp.concatenate([x, jnp.zeros((1, nrhs), dtype=B.dtype)])

    def body(carry, inputs):
        x, c = carry
        cols, vals = inputs
        g = x[cols]                                # (C, K, nrhs)
        contrib = jnp.einsum("ck,ckj->cj", vals, g)
        cur = jax.lax.dynamic_slice(x, (c, 0), (C, nrhs))
        x = jax.lax.dynamic_update_slice(x, cur - contrib, (c, 0))
        return (x, c + C), None

    (x, _), _ = jax.lax.scan(body, (x, 0), (sched.cols, sched.vals))
    return x[sched.out_slots]
