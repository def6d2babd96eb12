"""Pallas block-sparse (BSR) SpMV with scalar-prefetched block indices.

The idiomatic TPU sparse pattern (pallas_guide.md: PrefetchScalarGridSpec):
arbitrary element gathers are not available in Mosaic, but *block* sparsity
maps perfectly — the per-row-block list of nonzero column blocks is a
scalar-prefetch argument whose values drive the input ``BlockSpec`` index
maps, so the pipeline DMAs exactly the needed x/A blocks into VMEM while the
MXU contracts the previous ones.

Best suited to banded/stencil orderings (RCM) and to the mrhs case, where
each (BS x BS) block contracts against a (BS x nrhs) slab of X — a real MXU
matmul per nonzero block.  The ELL/gather path (ops/spmv.py) remains the
general-sparsity fallback.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BSR", "bsr_from_csr", "bsr_matvec_mrhs"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BSR:
    """Block-sparse row format with a uniform per-row-block count (padded
    with zero blocks pointing at block-column 0)."""

    blocks: jax.Array       # (nblocks_rows, KB, BS, BS) dense blocks
    block_cols: jax.Array   # (nblocks_rows, KB) int32 block-column ids
    n: int                  # original size (rows == cols padded to BS)
    bs: int                 # block size

    def tree_flatten(self):
        return ((self.blocks, self.block_cols), (self.n, self.bs))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])

    @property
    def nbr(self) -> int:
        return self.blocks.shape[0]

    @property
    def kb(self) -> int:
        return self.blocks.shape[1]


def bsr_from_csr(A, bs: int = 128, dtype=None) -> BSR:
    """Blockify a host CSR into uniform-KB BSR (zero-padded)."""
    n = A.nrows
    nb = -(-n // bs)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    brow = rows // bs
    bcol = A.indices.astype(np.int64) // bs
    # unique (brow, bcol) pairs
    key = brow * nb + bcol
    uniq, inv = np.unique(key, return_inverse=True)
    ub_row = (uniq // nb).astype(np.int64)
    ub_col = (uniq % nb).astype(np.int64)
    kb_counts = np.bincount(ub_row, minlength=nb)
    KB = max(int(kb_counts.max()) if uniq.size else 1, 1)
    zdt = A.data.dtype if dtype is None else dtype
    blocks = np.zeros((nb, KB, bs, bs), dtype=zdt)
    bcols = np.zeros((nb, KB), dtype=np.int32)
    # slot of each unique block within its row-block
    order = np.argsort(ub_row, kind="stable")
    slot_of_uniq = np.empty(uniq.size, dtype=np.int64)
    start = np.concatenate([[0], np.cumsum(kb_counts)[:-1]])
    slot_of_uniq[order] = np.arange(uniq.size) - start[ub_row[order]]
    bcols[ub_row, slot_of_uniq] = ub_col.astype(np.int32)
    # scatter entries
    blk = slot_of_uniq[inv]
    blocks[brow, blk, rows % bs, A.indices % bs] = A.data.astype(zdt)
    return BSR(jnp.asarray(blocks), jnp.asarray(bcols), n, bs)


def _bsr_kernel(bcols_ref, x_ref, blocks_ref, o_ref, acc_ref):
    i = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # HIGHEST forces true-f32 MXU passes; the default would multiply in bf16
    # (4e-3 relative error — too coarse for a preconditioner apply)
    acc_ref[...] += jnp.dot(blocks_ref[...], x_ref[...],
                            preferred_element_type=acc_ref.dtype,
                            precision=jax.lax.Precision.HIGHEST)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...]


# imported late so the module is importable without TPU support
from jax.experimental import pallas as pl              # noqa: E402
from jax.experimental.pallas import tpu as pltpu       # noqa: E402


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_matvec_mrhs(A: BSR, X: jax.Array, interpret: bool = False) -> jax.Array:
    """Y = A X for X of shape (n_padded, nrhs); Pallas pipelined over blocks.

    The block-column ids are the scalar-prefetch argument; the x BlockSpec
    index map reads them to DMA the right (BS, nrhs) slab per grid step.
    """
    bs, nbr, kb = A.bs, A.nbr, A.kb
    nrhs = X.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, kb),
        in_specs=[
            pl.BlockSpec((None, bs, nrhs),
                         lambda i, k, bc: (bc[i, k], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, bs, bs),
                         lambda i, k, bc: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, bs, nrhs), lambda i, k, bc: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bs, nrhs), X.dtype)],
    )
    Xb = X.reshape(nbr, bs, nrhs)
    out = pl.pallas_call(
        _bsr_kernel,
        out_shape=jax.ShapeDtypeStruct((nbr, bs, nrhs), X.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(A.block_cols, Xb, A.blocks)
    return out.reshape(nbr * bs, nrhs)
