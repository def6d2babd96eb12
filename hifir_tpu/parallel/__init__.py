"""Multi-device execution: mesh, sharded SpMV/IR, distributed trsv + M-solve,
partitioned (domain-decomposed) factorization."""
from .mesh import make_mesh, P, Mesh
from .sharded import (shard_ell_rows, sharded_spmv, make_sharded_ir_step,
                      pad_rows)
from .trsv_sharded import ShardedTrsv, shard_trsv_schedule, sharded_trsv_apply
from .trsv_halo import HaloOp, build_halo_op, halo_trsv_apply
from .prec_sharded import DistPrec
from .multihost import initialize_multihost, global_mesh
from .halo import HaloSpMV, build_halo_spmv, halo_spmv
from .partition import PartitionedHIF, band_partition
