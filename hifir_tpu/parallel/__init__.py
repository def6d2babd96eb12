"""Multi-device execution: mesh, sharded SpMV, distributed IR step."""
from .mesh import make_mesh, P, Mesh
from .sharded import (shard_ell_rows, sharded_spmv, make_sharded_ir_step,
                      pad_rows)
