"""Multi-host initialization helpers.

For pod slices spanning multiple hosts, JAX requires
``jax.distributed.initialize`` before any backend use; afterwards the global
mesh covers all hosts' devices and every collective in this package
(`all_gather` in the sharded SpMV/trsv/M-solve) rides ICI within a slice and
DCN across slices automatically.  This is the TPU-native replacement for the
multi-process story the reference never had (SURVEY.md §2.7).

Not exercised in CI (single-host environment); the same code paths are
validated on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["initialize_multihost", "global_mesh"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With TPU pod environment variables set (as on Cloud TPU), all arguments
    are auto-detected and may be omitted.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def global_mesh(rhs: int = 1):
    """Mesh over every device in the job (all hosts)."""
    from .mesh import make_mesh

    return make_mesh(len(jax.devices()), rhs=rhs)
