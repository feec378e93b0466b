"""Multi-host initialization.

The reference is single-process/single-GPU; this is the multi-host
entry for TPU pods: call ``initialize()`` once per process before any
device use, then build the mesh over ``jax.devices()`` (which spans all
hosts after initialization).  Collectives ride ICI within a slice and DCN
across slices — both emitted by XLA from the sharding annotations; no
NCCL/MPI-style backend code exists anywhere in this framework.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with TPU auto-detection by default.

    On Cloud TPU all arguments are discovered from the metadata server;
    pass them explicitly for other clusters.  Safe to call once per
    process; a no-op in single-process runs when no coordinator is given.
    """
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            return  # single-process environment
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def process_info() -> dict:
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices())}
