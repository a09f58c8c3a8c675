"""Multi-host initialization (new capability — the reference is strictly
single-process/single-GPU, SURVEY.md section 2.1).

On multi-host TPU pods: call `initialize()` once per process before any jax
computation; each host then sees its local devices while `jax.devices()`
spans the pod, and the data mesh in parallel/mesh.py rides ICI within a
slice and DCN across slices automatically under pjit.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize with env fallbacks; returns True if a
    multi-process runtime was started (False for single-process runs)."""
    import jax

    num_processes = num_processes or int(os.environ.get("AAE_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0


def host_replicate(tree, mesh):
    """Replicate a pytree of (identical-per-process) host values onto every
    device of a possibly multi-process mesh.

    In single-process runs `jax.device_put` suffices, but in a multi-host
    mesh the target sharding spans non-addressable devices; each process
    contributes its local shards via `make_array_from_process_local_data`
    (for a fully-replicated layout, the local data IS the full array). Use
    this to place the train state, the rng key, and the HBM-resident data
    arrays before a multi-host `make_train_step(..., mesh=mesh)`.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec())

    def put(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, tree)
