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
