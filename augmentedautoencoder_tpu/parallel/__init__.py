"""Device-mesh parallelism: sharding layouts for training and serving."""

from .distributed import host_replicate, initialize, is_primary
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    codebook_sharding,
    make_mesh,
    replicated,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "codebook_sharding",
    "host_replicate",
    "initialize",
    "is_primary",
    "make_mesh",
    "replicated",
]
