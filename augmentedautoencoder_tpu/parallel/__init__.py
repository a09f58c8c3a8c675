"""Device-mesh parallelism: sharding layouts for training and serving."""

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
    "make_mesh",
    "replicated",
]
