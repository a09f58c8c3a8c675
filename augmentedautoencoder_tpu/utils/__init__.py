"""Small shared helpers (reference: auto_pose/ae/utils.py)."""

from .misc import (
    batch_iteration_indices,
    lazy_property,
    md5_of,
    tiles,
)

__all__ = [
    "batch_iteration_indices",
    "lazy_property",
    "md5_of",
    "tiles",
]
