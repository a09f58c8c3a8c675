"""Mesh + sharding layout for the AAE workload.

The reference is strictly single-GPU (SURVEY.md section 2.1: one TF session
pinned to a memory fraction, no collectives of any kind); the multi-device
design here is new and idiomatic JAX:

  * training: 1-D data mesh. The model is ~20M params (replicated); the
    batch, the on-device augmentation, and the loss shard over `data`. XLA
    inserts the psum for the gradient all-reduce over ICI.
  * codebook build: views shard over `data`; each device encodes its chunk
    and the normalized embeddings are all-gathered into the (replicated)
    codebook — the 92,232 x 128 matrix is ~47 MB in f32, cheap to replicate.
  * serving: queries shard over `data` (codebook replicated) by default;
    `codebook_sharding` alternatively shards codebook ROWS over `model` for
    many-object deployments where dozens of per-object codebooks must stay
    HBM-resident.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """A (data, model) mesh over the given devices (defaults: all devices,
    all on the data axis)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} mesh != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def codebook_sharding(
    mesh: Mesh, shard_rows: bool = False, axis: str = MODEL_AXIS
) -> NamedSharding:
    """Codebook layout: replicated by default; row-sharded over `axis` for
    HBM-constrained many-object serving (pair with
    ops.nn_query.make_cosine_top1_sharded, which replicates queries and
    lets GSPMD combine the per-shard (max, argmax) over ICI)."""
    if shard_rows:
        return NamedSharding(mesh, P(axis, None))
    return NamedSharding(mesh, P())
