"""Codebook nearest-neighbor query kernels.

The reference computes `l2_normalize(z) @ embedding^T` as one dense TF matmul
and argmaxes on the host per crop (auto_pose/ae/codebook.py:50-75). Here:

  * `cosine_similarity_topk` — XLA path: normalize, matmul, lax.top_k.
    General (any k, upright striding) and the fallback on CPU.
  * `cosine_top1_pallas` — fused Pallas kernel for the serving hot path:
    tiles the (N, D) codebook through VMEM, runs each (B, D) x (D, TILE)
    block on the MXU and keeps a running (max, argmax) in VMEM scratch —
    the (B, N) similarity matrix never exists in HBM, so the kernel is
    HBM-bandwidth-bound on the codebook read alone (~47 MB for 92k x 128).

Codebook rows are expected pre-normalized (done once at embed time,
reference codebook.py:214).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128
_DEFAULT_TILE_N = 2048


def l2_normalize(z: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    return z * jax.lax.rsqrt(jnp.maximum((z * z).sum(axis=axis, keepdims=True), eps))


# ---------------------------------------------------------------- XLA path

@functools.partial(jax.jit, static_argnames=("k",))
def cosine_similarity_topk(z: Array, codebook: Array, k: int = 1) -> Tuple[Array, Array]:
    """Top-k cosine matches: returns (values (B,k), indices (B,k))."""
    q = l2_normalize(z)
    cos = jnp.dot(q, codebook.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(cos, k)


@jax.jit
def cosine_similarities(z: Array, codebook: Array) -> Array:
    """Full (B, N) cosine similarity matrix (for top-n/upright host logic)."""
    return jnp.dot(l2_normalize(z), codebook.T, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "stride", "tta"))
def cosine_topk(
    z: Array, codebook: Array, k: int, stride: int = 1, tta: int = 1
) -> Tuple[Array, Array]:
    """Device-side ranked top-k with the estimation-path extras fused:
    optional TTA row-mean over `tta` jittered crops per detection and the
    `upright` in-plane-free stride restriction (reference codebook.py:66),
    indices returned global. Only (B, k) scalars leave the device — the
    aggregation / re-scoring paths used to fetch the full (B, N) cosine
    matrix to the host (~8.8 MB/call at 92k rows through the tunnel).
    """
    cos = jnp.dot(l2_normalize(z), codebook.T, preferred_element_type=jnp.float32)
    if tta > 1:
        cos = cos.reshape(-1, tta, cos.shape[-1]).mean(axis=1)
    if stride > 1:
        cos = cos[:, ::stride]
    vals, idcs = jax.lax.top_k(cos, k)
    return vals, (idcs * stride).astype(jnp.int32)


# ---------------------------------------------------------------- Pallas path

def _top1_kernel(n_valid: int, z_ref, cb_ref, val_ref, idx_ref, run_val, run_idx):
    """Grid over codebook tiles; running (max, argmax) lives in VMEM scratch."""
    i = pl.program_id(0)
    tile_n = cb_ref.shape[0]

    scores = jax.lax.dot_general(
        z_ref[:],
        cb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),  # (B,D) x (TILE,D)^T
        preferred_element_type=jnp.float32,
    )  # (B, TILE)

    # mask padded codebook rows (cos in [-1,1] so -2 never wins)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + i * tile_n
    scores = jnp.where(col < n_valid, scores, -2.0)

    tile_val = jnp.max(scores, axis=1, keepdims=True)  # (B, 1)
    tile_idx = jnp.argmax(scores, axis=1).reshape(-1, 1).astype(jnp.int32) + i * tile_n

    @pl.when(i == 0)
    def _():
        run_val[:] = tile_val
        run_idx[:] = tile_idx

    @pl.when(i > 0)
    def _():
        better = tile_val > run_val[:]
        run_val[:] = jnp.where(better, tile_val, run_val[:])
        run_idx[:] = jnp.where(better, tile_idx, run_idx[:])

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        val_ref[:] = run_val[:]
        idx_ref[:] = run_idx[:]


@functools.partial(jax.jit, static_argnames=("tile_n",))
def cosine_top1_pallas(
    z: Array, codebook: Array, tile_n: int = _DEFAULT_TILE_N
) -> Tuple[Array, Array]:
    """Fused normalize -> tiled codebook matmul -> argmax. Returns
    (values (B,), indices (B,)). TPU only; use `cosine_top1` for dispatch."""
    b, d = z.shape
    n = codebook.shape[0]
    # normalize in the query dtype (f32 latent head), then match the
    # codebook dtype: a bf16 codebook halves the kernel's HBM traffic and
    # the dot still accumulates in f32 (preferred_element_type)
    q = l2_normalize(z).astype(codebook.dtype)

    n_pad = -n % tile_n
    if n_pad:
        codebook = jnp.pad(codebook, ((0, n_pad), (0, 0)))
    num_tiles = codebook.shape[0] // tile_n

    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, 1), jnp.int32),
        ],
    )
    vals, idcs = pl.pallas_call(
        functools.partial(_top1_kernel, n),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * codebook.shape[0],
            bytes_accessed=(codebook.shape[0] + b) * d * codebook.dtype.itemsize
            + b * 8,
            transcendentals=0,
        ),
    )(q, codebook)
    return vals[:, 0], idcs[:, 0]


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def cosine_top1(z: Array, codebook: Array) -> Tuple[Array, Array]:
    """Best match per query: Pallas kernel on TPU, XLA elsewhere."""
    if _on_tpu():
        return cosine_top1_pallas(z, codebook)
    vals, idcs = cosine_similarity_topk(z, codebook, 1)
    return vals[:, 0], idcs[:, 0]


def make_cosine_top1_sharded(mesh, axis: str = "data"):
    """Multi-chip codebook query: rows shard over `axis`, queries replicate.

    For deployments whose resident codebooks outgrow one chip's HBM (e.g.
    30 objects x 92,232 x 128 already ~1.4 GB f32; larger view counts or
    object sets scale linearly), the (N, D) codebook lives row-sharded
    across the mesh (parallel.codebook_sharding). Each device scores its
    rows and GSPMD combines the (max, argmax) across shards over ICI — the
    cross-device traffic is O(B) scalars, never the similarity matrix.

    Returns a jitted (z, codebook) -> (vals (B,), idcs (B,)) whose codebook
    argument must be placed with the matching row-sharded layout.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(axis, None))

    @functools.partial(
        jax.jit, in_shardings=(rep, rows), out_shardings=(rep, rep)
    )
    def query(z: Array, codebook: Array) -> Tuple[Array, Array]:
        q = l2_normalize(z).astype(codebook.dtype)
        cos = jnp.matmul(q, codebook.T, preferred_element_type=jnp.float32)
        idx = jnp.argmax(cos, axis=1)
        val = jnp.take_along_axis(cos, idx[:, None], axis=1)[:, 0]
        return val, idx.astype(jnp.int32)

    return query


def make_cosine_topk_sharded(mesh, k: int, axis: str = "data"):
    """Row-sharded top-k query for the serving aggregation path at
    multi-chip scale (`topk_aggregate` / `topk_rescore`, PERF.md round 4).

    Same deployment shape as make_cosine_top1_sharded — codebook rows
    shard over `axis`, queries replicate — but communication-explicit via
    shard_map: each device ranks its OWN rows' top-k (a local lax.top_k
    over (B, N/S)), then the (B, k) candidate lists all_gather over ICI
    and re-rank. Cross-device traffic is O(B * k * n_shards) scalars —
    never the (B, N) similarity matrix, and 8x less than gathering row
    maxima per query at k=8 on 8 shards vs a replicated matmul's N rows.

    Ties resolve to the lowest global row index (gathered candidates are
    shard-major ascending), matching lax.top_k over the full matrix.

    Returns a jitted (z, codebook) -> (vals (B, k), idcs (B, k)) whose
    codebook argument must be placed row-sharded
    (parallel.codebook_sharding(shard_rows=True)).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(axis, None))

    def _local(z, cb):
        # z replicated (B, D); cb this shard's (N/S, D) rows
        q = l2_normalize(z).astype(cb.dtype)
        cos = jnp.matmul(q, cb.T, preferred_element_type=jnp.float32)
        v, i = jax.lax.top_k(cos, k)  # (B, k) local, best-first
        offset = jax.lax.axis_index(axis) * cb.shape[0]
        i = (i + offset).astype(jnp.int32)
        vg = jax.lax.all_gather(v, axis, axis=1, tiled=True)  # (B, k*S)
        ig = jax.lax.all_gather(i, axis, axis=1, tiled=True)
        vals, pos = jax.lax.top_k(vg, k)
        return vals, jnp.take_along_axis(ig, pos, axis=1)

    shmapped = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shmapped, in_shardings=(rep, rows), out_shardings=(rep, rep))
