"""Multi-object codebook serving: mixed-object query batches, one kernel.

The multi-object deployment (30 T-LESS objects -> 30 codebooks of 92,232 x
128 ~= 1.4 GB f32 total) keeps all codebooks as ONE stacked HBM array
(O, N, D). A query batch with per-query object ids runs as a single Pallas
kernel: the grid walks codebook tiles; each tile is DMA'd once from the HBM
slab per (object-group, tile) pair via scalar-prefetched object ids, scores
on the MXU, and a running (max, argmax) per query lives in VMEM scratch.

The reference holds one TF graph per object and loops detections one
session.run at a time (m3_interface/ae_pose_estimator.py:143-229).

Fallback (`multi_codebook_top1_xla`) sorts queries by object on the host and
runs per-object matmuls — used off-TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE_N = 2048


def _mc_top1_kernel(obj_ids_ref, z_ref, cb_ref, val_ref, idx_ref, run_val, run_idx):
    """Grid: (num_tiles,). cb block index_map consumes the prefetched object
    id of the current query GROUP (all queries in one call share obj id; the
    host groups mixed batches — see multi_codebook_top1). The prefetch ref
    carries [obj_id, n_valid]; rows >= n_valid are zero padding and must
    never win (cos 0.0 beats any all-negative true match otherwise)."""
    i = pl.program_id(0)
    tile_n = cb_ref.shape[0]
    n_valid = obj_ids_ref[1]

    scores = jax.lax.dot_general(
        z_ref[:], cb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + i * tile_n
    scores = jnp.where(col < n_valid, scores, -2.0)

    tile_val = jnp.max(scores, axis=1, keepdims=True)
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
def grouped_codebook_top1(
    z: Array,
    codebooks: Array,
    obj_id: Array,
    n_valid: Array | None = None,
    tile_n: int = _TILE_N,
) -> Tuple[Array, Array]:
    """Top-1 for a batch of queries that all share ONE object id.

    codebooks: (O, N_pad, D) stacked, rows l2-normalized, padded rows zero.
    obj_id: () int32 — scalar-prefetched so the kernel DMAs only that
    object's tiles out of the HBM slab.
    n_valid: () int32 — this object's true codebook length; padded rows at
    indices >= n_valid are masked out (defaults to N_pad = no padding).
    """
    b, d = z.shape
    o, n_pad, _ = codebooks.shape
    assert n_pad % tile_n == 0
    num_tiles = n_pad // tile_n
    if n_valid is None:
        n_valid = jnp.asarray(n_pad, jnp.int32)

    from .nn_query import l2_normalize

    # match the slab dtype after f32 normalization (bf16 slabs halve the
    # kernel's HBM read; the dot still accumulates f32)
    q = l2_normalize(z).astype(codebooks.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, obj: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_n, d),
                lambda i, obj: (obj[0], i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((b, 1), lambda i, obj: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, obj: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, 1), jnp.int32),
        ],
    )

    def kernel(obj_ids_ref, z_ref, cb_ref, val_ref, idx_ref, run_val, run_idx):
        _mc_top1_kernel(
            obj_ids_ref, z_ref, cb_ref[0], val_ref, idx_ref, run_val, run_idx
        )

    vals, idcs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * n_pad,
            bytes_accessed=(n_pad + b) * d * codebooks.dtype.itemsize,
            transcendentals=0,
        ),
    )(jnp.stack([obj_id.astype(jnp.int32), jnp.asarray(n_valid, jnp.int32)]), q, codebooks)
    return vals[:, 0], idcs[:, 0]


def _mc_topk_kernel(k, stride, obj_ids_ref, z_ref, cb_ref, val_ref, idx_ref,
                    run_val, run_idx):
    """Grid over codebook tiles; a running sorted top-k lives in VMEM
    scratch (the grouped top-1 kernel's proven output pattern — constant
    (B, k) output block written once at the last grid step). Each tile's
    top-k comes from k unrolled max-and-mask passes over the (B, TILE)
    scores; merging with the running set is k more passes over the
    concatenated (B, 2k) candidates. `stride` masks the in-plane-rotation
    candidates for `upright` serving (reference codebook.py:66): keeping
    only cols with col % stride == 0 is exactly the XLA path's
    cos[:, ::stride] candidate set, with indices already global. Ties
    resolve to the lowest global index (earlier tiles sit first in the
    merge concat; argmax picks the first maximum), matching lax.top_k
    over the full masked matrix."""
    i = pl.program_id(0)
    tile_n = cb_ref.shape[0]
    n_valid = obj_ids_ref[1]

    scores = jax.lax.dot_general(
        z_ref[:], cb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, TILE) f32
    col_local = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    col = col_local + i * tile_n
    valid = col < n_valid
    if stride > 1:
        valid = jnp.logical_and(valid, col % stride == 0)
    scores = jnp.where(valid, scores, -2.0)

    vals = []
    idcs = []
    for _ in range(k):
        v = jnp.max(scores, axis=1)
        a = jnp.argmax(scores, axis=1).astype(jnp.int32)
        vals.append(v)
        idcs.append(a + i * tile_n)
        scores = jnp.where(col_local == a[:, None], -3.0, scores)
    tile_val = jnp.stack(vals, axis=1)  # (B, k) sorted best-first
    tile_idx = jnp.stack(idcs, axis=1)

    @pl.when(i == 0)
    def _():
        run_val[:] = tile_val
        run_idx[:] = tile_idx

    @pl.when(i > 0)
    def _():
        cand_v = jnp.concatenate([run_val[:], tile_val], axis=1)  # (B, 2k)
        cand_i = jnp.concatenate([run_idx[:], tile_idx], axis=1)
        pos = jax.lax.broadcasted_iota(jnp.int32, cand_v.shape, 1)
        mvals = []
        midcs = []
        for _ in range(k):
            v = jnp.max(cand_v, axis=1)
            p = jnp.argmax(cand_v, axis=1).astype(jnp.int32)
            sel = pos == p[:, None]
            mvals.append(v)
            # masked-sum gather (take_along_axis is a gather TPU Pallas
            # may not lower; this is pure vector ops)
            midcs.append(jnp.sum(jnp.where(sel, cand_i, 0), axis=1))
            cand_v = jnp.where(sel, -4.0, cand_v)
        run_val[:] = jnp.stack(mvals, axis=1)
        run_idx[:] = jnp.stack(midcs, axis=1)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        val_ref[:] = run_val[:]
        idx_ref[:] = run_idx[:]


@functools.partial(jax.jit, static_argnames=("k", "stride", "tile_n"))
def grouped_codebook_topk(
    z: Array,
    codebooks: Array,
    obj_id: Array,
    n_valid: Array | None = None,
    *,
    k: int,
    stride: int = 1,
    tile_n: int = _TILE_N,
) -> Tuple[Array, Array]:
    """Fused top-k for a batch of queries sharing ONE object id.

    The serving aggregation / re-scoring path (`topk_aggregate` /
    `topk_rescore`, PERF.md round 4) previously paid a device slice of the
    (O, N_pad, D) slab plus a full (B, N) cosine materialization and an
    XLA lax.top_k per present class per frame. This kernel keeps the
    grouped top-1 shape: scalar-prefetched object id DMAs only that
    object's tiles, scores on the MXU, and a running sorted top-k lives in
    VMEM scratch (k max-and-mask passes per tile + a k-pass merge of the
    (B, 2k) candidates) — the (B, N) matrix never exists in HBM and the
    whole query is ONE dispatch with a (B, k) output.

    Returns (vals (B, k) f32, idcs (B, k) int32), sorted best-first —
    same contract as lax.top_k over the full masked cosine row.

    Per-tile cost is O(k) unrolled max-and-mask VPU passes (plus an O(k)
    merge of the (B, 2k) running set), so the kernel scales linearly in k
    on top of the MXU matmul. Validated and benchmark-flat for k <= 32
    (PERF.md round-4 k-sweep); larger k raises a ValueError rather than
    silently paying unvalidated quadratic-ish VPU time — use the XLA
    lax.top_k path for k > 32.
    """
    if not 1 <= k <= 32:
        raise ValueError(
            f"grouped_codebook_topk supports 1 <= k <= 32 (got k={k}); "
            "use the masked-matmul + lax.top_k path for larger k"
        )
    b, d = z.shape
    o, n_pad, _ = codebooks.shape
    assert n_pad % tile_n == 0
    num_tiles = n_pad // tile_n
    if n_valid is None:
        n_valid = jnp.asarray(n_pad, jnp.int32)

    from .nn_query import l2_normalize

    q = l2_normalize(z).astype(codebooks.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, obj: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_n, d),
                lambda i, obj: (obj[0], i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((b, k), lambda i, obj: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i, obj: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
    )

    def kernel(obj_ids_ref, z_ref, cb_ref, val_ref, idx_ref, run_val, run_idx):
        _mc_topk_kernel(
            k, stride, obj_ids_ref, z_ref, cb_ref[0], val_ref, idx_ref,
            run_val, run_idx
        )

    vals, idcs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * n_pad + k * b * n_pad,
            bytes_accessed=(n_pad + b) * d * codebooks.dtype.itemsize
            + b * k * 8,
            transcendentals=0,
        ),
    )(
        jnp.stack([obj_id.astype(jnp.int32), jnp.asarray(n_valid, jnp.int32)]),
        q,
        codebooks,
    )
    return vals, idcs


def stack_codebooks(codebooks, tile_n: int = _TILE_N) -> Tuple[np.ndarray, np.ndarray]:
    """Stack per-object (N_i, D) codebooks into (O, N_pad, D), zero-padded.

    Returns (slab, lengths). Zero pad rows give cosine 0 which beats any
    all-negative true match, so queries MUST mask by `lengths` — pass it to
    multi_codebook_top1 / grouped_codebook_top1.
    """
    n_max = max(cb.shape[0] for cb in codebooks)
    n_pad = -(-n_max // tile_n) * tile_n
    d = codebooks[0].shape[1]
    out = np.zeros((len(codebooks), n_pad, d), np.float32)
    for i, cb in enumerate(codebooks):
        out[i, : cb.shape[0]] = cb
    lengths = np.asarray([cb.shape[0] for cb in codebooks], np.int32)
    return out, lengths


def multi_codebook_top1_xla(
    z: Array, codebooks: Array, obj_ids: Array, lengths: Array | None = None
) -> Tuple[Array, Array]:
    """Mixed-object top-1 via one gathered einsum (off-TPU fallback):
    each query dots only its own codebook by gathering (B, N, D).
    Padded rows (col >= lengths[obj]) are masked to -2 (< any cosine)."""
    from .nn_query import l2_normalize

    q = l2_normalize(z)
    per_query_cb = codebooks[obj_ids]  # (B, N_pad, D) gather
    cos = jnp.einsum("bd,bnd->bn", q, per_query_cb)
    if lengths is not None:
        col = jnp.arange(cos.shape[1], dtype=jnp.int32)[None, :]
        cos = jnp.where(col < lengths[obj_ids][:, None], cos, -2.0)
    idx = jnp.argmax(cos, axis=1)
    val = jnp.take_along_axis(cos, idx[:, None], axis=1)[:, 0]
    return val, idx


def multi_codebook_top1(z, codebooks, obj_ids, lengths=None):
    """Dispatch: grouped Pallas path on TPU, gathered einsum elsewhere.

    obj_ids: (B,) int32. lengths: (O,) int32 true codebook sizes from
    stack_codebooks (None = all objects fill the slab). On TPU, queries are
    grouped by object on the host (python loop over unique ids — detection
    batches are small) and each group runs the scalar-prefetch kernel.
    """
    if jax.default_backend() != "tpu":
        return multi_codebook_top1_xla(z, codebooks, obj_ids, lengths)

    obj_ids_np = np.asarray(obj_ids)
    lengths_np = None if lengths is None else np.asarray(lengths)
    vals = np.empty((len(obj_ids_np),), np.float32)
    idcs = np.empty((len(obj_ids_np),), np.int32)
    for obj in np.unique(obj_ids_np):
        sel = np.nonzero(obj_ids_np == obj)[0]
        n_valid = (
            None
            if lengths_np is None
            else jnp.asarray(lengths_np[int(obj)], jnp.int32)
        )
        v, i = grouped_codebook_top1(
            z[jnp.asarray(sel)], codebooks, jnp.asarray(obj, jnp.int32), n_valid
        )
        vals[sel] = np.asarray(v)
        idcs[sel] = np.asarray(i)
    return jnp.asarray(vals), jnp.asarray(idcs)
