"""Fused batched nearest-neighbor kernel for the ICP correspondence step.

The ICP while_loop body (pose/icp.py) is dominated by the NN search:
per iteration it needs, for every lane's src point, the closest dst point
— (n=dets, N=3000, D=3). The XLA formulation materializes the (n, N, N)
f32 distance tensor in HBM (~864 MB at n=24) and argmins over it:
measured 4.1 ms/iteration scan-isolated (PERF.md round 4), ~50% HBM
efficiency, and ~100 iterations per refinement stage (the reference's own
tolerance regime, icp_utils.py:273).

`batched_nn_pallas` never materializes distances in HBM. The squared
distance decomposes as |s|^2 + (|d|^2 - 2 s.d); the parenthesized part —
the only j-dependent term, so the only term argmin needs — is computed as
ONE MXU matmul via 4-component augmented vectors:

    s_aug = [-2 s_x, -2 s_y, -2 s_z, 1]
    d_aug = [ d_x,    d_y,    d_z,   |d|^2]   =>  s_aug . d_aug = |d|^2 - 2 s.d

Each grid cell dots a (4, SRC_TILE) src block against a (4, DST_TILE) dst
block (HIGHEST precision — bf16 passes are far too coarse at mm scales,
SURVEY.md §7) and folds the (SRC_TILE, DST_TILE) scores into a running
(min, argmin) in VMEM scratch. HBM traffic per call is the (n, 4, N)
inputs + (n, N) outputs (~3 MB at n=24) instead of 864 MB.

`|s|^2` is added back outside the kernel (an XLA elementwise fusion) to
recover the true distances. Ties resolve to the lowest dst index, same as
`jnp.argmin` over the full row.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SRC_TILE = 512
_DST_TILE = 1024
_PAD_SCORE = 1e30  # padded dst columns carry |d|^2 = 1e30: never the argmin


def _scores_mxu(s_ref, d_ref):
    # (SRC_TILE, DST_TILE) = |d|^2 - 2 s.d as one K=4 dot_general. The MXU
    # pads K=4 to a full 128-lane pass and HIGHEST costs ~6 bf16 passes on
    # top, so this issues ~190x more MAC work than the math needs — kept
    # for A/B reference (PERF.md round-5 NN-kernel VPU note).
    return jax.lax.dot_general(
        s_ref[0],  # (SRC_TILE, 4)
        d_ref[0],  # (4, DST_TILE)
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _scores_vpu(s_ref, d_ref):
    # Same (SRC_TILE, DST_TILE) scores as _scores_mxu, but as 3 broadcasted
    # multiply-adds on the VPU in native f32: the reduction dimension is
    # only the 3 coordinates, so an MXU formulation pays 128/4 K-padding
    # x ~6 HIGHEST passes for nothing. Column 3 of s_ref is the constant 1
    # (see s_aug in batched_nn_pallas) — folded into a plain broadcast add
    # of |d|^2. lax.slice keeps the component extraction a contiguous
    # (SRC, 1) / (1, DST) slice — fancy indexing here becomes a gather,
    # which Mosaic refuses to lower.
    s = s_ref[0]  # (SRC_TILE, 4): columns -2sx, -2sy, -2sz, 1
    d = d_ref[0]  # (4, DST_TILE): rows dx, dy, dz, |d|^2
    stile, dtile = s.shape[0], d.shape[1]

    def scol(k):
        return jax.lax.slice(s, (0, k), (stile, k + 1))  # (SRC, 1)

    def drow(k):
        return jax.lax.slice(d, (k, 0), (k + 1, dtile))  # (1, DST)

    return (
        scol(0) * drow(0)
        + scol(1) * drow(1)
        + scol(2) * drow(2)
        + drow(3)
    )


_SWEEP_SRC_TILE = 1024
_SWEEP_DST_CHUNK = 512


def _nn_kernel_sweep(s_ref, d_ref, val_ref, idx_ref):
    """One grid cell = one (SRC_TILE, 4) src block vs the WHOLE dst row.

    The tiled formulation (_nn_kernel) spends most of its time on grid-cell
    overhead: at n=24, N_pad=3072 it runs 432 cells whose per-cell compute
    is only a few microseconds (measured 3.3 ms/call on-chip, ~6x over the
    VPU roofline). Here the dst row lives in VMEM whole (4 x N_pad f32 =
    48 KB at N=3000) and a STATIC Python loop sweeps it in
    (_SWEEP_SRC_TILE, _SWEEP_DST_CHUNK) score chunks with a running
    (min, argmin) in registers — n * N_pad/1024 cells total, no scratch,
    no cross-cell merge. Tie-breaking matches jnp.argmin (lowest dst
    index): within a chunk by argmin, across chunks by strict <."""
    s = s_ref[0]  # (SWEEP_SRC_TILE, 4): columns -2sx, -2sy, -2sz, 1
    d = d_ref[0]  # (4, N_pad): rows dx, dy, dz, |d|^2
    stile = s.shape[0]
    npad = d.shape[1]
    sx = jax.lax.slice(s, (0, 0), (stile, 1))
    sy = jax.lax.slice(s, (0, 1), (stile, 2))
    sz = jax.lax.slice(s, (0, 2), (stile, 3))

    run_val = run_idx = None
    for j in range(npad // _SWEEP_DST_CHUNK):
        c0 = j * _SWEEP_DST_CHUNK
        c1 = c0 + _SWEEP_DST_CHUNK
        dx = jax.lax.slice(d, (0, c0), (1, c1))
        dy = jax.lax.slice(d, (1, c0), (2, c1))
        dz = jax.lax.slice(d, (2, c0), (3, c1))
        dq = jax.lax.slice(d, (3, c0), (4, c1))
        scores = sx * dx + sy * dy + sz * dz + dq  # (stile, DST_CHUNK)
        tile_val = jnp.min(scores, axis=1, keepdims=True)
        tile_idx = (
            jnp.argmin(scores, axis=1).reshape(-1, 1).astype(jnp.int32) + c0
        )
        if run_val is None:
            run_val, run_idx = tile_val, tile_idx
        else:
            better = tile_val < run_val  # strict: earlier chunk wins ties
            run_val = jnp.where(better, tile_val, run_val)
            run_idx = jnp.where(better, tile_idx, run_idx)
    val_ref[:] = run_val
    idx_ref[:] = run_idx


def _nn_kernel(s_ref, d_ref, val_ref, idx_ref, run_val, run_idx, *, scores_fn):
    j = pl.program_id(2)
    dst_tile = d_ref.shape[2]

    scores = scores_fn(s_ref, d_ref)

    tile_val = jnp.min(scores, axis=1, keepdims=True)  # (SRC_TILE, 1)
    tile_idx = (
        jnp.argmin(scores, axis=1).reshape(-1, 1).astype(jnp.int32)
        + j * dst_tile
    )

    @pl.when(j == 0)
    def _():
        run_val[:] = tile_val
        run_idx[:] = tile_idx

    @pl.when(j > 0)
    def _():
        better = tile_val < run_val[:]  # strict: first tile wins ties
        run_val[:] = jnp.where(better, tile_val, run_val[:])
        run_idx[:] = jnp.where(better, tile_idx, run_idx[:])

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        val_ref[:] = run_val[:]
        idx_ref[:] = run_idx[:]


@functools.partial(jax.jit, static_argnames=("interpret", "scores"))
def batched_nn_pallas(
    src: Array, dst: Array, interpret: bool = False, scores: str = "vpu"
) -> Tuple[Array, Array]:
    """For each src point its nearest dst point, per lane.

    src, dst: (n, N, 3) f32 -> (dist (n, N), idx (n, N) int32).
    Conditioning: both clouds are centered on each lane's dst centroid
    (NN is translation-invariant) so coordinates are object-radius scale,
    not camera-distance scale — same rationale as the XLA path.

    scores: kernel variant, identical results (exact f32 arithmetic over
    the same operands), different cost (scripts/bench_nn_scores_variants,
    measured on-chip at n=24, N=3000: vpu 3.29 ms / mxu 3.75 / sweep 4.4;
    an ablation probe puts the floor at the score-tile compute+traffic
    itself — sum-only folding is already ~75% of the full kernel — so the
    variants sit within ~35% of each other and 'vpu' wins):
      'vpu' (default) — tiled grid, broadcasted VPU multiply-adds in
               native f32
      'mxu'   — tiled grid, K=4 dot_general (~190x MAC overcommit from
               K-padding + HIGHEST passes, yet only ~14% slower: the MAC
               waste hides behind the same score traffic)
      'sweep' — whole dst row per cell, static chunked sweep (fewer grid
               cells did not pay; kept for the record)
    """
    n, N, _ = src.shape
    mu = dst.mean(axis=1, keepdims=True)
    s = src - mu
    d = dst - mu

    n_pad = -N % _DST_TILE
    ones = jnp.ones((n, N, 1), jnp.float32)
    # src rows carry [-2 s_x, -2 s_y, -2 s_z, 1] as COLUMNS of an
    # (n, N_pad, 4) array: the kernel then reads each coordinate as a
    # contiguous (SRC_TILE, 1) column slice (Mosaic lowers slices, not
    # gathers)
    s_aug = jnp.concatenate([-2.0 * s, ones], axis=2)
    # padded dst columns: coordinate rows 0, |d|^2 row 1e30 — their score is
    # exactly 1e30 (the 1-component of s_aug multiplies it), never the min.
    dcoord = d.transpose(0, 2, 1)
    dsq = (d * d).sum(-1)[:, None, :]
    if n_pad:
        s_aug = jnp.pad(s_aug, ((0, 0), (0, n_pad), (0, 0)))
        dcoord = jnp.pad(dcoord, ((0, 0), (0, 0), (0, n_pad)))
        dsq = jnp.pad(
            dsq, ((0, 0), (0, 0), (0, n_pad)), constant_values=_PAD_SCORE
        )
    d_aug = jnp.concatenate([dcoord, dsq], axis=1)
    N_pad = N + n_pad

    if scores == "sweep":
        src_tile = min(_SWEEP_SRC_TILE, N_pad)
        src_tiles = N_pad // src_tile
        grid_spec = pl.GridSpec(
            grid=(n, src_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, src_tile, 4), lambda l, i: (l, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 4, N_pad), lambda l, i: (l, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (src_tile, 1), lambda l, i: (l * src_tiles + i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (src_tile, 1), lambda l, i: (l * src_tiles + i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
        )
        kernel = _nn_kernel_sweep
    else:
        src_tiles = N_pad // _SRC_TILE
        dst_tiles = N_pad // _DST_TILE
        grid_spec = pl.GridSpec(
            grid=(n, src_tiles, dst_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, _SRC_TILE, 4), lambda l, i, j: (l, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 4, _DST_TILE), lambda l, i, j: (l, 0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (_SRC_TILE, 1), lambda l, i, j: (l * src_tiles + i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (_SRC_TILE, 1), lambda l, i, j: (l * src_tiles + i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((_SRC_TILE, 1), jnp.float32),
                pltpu.VMEM((_SRC_TILE, 1), jnp.int32),
            ],
        )
        kernel = functools.partial(
            _nn_kernel,
            scores_fn=_scores_vpu if scores == "vpu" else _scores_mxu,
        )
    vals, idcs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n * N_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n * N_pad, 1), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * n * N_pad * N_pad,
            bytes_accessed=n * (8 * N_pad * 4 + N_pad * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(s_aug, d_aug)

    minval = vals.reshape(n, N_pad)[:, :N]
    idx = idcs.reshape(n, N_pad)[:, :N]
    s2 = (s * s).sum(-1)
    dist = jnp.sqrt(jnp.maximum(s2 + minval, 0.0))
    return dist, idx


def batched_nn_xla(src: Array, dst: Array) -> Tuple[Array, Array]:
    """XLA fallback (CPU / non-TPU): per-lane distance matrix + argmin."""

    def one(s, d):
        mu = d.mean(axis=0)
        s = s - mu
        d = d - mu
        cross = jnp.matmul(s, d.T, precision=jax.lax.Precision.HIGHEST)
        d2 = (s * s).sum(1, keepdims=True) - 2.0 * cross + (d * d).sum(1)[None]
        idx = jnp.argmin(d2, axis=1)
        dist = jnp.sqrt(
            jnp.maximum(jnp.take_along_axis(d2, idx[:, None], 1)[:, 0], 0.0)
        )
        return dist, idx.astype(jnp.int32)

    return jax.vmap(one)(src, dst)
