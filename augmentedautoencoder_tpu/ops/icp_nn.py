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


def _nn_kernel(s_ref, d_ref, val_ref, idx_ref, run_val, run_idx):
    j = pl.program_id(2)
    dst_tile = d_ref.shape[2]

    # (SRC_TILE, DST_TILE) = |d|^2 - 2 s.d for this block pair
    scores = jax.lax.dot_general(
        s_ref[0],
        d_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

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


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_nn_pallas(
    src: Array, dst: Array, interpret: bool = False
) -> Tuple[Array, Array]:
    """For each src point its nearest dst point, per lane.

    src, dst: (n, N, 3) f32 -> (dist (n, N), idx (n, N) int32).
    Conditioning: both clouds are centered on each lane's dst centroid
    (NN is translation-invariant) so coordinates are object-radius scale,
    not camera-distance scale — same rationale as the XLA path.
    """
    n, N, _ = src.shape
    mu = dst.mean(axis=1, keepdims=True)
    s = src - mu
    d = dst - mu

    n_pad = -N % _DST_TILE
    ones = jnp.ones((n, 1, N), jnp.float32)
    s_aug = jnp.concatenate([-2.0 * s.transpose(0, 2, 1), ones], axis=1)
    # padded dst columns: coordinate rows 0, |d|^2 row 1e30 — their score is
    # exactly 1e30 (the 1-component of s_aug multiplies it), never the min.
    dcoord = d.transpose(0, 2, 1)
    dsq = (d * d).sum(-1)[:, None, :]
    if n_pad:
        s_aug = jnp.pad(s_aug, ((0, 0), (0, 0), (0, n_pad)))
        dcoord = jnp.pad(dcoord, ((0, 0), (0, 0), (0, n_pad)))
        dsq = jnp.pad(
            dsq, ((0, 0), (0, 0), (0, n_pad)), constant_values=_PAD_SCORE
        )
    d_aug = jnp.concatenate([dcoord, dsq], axis=1)
    N_pad = N + n_pad
    src_tiles = N_pad // _SRC_TILE
    dst_tiles = N_pad // _DST_TILE

    grid_spec = pl.GridSpec(
        grid=(n, src_tiles, dst_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 4, _SRC_TILE), lambda l, i, j: (l, 0, i),
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
    vals, idcs = pl.pallas_call(
        _nn_kernel,
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
