"""Fused 2x nearest-neighbor upsample + KxK conv, without the upsampled map.

The decoder's hot pattern is `resize_nearest(2x) -> conv KxK stride 1 SAME`
(decoder.py). Materializing the upsampled activations dominates the train
step's HBM traffic (PERF.md: the 128x128x128 map is ~536 MB at batch 64,
fwd and again in backward).

NN-upsampling by 2 means up[a, b] = x[a//2, b//2], so each output PARITY
PHASE (py, px) of the high-res conv is itself a small ceil(K/2)-tap conv
over the ORIGINAL map with a phase-specific kernel obtained by summing the
w taps that land on the same source pixel:

    out[2i+py, 2j+px] = sum_{uo,vo} K_eff[py,px][uo,vo] . x[i+uo, j+vo]

Four small convs + an interleave replace the upsample + big conv: exact
same math (zero-padding maps consistently), ~2.8x fewer FLOPs for K=5, and
the 2x-resolution input tensor never exists.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _phase_offsets(p: int, K: int):
    P = (K - 1) // 2
    return [(p + d - P) // 2 for d in range(K)]


def phase_kernel(w: jax.Array, p: int, q: int):
    """Phase (p, q) kernel + its (pad_lo, pad_hi) per spatial axis.

    Each phase's source-pixel window can differ (e.g. K=3: phase 0 reads
    offsets [-1, 0], phase 1 reads [0, 1]); kernels are built per phase."""
    K = w.shape[0]
    roffs = _phase_offsets(p, K)
    coffs = _phase_offsets(q, K)
    rlo, rhi = min(roffs), max(roffs)
    clo, chi = min(coffs), max(coffs)
    kern = jnp.zeros((rhi - rlo + 1, chi - clo + 1) + w.shape[2:], w.dtype)
    for d in range(K):
        for e in range(K):
            kern = kern.at[roffs[d] - rlo, coffs[e] - clo].add(w[d, e])
    return kern, (-rlo, rhi), (-clo, chi)


def upsample2x_conv(x: jax.Array, w: jax.Array, b=None) -> jax.Array:
    """Equivalent of: conv2d(nn_upsample_2x(x), w, stride 1, SAME) (+ bias).

    x (B, H, W, Cin); w (K, K, Cin, Cout), K odd. Returns (B, 2H, 2W, Cout).
    """
    B, H, W, Cin = x.shape

    phases = []
    for p in (0, 1):
        row = []
        for q in (0, 1):
            kern, rpad, cpad = phase_kernel(w, p, q)
            y = jax.lax.conv_general_dilated(
                x, kern, (1, 1), (rpad, cpad),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            row.append(y)
        phases.append(row)
    Cout = w.shape[3]
    z = jnp.stack([phases[0][0], phases[0][1], phases[1][0], phases[1][1]])
    z = z.reshape(2, 2, B, H, W, Cout).transpose(2, 3, 0, 4, 1, 5)
    out = z.reshape(B, 2 * H, 2 * W, Cout)
    if b is not None:
        out = out + b
    return out
