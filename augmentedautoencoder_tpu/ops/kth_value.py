"""Exact per-row k-th largest value via bit-level bisection.

The bootstrapped loss (models/losses.py, reference ae/ae.py top_k
bootstrapping) only needs the k-th largest VALUE per row to threshold on —
not the sorted order `jax.lax.top_k` computes. For non-negative f32, the
IEEE bit pattern viewed as int32 is order-isomorphic to the float order, so
a 31-step integer bisection with a counting predicate finds the exact k-th
largest: each step is one elementwise compare + row-sum over the error
matrix — pure VPU streaming, no sort network. At the training shapes
(64 x 49152, k = 12288) this replaces the dominant cost of the loss
forward (PERF.md).

Exactness: cnt(t) = #(err >= t) is non-increasing in t, and for any t in
(v, v'] between adjacent observed values cnt(t) = cnt(v'), so the largest
bit pattern u with cnt(u) >= k is exactly the k-th largest observed value.
The bisection maintains cnt(lo) >= k and cnt(hi) < k and therefore returns
bit-identical results to `lax.top_k(err, k)[0][:, -1]`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_F32_INF_BITS = 0x7F800000


def kth_largest(err: jax.Array, k: int) -> jax.Array:
    """Exact per-row k-th largest of a NON-NEGATIVE f32 matrix.

    err: (B, N) with all entries >= 0 (squared / absolute errors).
    Returns (B, 1), bit-identical to `lax.top_k(err, k)[0][:, -1:]` for
    finite input. +inf entries are clamped to the largest finite f32
    (3.4028235e38) before bisection — an inf would break the cnt(hi) < k
    bracket invariant; under the bootstrapped loss an inf error only arises
    from an upstream NaN/overflow, where the training run is lost anyway.
    """
    if not (0 < k <= err.shape[1]):
        raise ValueError(f"k={k} out of range for {err.shape}")
    if err.dtype != jnp.float32:
        # the bitcast below is width- and order-sensitive; anything but f32
        # (e.g. a future bf16 loss head) would silently bisect garbage
        raise TypeError(f"kth_largest requires float32 input, got {err.dtype}")
    bits = jax.lax.bitcast_convert_type(err, jnp.int32)  # monotone for >= 0
    bits = jnp.minimum(bits, jnp.int32(_F32_INF_BITS - 1))  # clamp +inf

    b = err.shape[0]
    lo = jnp.zeros((b,), jnp.int32)            # invariant: cnt(lo) >= k
    hi = jnp.full((b,), _F32_INF_BITS, jnp.int32)  # invariant: cnt(hi) < k

    def body(_, carry):
        lo, hi = carry
        mid = lo + (hi - lo) // 2
        cnt = (bits >= mid[:, None]).sum(axis=1)
        ge_k = cnt >= k
        return jnp.where(ge_k, mid, lo), jnp.where(ge_k, hi, mid)

    # ceil(log2(0x7f800000)) = 31 halvings close the bracket completely
    lo, _ = jax.lax.fori_loop(0, 31, body, (lo, hi))
    return jax.lax.bitcast_convert_type(lo, jnp.float32)[:, None]
