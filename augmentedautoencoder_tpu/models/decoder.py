"""Decoder: dense -> (NN-upsample + conv ReLU)* -> NN-upsample -> sigmoid conv.

Architecture parity with the reference (auto_pose/ae/decoder.py:36-84): the
factory passes REVERSED filters/strides (ae_factory.py:63-66), the first
(coarsest) spatial size comes from dividing the output size by the stride
product, upsampling is nearest-neighbor, the final conv maps to C channels
through a sigmoid, and an optional auxiliary mask head emits a 1-channel
sigmoid mask from the last feature map (decoder.py:68-75).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _nn_resize(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize matching tf.image.resize_nearest_neighbor.

    Integer upscale factors use repeat (broadcast+reshape on TPU; its
    backward is a cheap reshape-sum) — gather-based indexing and its
    scatter-add gradient are dramatically slower on TPU and dominated the
    train step before this (PERF.md)."""
    b, h, w, c = x.shape
    th, tw = size
    if th % h == 0 and tw % w == 0:
        return jnp.repeat(jnp.repeat(x, th // h, axis=1), tw // w, axis=2)
    ridx = (jnp.arange(th) * h // th).astype(jnp.int32)
    cidx = (jnp.arange(tw) * w // tw).astype(jnp.int32)
    return x[:, ridx][:, :, cidx]


class _UpConv(nn.Module):
    """Fused 2x-NN-upsample + conv, parameter-compatible with nn.Conv
    (same 'kernel'/'bias' names and shapes, so checkpoints interchange).

    Exactly equals resize_nearest(2x) -> conv (ops/fused_upconv.py) but the
    upsampled activation map never exists — it was the train step's largest
    HBM traffic (PERF.md: decoder stages 2.4x faster fused)."""

    features: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.fused_upconv import upsample2x_conv

        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return upsample2x_conv(
            x.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype)
        )


class Decoder(nn.Module):
    """Call with the latent code; emits the reconstruction (and mask)."""

    output_shape: Tuple[int, int, int] = (128, 128, 3)  # (H, W, C)
    num_filters: Sequence[int] = (512, 512, 256, 128)  # already reversed
    kernel_size: int = 5
    strides: Sequence[int] = (2, 2, 2, 2)  # already reversed
    batch_norm: bool = False
    auxiliary_mask: bool = False
    #: activation compute dtype (params stay f32)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False):
        h, w, c = self.output_shape
        k = self.kernel_size
        dt = self.compute_dtype
        strides = list(self.strides)
        layer_dims = [
            (int(h / np.prod(strides[i:])), int(w / np.prod(strides[i:])))
            for i in range(len(strides))
        ]

        x = nn.Dense(
            layer_dims[0][0] * layer_dims[0][1] * self.num_filters[0], dtype=dt
        )(z.astype(dt))
        x = nn.relu(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=dt)(x)
        x = x.reshape((-1, layer_dims[0][0], layer_dims[0][1], self.num_filters[0]))

        for i, (filters, layer_size) in enumerate(
            zip(self.num_filters[1:], layer_dims[1:])
        ):
            cur = x.shape[1:3]
            if layer_size == (2 * cur[0], 2 * cur[1]):
                # nn.Conv-compatible param path: name matches auto-numbering
                x = _UpConv(filters, k, dtype=dt, name=f"Conv_{i}")(x)
            else:
                x = _nn_resize(x, layer_size)
                x = nn.Conv(
                    filters, (k, k), padding="SAME", dtype=dt, name=f"Conv_{i}"
                )(x)
            x = nn.relu(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train, dtype=dt)(x)

        mask = None
        # final heads in f32: the loss top-k is precision-sensitive
        cur = x.shape[1:3]
        if (h, w) == (2 * cur[0], 2 * cur[1]):
            if self.auxiliary_mask:
                mask = nn.sigmoid(
                    _UpConv(1, k, name="mask_head")(x.astype(jnp.float32))
                )
            x = nn.sigmoid(
                _UpConv(c, k, name="reconstruction")(x.astype(jnp.float32))
            )
        else:
            x = _nn_resize(x, (h, w))
            if self.auxiliary_mask:
                mask = nn.sigmoid(
                    nn.Conv(1, (k, k), padding="SAME", name="mask_head",
                            dtype=jnp.float32)(x.astype(jnp.float32))
                )
            x = nn.sigmoid(
                nn.Conv(c, (k, k), padding="SAME", name="reconstruction",
                        dtype=jnp.float32)(x.astype(jnp.float32))
            )
        if self.auxiliary_mask:
            return x, mask
        return x
