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

        for filters, layer_size in zip(self.num_filters[1:], layer_dims[1:]):
            x = _nn_resize(x, layer_size)
            x = nn.Conv(filters, (k, k), padding="SAME", dtype=dt)(x)
            x = nn.relu(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train, dtype=dt)(x)

        x = _nn_resize(x, (h, w))

        mask = None
        if self.auxiliary_mask:
            mask = nn.sigmoid(
                nn.Conv(1, (k, k), padding="SAME", name="mask_head",
                        dtype=jnp.float32)(x.astype(jnp.float32))
            )

        # final head in f32: the loss top-k is precision-sensitive
        x = nn.sigmoid(
            nn.Conv(c, (k, k), padding="SAME", name="reconstruction",
                    dtype=jnp.float32)(x.astype(jnp.float32))
        )
        if self.auxiliary_mask:
            return x, mask
        return x
