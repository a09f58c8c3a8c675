"""Convolutional encoder: 4 x (stride-2 conv + ReLU [+ BN]) -> dense latent.

Architecture parity with the reference (auto_pose/ae/encoder.py:38-68):
SAME-padded kxk stride-s convolutions with ReLU (batch-norm AFTER the
activation, matching tf.layers.conv2d(activation=relu) + batch_normalization),
flatten, linear 128-D latent. Optional VAE head (encoder.py:70-94).

Default dims (train_template.cfg:50-56): filters [128,256,512,512],
strides [2,2,2,2], kernel 5 -> 8x8x512 feature map -> z in R^128.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class Encoder(nn.Module):
    latent_space_size: int = 128
    num_filters: Sequence[int] = (128, 256, 512, 512)
    kernel_size: int = 5
    strides: Sequence[int] = (2, 2, 2, 2)
    batch_norm: bool = False
    variational: bool = False
    #: activation compute dtype (params stay f32); bfloat16 targets the MXU
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        k = self.kernel_size
        x = x.astype(self.compute_dtype)
        for filters, stride in zip(self.num_filters, self.strides):
            x = nn.Conv(
                filters, (k, k), strides=(stride, stride), padding="SAME",
                dtype=self.compute_dtype,
            )(x)
            x = nn.relu(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train, dtype=self.compute_dtype)(x)
        x = x.reshape((x.shape[0], -1))
        # the latent head runs in f32: codebook cosine matching depends on it
        z = nn.Dense(self.latent_space_size, name="latent", dtype=jnp.float32)(
            x.astype(jnp.float32)
        )

        if not self.variational:
            return z

        # VAE head: softplus sigma with zero-init kernel (encoder.py:70-79)
        q_sigma = 1e-8 + nn.Dense(
            self.latent_space_size,
            kernel_init=nn.initializers.zeros,
            name="latent_sigma",
        )(x)
        q_sigma = nn.softplus(q_sigma)
        return z, q_sigma


def sample_z(rng: jax.Array, z: jax.Array, q_sigma: jax.Array) -> jax.Array:
    """Reparameterized latent sample (reference encoder.py:81-84)."""
    return z + q_sigma * jax.random.normal(rng, z.shape)
