"""The Augmented Autoencoder: encoder + decoder + combined loss.

Combines the sub-losses the way the reference AE does
(auto_pose/ae/ae.py:42-53): reconstruction + NORM_REGULARIZE * reg
+ VARIATIONAL * KL (+ mask MSE when the auxiliary mask head is on,
decoder.py:134-142).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import TrainConfig
from .decoder import Decoder
from .encoder import Encoder, sample_z
from .losses import (
    bootstrapped_reconstruction_loss,
    kl_divergence_loss,
    mask_loss,
    norm_regularizer,
)


@dataclasses.dataclass
class AAEOutputs:
    z: jax.Array
    reconstruction: jax.Array
    pred_mask: Optional[jax.Array]
    losses: Dict[str, jax.Array]

    @property
    def total_loss(self) -> jax.Array:
        return self.losses["total_loss"]


class AAE(nn.Module):
    """Full model; `__call__(x, target)` returns AAEOutputs.

    Construct via `AAE.from_config(cfg)` for cfg-driven dims.
    """

    input_shape: Tuple[int, int, int] = (128, 128, 3)
    latent_space_size: int = 128
    num_filters: Tuple[int, ...] = (128, 256, 512, 512)
    kernel_size_encoder: int = 5
    kernel_size_decoder: int = 5
    strides: Tuple[int, ...] = (2, 2, 2, 2)
    batch_norm: bool = False
    auxiliary_mask: bool = False
    variational: float = 0.0
    loss_type: str = "L2"
    bootstrap_ratio: int = 4
    norm_regularize: float = 0.0
    precision: str = "float32"  # activation compute dtype: float32 | bfloat16
    topk_mode: str = "exact"  # bootstrapped-loss selection: exact | sort | approx

    @classmethod
    def from_config(cls, cfg: TrainConfig) -> "AAE":
        return cls(
            input_shape=cfg.shape,
            latent_space_size=cfg.latent_space_size,
            num_filters=tuple(cfg.num_filter),
            kernel_size_encoder=cfg.kernel_size_encoder,
            kernel_size_decoder=cfg.kernel_size_decoder,
            strides=tuple(cfg.strides),
            batch_norm=cfg.batch_normalization,
            auxiliary_mask=cfg.auxiliary_mask,
            variational=cfg.variational,
            loss_type=cfg.loss,
            bootstrap_ratio=cfg.bootstrap_ratio,
            norm_regularize=cfg.norm_regularize,
            precision=cfg.precision,
            topk_mode=cfg.topk_mode,
        )

    def setup(self):
        compute_dtype = jnp.bfloat16 if self.precision == "bfloat16" else jnp.float32
        self.encoder = Encoder(
            latent_space_size=self.latent_space_size,
            num_filters=self.num_filters,
            kernel_size=self.kernel_size_encoder,
            strides=self.strides,
            batch_norm=self.batch_norm,
            variational=self.variational > 0,
            compute_dtype=compute_dtype,
        )
        self.decoder = Decoder(
            output_shape=self.input_shape,
            num_filters=tuple(reversed(self.num_filters)),
            kernel_size=self.kernel_size_decoder,
            strides=tuple(reversed(self.strides)),
            batch_norm=self.batch_norm,
            auxiliary_mask=self.auxiliary_mask,
            compute_dtype=compute_dtype,
        )

    def encode(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Deterministic latent code (inference path; VAE uses the mean)."""
        out = self.encoder(x, train=train)
        return out[0] if self.variational > 0 else out

    def __call__(
        self,
        x: jax.Array,
        target: jax.Array,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> AAEOutputs:
        if self.variational > 0:
            z, q_sigma = self.encoder(x, train=train)
            code = sample_z(rng, z, q_sigma) if (train and rng is not None) else z
        else:
            z = self.encoder(x, train=train)
            q_sigma = None
            code = z

        dec_out = self.decoder(code, train=train)
        if self.auxiliary_mask:
            reconstruction, pred_mask = dec_out
        else:
            reconstruction, pred_mask = dec_out, None

        losses: Dict[str, jax.Array] = {}
        reconst = bootstrapped_reconstruction_loss(
            reconstruction, target, self.bootstrap_ratio, self.loss_type,
            topk_mode=self.topk_mode,
        )
        losses["reconst_loss"] = reconst
        total = reconst

        if self.auxiliary_mask:
            m = mask_loss(pred_mask, target)
            losses["mask_loss"] = m
            total = total + m

        if self.norm_regularize > 0:
            reg = norm_regularizer(z)
            losses["reg_loss"] = reg
            total = total + self.norm_regularize * reg

        if self.variational > 0:
            kl = kl_divergence_loss(z, q_sigma)
            losses["kl_loss"] = kl
            total = total + self.variational * kl

        losses["total_loss"] = total
        if train:
            # latent statistics for the metric writer (the reference logs
            # latent mean/variance histograms, ae.py:19)
            losses["z_mean"] = z.mean()
            losses["z_std"] = z.std()
        return AAEOutputs(z=z, reconstruction=reconstruction, pred_mask=pred_mask, losses=losses)
