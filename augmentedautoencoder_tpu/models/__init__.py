"""Model family: convolutional Augmented Autoencoder (encoder/decoder)."""

from .aae import AAE, AAEOutputs
from .decoder import Decoder
from .encoder import Encoder
from .losses import bootstrapped_reconstruction_loss, kl_divergence_loss, norm_regularizer

__all__ = [
    "AAE",
    "AAEOutputs",
    "Decoder",
    "Encoder",
    "bootstrapped_reconstruction_loss",
    "kl_divergence_loss",
    "norm_regularizer",
]
