"""aae_tpu — a TPU-native Augmented Autoencoder framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
DLR-RM/AugmentedAutoencoder ("Implicit 3D Orientation Learning for 6D Object
Detection from RGB Images", ECCV 2018): per-object convolutional autoencoders
trained on domain-randomized synthetic renderings, whose latent codes are
matched against a codebook of pre-rendered SO(3) views to recover 6D pose.

Pipeline stages (mirroring the reference CLI surface, reference: setup.py:11-16):
  ae_init_workspace -> ae_train -> ae_embed -> inference (aae_image / pose API)

Execution model (all new, TPU-first):
  * training:  one jitted train step, on-device domain randomization, pjit
    over a data mesh
  * codebook:  batched jitted encoding of ~92k SO(3) views
  * inference: fused encode -> l2-normalize -> codebook matmul -> top-k
"""

__version__ = "0.1.0"
