"""Model tests: architecture dims, loss semantics, VAE/BN/mask variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from augmentedautoencoder_tpu.config import TrainConfig
from augmentedautoencoder_tpu.models import (
    AAE,
    Decoder,
    Encoder,
    bootstrapped_reconstruction_loss,
    norm_regularizer,
)
from augmentedautoencoder_tpu.models.losses import kl_divergence_loss, mask_loss

KEY = jax.random.PRNGKey(0)


def small_cfg(**kw):
    cfg = TrainConfig(h=32, w=32, c=3, latent_space_size=16)
    cfg.num_filter = [8, 16]
    cfg.strides = [2, 2]
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


class TestEncoder:
    def test_reference_dims(self):
        # full-size network: 128x128x3 -> 8x8x512 -> z 128
        enc = Encoder()
        x = jnp.zeros((2, 128, 128, 3))
        params = enc.init(KEY, x)
        z = enc.apply(params, x)
        assert z.shape == (2, 128)
        # conv stack output before flatten is 8x8x512 = 32768 -> dense kernel
        dense_kernel = params["params"]["latent"]["kernel"]
        assert dense_kernel.shape == (8 * 8 * 512, 128)

    def test_variational_head(self):
        enc = Encoder(latent_space_size=16, num_filters=(8, 16), strides=(2, 2),
                      variational=True)
        x = jnp.zeros((2, 32, 32, 3))
        params = enc.init(KEY, x)
        z, sigma = enc.apply(params, x)
        assert z.shape == (2, 16) and sigma.shape == (2, 16)
        assert (np.asarray(sigma) > 0).all()  # softplus + eps


class TestDecoder:
    def test_reference_dims(self):
        dec = Decoder()
        z = jnp.zeros((2, 128))
        params = dec.init(KEY, z)
        x = dec.apply(params, z)
        assert x.shape == (2, 128, 128, 3)
        assert 0.0 <= float(x.min()) and float(x.max()) <= 1.0  # sigmoid

    def test_mask_head(self):
        dec = Decoder(output_shape=(32, 32, 3), num_filters=(16, 8), strides=(2, 2),
                      auxiliary_mask=True)
        z = jnp.zeros((2, 16))
        params = dec.init(KEY, z)
        x, m = dec.apply(params, z)
        assert x.shape == (2, 32, 32, 3) and m.shape == (2, 32, 32, 1)


class TestLosses:
    def test_bootstrap_topk_selects_hardest(self):
        # 1 sample, 8 elements: 2 large errors, 6 zeros; ratio 4 -> keep top 2
        r = jnp.zeros((1, 2, 2, 2))
        t = jnp.zeros((1, 2, 2, 2)).at[0, 0, 0, :].set(1.0)
        loss = bootstrapped_reconstruction_loss(r, t, bootstrap_ratio=4, loss_type="L2")
        assert abs(float(loss) - 1.0) < 1e-6  # mean of the two 1.0 errors

    def test_bootstrap_ratio_1_is_mean(self):
        r = jax.random.uniform(KEY, (4, 8, 8, 3))
        t = jnp.zeros_like(r)
        loss = bootstrapped_reconstruction_loss(r, t, bootstrap_ratio=1)
        np.testing.assert_allclose(float(loss), float((r**2).mean()), rtol=1e-6)

    def test_l1(self):
        r = jnp.full((1, 2, 2, 1), 0.5)
        t = jnp.zeros_like(r)
        loss = bootstrapped_reconstruction_loss(r, t, bootstrap_ratio=1, loss_type="L1")
        assert abs(float(loss) - 0.5) < 1e-6

    def test_norm_regularizer(self):
        z = jnp.array([[3.0, 4.0], [0.6, 0.8]])  # norms 5 and 1
        assert abs(float(norm_regularizer(z)) - 2.0) < 1e-6

    def test_kl_zero_at_standard_normal(self):
        mu = jnp.zeros((4, 8))
        sigma = jnp.ones((4, 8))
        assert abs(float(kl_divergence_loss(mu, sigma))) < 1e-6

    def test_mask_loss_perfect(self):
        t = jnp.zeros((1, 4, 4, 3)).at[0, :2].set(0.5)
        m = (t.sum(axis=3, keepdims=True) > 0.0001).astype(jnp.float32)
        assert float(mask_loss(m, t)) == 0.0


class TestAAE:
    def test_forward_and_losses(self):
        cfg = small_cfg(norm_regularize=1.0)
        model = AAE.from_config(cfg)
        x = jax.random.uniform(KEY, (2, 32, 32, 3))
        variables = model.init(KEY, x, x)
        out = model.apply(variables, x, x)
        assert out.z.shape == (2, 16)
        assert out.reconstruction.shape == (2, 32, 32, 3)
        assert set(out.losses) == {"reconst_loss", "reg_loss", "total_loss"}
        expected = out.losses["reconst_loss"] + out.losses["reg_loss"]
        np.testing.assert_allclose(float(out.total_loss), float(expected), rtol=1e-6)

    def test_variational_variant(self):
        cfg = small_cfg(variational=1.0)
        model = AAE.from_config(cfg)
        x = jax.random.uniform(KEY, (2, 32, 32, 3))
        variables = model.init(KEY, x, x)
        out = model.apply(variables, x, x, train=True, rng=KEY)
        assert "kl_loss" in out.losses

    def test_batch_norm_variant(self):
        cfg = small_cfg(batch_normalization=True)
        model = AAE.from_config(cfg)
        x = jax.random.uniform(KEY, (2, 32, 32, 3))
        variables = model.init(KEY, x, x)
        assert "batch_stats" in variables
        out, updates = model.apply(variables, x, x, train=True, mutable=["batch_stats"])
        assert "batch_stats" in updates

    def test_encode_method(self):
        cfg = small_cfg()
        model = AAE.from_config(cfg)
        x = jax.random.uniform(KEY, (2, 32, 32, 3))
        variables = model.init(KEY, x, x)
        z = model.apply(variables, x, method=model.encode)
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(model.apply(variables, x, x).z), atol=1e-6
        )
