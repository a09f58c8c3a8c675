"""On-device augmentation tests: op semantics + batch pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from augmentedautoencoder_tpu.config import TrainConfig
from augmentedautoencoder_tpu.data import augment_spec as S
from augmentedautoencoder_tpu.data.augment import build_augmenter
from augmentedautoencoder_tpu.data.pipeline import (
    DeviceDataset,
    square_occlusion,
    translate2d,
)

KEY = jax.random.PRNGKey(0)
B, H, W, C = 16, 32, 32, 3


@pytest.fixture
def imgs():
    return jax.random.uniform(KEY, (B, H, W, C), minval=50.0, maxval=200.0)


class TestOps:
    def test_add_shifts_mean(self, imgs):
        fn = build_augmenter(S.Add(value=(10, 10)))
        out = fn(KEY, imgs)
        np.testing.assert_allclose(np.asarray(out - imgs), 10.0, atol=1e-4)

    def test_add_clips(self, imgs):
        fn = build_augmenter(S.Add(value=(200, 200)))
        assert float(fn(KEY, imgs).max()) == 255.0

    def test_add_per_channel(self, imgs):
        fn = build_augmenter(S.Add(value=(-25, 25), per_channel=1.0))
        out = fn(KEY, imgs)
        d = np.asarray(out - imgs)
        per_img_ch = d.mean(axis=(1, 2))  # (B, C)
        # channels get different offsets
        assert np.abs(per_img_ch[:, 0] - per_img_ch[:, 1]).max() > 0.5

    def test_multiply(self, imgs):
        fn = build_augmenter(S.Multiply(mul=(2.0, 2.0)))
        out = fn(KEY, imgs)
        np.testing.assert_allclose(np.asarray(out), np.minimum(np.asarray(imgs) * 2, 255), atol=1e-3)

    def test_invert_p1(self, imgs):
        fn = build_augmenter(S.Invert(p=1.0))
        np.testing.assert_allclose(np.asarray(fn(KEY, imgs)), 255.0 - np.asarray(imgs), atol=1e-4)

    def test_contrast_normalization(self, imgs):
        fn = build_augmenter(S.ContrastNormalization(alpha=(2.0, 2.0)))
        out = np.asarray(fn(KEY, imgs))
        expected = np.clip((np.asarray(imgs) - 128.0) * 2.0 + 128.0, 0, 255)
        np.testing.assert_allclose(out, expected, atol=1e-3)

    def test_gaussian_blur_smooths(self):
        # checkerboard has huge local variance; blur must reduce it
        cb = jnp.tile(jnp.array([[0.0, 255.0], [255.0, 0.0]]), (B, H // 2, W // 2, 1)[1:3])
        cb = jnp.broadcast_to(cb[None, :, :, None], (B, H, W, C))
        fn = build_augmenter(S.GaussianBlur(sigma=1.2))
        out = np.asarray(fn(KEY, cb))
        assert np.abs(np.diff(out[0, :, :, 0], axis=0)).mean() < np.abs(
            np.diff(np.asarray(cb)[0, :, :, 0], axis=0)
        ).mean() * 0.5
        # mean brightness approximately preserved (normalized kernel)
        assert abs(out.mean() - np.asarray(cb).mean()) < 3.0

    def test_coarse_dropout_fraction(self, imgs):
        fn = build_augmenter(S.CoarseDropout(p=0.3, size_percent=0.25))
        out = np.asarray(fn(KEY, imgs))
        zero_frac = (out == 0).mean()
        assert 0.15 < zero_frac < 0.45  # ~0.3 expected

    def test_affine_scale_up_grows_object(self):
        # bright square in the center; scaling up must grow its area
        img = np.zeros((1, H, W, C), np.float32)
        img[0, 12:20, 12:20] = 255.0
        fn = build_augmenter(S.Affine(scale=(2.0, 2.0)))
        out = np.asarray(fn(KEY, jnp.asarray(img)))
        assert (out > 128).sum() > 3 * (img > 128).sum()

    def test_affine_identity(self, imgs):
        fn = build_augmenter(S.Affine(scale=(1.0, 1.0)))
        np.testing.assert_allclose(np.asarray(fn(KEY, imgs)), np.asarray(imgs), atol=1e-3)

    def test_fliplr(self, imgs):
        fn = build_augmenter(S.Fliplr(p=1.0))
        np.testing.assert_allclose(
            np.asarray(fn(KEY, imgs)), np.asarray(imgs)[:, :, ::-1], atol=1e-5
        )


class TestCombinators:
    def test_sometimes_rate(self, imgs):
        fn = build_augmenter(S.Sometimes(0.5, S.Invert(p=1.0)))
        changed = 0
        trials = 8
        for i in range(trials):
            out = fn(jax.random.PRNGKey(i), imgs)
            changed += int((np.asarray(out) != np.asarray(imgs)).any(axis=(1, 2, 3)).sum())
        rate = changed / (trials * B)
        assert 0.35 < rate < 0.65

    def test_sequential_composes(self, imgs):
        fn = build_augmenter(
            S.Sequential([S.Add(value=(10, 10)), S.Multiply(mul=(2.0, 2.0))])
        )
        out = np.asarray(fn(KEY, imgs))
        expected = np.clip((np.asarray(imgs) + 10) * 2, 0, 255)
        np.testing.assert_allclose(out, expected, atol=1e-3)

    def test_reference_default_chain_jits(self, imgs):
        from augmentedautoencoder_tpu.config.safe_eval import safe_eval
        from augmentedautoencoder_tpu.data.augment_spec import DSL_CONSTRUCTORS

        code = """Sequential([
            Sometimes(0.5, Affine(scale=(1.0, 1.2))),
            Sometimes(0.5, CoarseDropout( p=0.2, size_percent=0.05) ),
            Sometimes(0.5, GaussianBlur(0.8)),
            Sometimes(0.5, Add((-25, 25), per_channel=0.3)),
            Sometimes(0.3, Invert(0.2, per_channel=True)),
            Sometimes(0.5, Multiply((0.6, 1.4), per_channel=0.5)),
            Sometimes(0.5, Multiply((0.6, 1.4))),
            Sometimes(0.5, ContrastNormalization((0.5, 2.2), per_channel=0.3))
            ], random_order=False)"""
        spec = safe_eval(code, callables=DSL_CONSTRUCTORS)
        fn = jax.jit(build_augmenter(spec))
        out = fn(KEY, imgs)
        assert out.shape == imgs.shape
        assert 0.0 <= float(out.min()) and float(out.max()) <= 255.0
        # same key -> deterministic
        np.testing.assert_array_equal(np.asarray(fn(KEY, imgs)), np.asarray(out))


class TestOcclusion:
    def test_translate2d(self):
        img = jnp.zeros((8, 8), jnp.float32).at[2, 3].set(1.0)
        out = np.asarray(translate2d(img, jnp.int32(2), jnp.int32(-1)))
        assert out[4, 2] == 1.0 and out.sum() == 1.0

    def test_square_occlusion_guarantee(self):
        from augmentedautoencoder_tpu.data import pipeline as P

        masks = jnp.zeros((B, H, W), bool)  # all object
        noof = jnp.full((B,), H * W)
        # finer grid than the 128px default so partial occlusion is possible
        # at this 32px test resolution
        orig = P._square_occlusion_step
        step = lambda rng, m, **kw: orig(rng, m, size_percent=0.1)
        P._square_occlusion_step = step
        try:
            out = square_occlusion(KEY, masks, noof, max_occl=0.25)
        finally:
            P._square_occlusion_step = orig
        visible = (~np.asarray(out)).sum(axis=(1, 2)) / (H * W)
        assert (visible >= 0.75).all()
        assert (visible < 1.0).any()  # something was occluded


class TestDeviceDataset:
    def _make(self, square_occlusion=0.0):
        cfg = TrainConfig(h=H, w=W, c=C, noof_training_imgs=32, noof_bg_imgs=8)
        cfg.square_occlusion = square_occlusion
        cfg.code = S.Sequential([S.Sometimes(0.5, S.Add(value=(-25, 25)))])
        rng = np.random.RandomState(0)
        train_x = rng.randint(100, 200, (32, H, W, C), dtype=np.uint8)
        train_y = rng.randint(0, 255, (32, H, W, C), dtype=np.uint8)
        mask = np.zeros((32, H, W), bool)
        mask[:, :, : W // 2] = True  # left half is background
        bg = np.zeros((8, H, W, C), np.uint8)  # black backgrounds
        return DeviceDataset(cfg, train_x, mask, train_y, bg)

    def test_sample_batch_contract(self):
        ds = self._make()
        x, y = ds.sample_batch(KEY, 8)
        assert x.shape == (8, H, W, C) and y.shape == (8, H, W, C)
        assert x.dtype == jnp.float32
        assert 0.0 <= float(x.min()) and float(x.max()) <= 1.0

    def test_background_substitution(self):
        ds = self._make()
        x, _ = ds.sample_batch(KEY, 8)
        x = np.asarray(x)
        # left half replaced by black bg (then Add(+-25) may brighten it by
        # up to 25/255); right half stays bright (>= 100/255 minus Add(-25))
        assert x[:, :, : W // 2].max() <= 25.0 / 255.0 + 1e-6
        assert x[:, :, W // 2 :].mean() > 0.29

    def test_jit_and_determinism(self):
        ds = self._make(square_occlusion=0.25)
        fn = ds.sampler(8)
        x1, y1 = fn(KEY)
        x2, y2 = fn(KEY)
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        x3, _ = fn(jax.random.PRNGKey(1))
        assert (np.asarray(x3) != np.asarray(x1)).any()


class TestRandomOrder:
    def test_sequential_random_order_applies_all_ops(self):
        """Sequential(random_order=True): every op applied exactly once per
        batch, in a batch-random order (imgaug semantics)."""
        import jax

        from augmentedautoencoder_tpu.data import augment_spec as S
        from augmentedautoencoder_tpu.data.augment import build_augmenter

        spec = S.Sequential(
            [S.Add(value=(10, 10)), S.Multiply(mul=(2.0, 2.0))],
            random_order=True,
        )
        fn = jax.jit(build_augmenter(spec))
        imgs = jnp.full((4, 8, 8, 3), 50.0)
        seen = set()
        for seed in range(20):
            out = np.asarray(fn(jax.random.PRNGKey(seed), imgs))
            v = float(out[0, 0, 0, 0])
            # (50+10)*2 = 120 or 50*2+10 = 110 depending on sampled order
            assert v in (120.0, 110.0)
            seen.add(v)
        assert seen == {120.0, 110.0}  # both orders occur across seeds
