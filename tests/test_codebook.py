"""Codebook tests: NN query kernels, rotation lookup, auto_pose6d math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from augmentedautoencoder_tpu.codebook import Codebook
from augmentedautoencoder_tpu.config import TrainConfig
from augmentedautoencoder_tpu.geometry import view_sampler
from augmentedautoencoder_tpu.ops import cosine_similarity_topk, cosine_top1

KEY = jax.random.PRNGKey(0)


class TestNNQuery:
    def test_topk_matches_numpy(self):
        rng = np.random.RandomState(0)
        cb = rng.randn(500, 32).astype(np.float32)
        cb /= np.linalg.norm(cb, axis=1, keepdims=True)
        z = rng.randn(4, 32).astype(np.float32)
        vals, idcs = cosine_similarity_topk(jnp.asarray(z), jnp.asarray(cb), 5)
        zn = z / np.linalg.norm(z, axis=1, keepdims=True)
        cos = zn @ cb.T
        expect = np.argsort(-cos, axis=1)[:, :5]
        np.testing.assert_array_equal(np.asarray(idcs), expect)

    def test_top1_dispatch(self):
        rng = np.random.RandomState(1)
        cb = rng.randn(300, 16).astype(np.float32)
        cb /= np.linalg.norm(cb, axis=1, keepdims=True)
        z = rng.randn(8, 16).astype(np.float32)
        vals, idcs = cosine_top1(jnp.asarray(z), jnp.asarray(cb))
        zn = z / np.linalg.norm(z, axis=1, keepdims=True)
        np.testing.assert_array_equal(np.asarray(idcs), np.argmax(zn @ cb.T, axis=1))

    def test_pallas_kernel_interpret_mode(self):
        # run the TPU kernel via the interpreter on CPU to validate masking
        from functools import partial

        from jax.experimental import pallas as pl
        from augmentedautoencoder_tpu.ops import nn_query

        rng = np.random.RandomState(2)
        n = 300  # deliberately not a multiple of the tile
        cb = rng.randn(n, 128).astype(np.float32)
        cb /= np.linalg.norm(cb, axis=1, keepdims=True)
        z = rng.randn(8, 128).astype(np.float32)

        orig = pl.pallas_call
        with jax.disable_jit():
            import unittest.mock as mock

            with mock.patch.object(
                pl, "pallas_call", partial(orig, interpret=True)
            ):
                vals, idcs = nn_query.cosine_top1_pallas.__wrapped__(
                    jnp.asarray(z), jnp.asarray(cb), tile_n=256
                )
        zn = z / np.linalg.norm(z, axis=1, keepdims=True)
        np.testing.assert_array_equal(np.asarray(idcs), np.argmax(zn @ cb.T, axis=1))

    def test_pallas_kernel_bf16_codebook(self):
        # dtype-generic kernel: a bf16 codebook (the bf16 serving recipe)
        # must rank like the f32 reference on well-separated rows
        from functools import partial

        from jax.experimental import pallas as pl
        from augmentedautoencoder_tpu.ops import nn_query

        rng = np.random.RandomState(3)
        cb = rng.randn(300, 128).astype(np.float32)
        cb /= np.linalg.norm(cb, axis=1, keepdims=True)
        z = rng.randn(8, 128).astype(np.float32)

        orig = pl.pallas_call
        with jax.disable_jit():
            import unittest.mock as mock

            with mock.patch.object(
                pl, "pallas_call", partial(orig, interpret=True)
            ):
                vals, idcs = nn_query.cosine_top1_pallas.__wrapped__(
                    jnp.asarray(z), jnp.asarray(cb, jnp.bfloat16), tile_n=256
                )
        assert vals.dtype == jnp.float32  # f32 accumulation preserved
        zn = z / np.linalg.norm(z, axis=1, keepdims=True)
        np.testing.assert_array_equal(np.asarray(idcs), np.argmax(zn @ cb.T, axis=1))


def identity_encoder(latent: int):
    """Encoder stub: mean-pools the crop into a `latent`-dim code."""

    def encode(x):
        b = x.shape[0]
        pooled = x.reshape(b, -1)
        # deterministic projection to latent dims
        n = pooled.shape[1]
        cols = (jnp.arange(latent) * (n // latent)).astype(jnp.int32)
        return pooled[:, cols]

    return encode


class TestCodebookQueries:
    def _codebook(self, n_views=12, num_cyclo=4, latent=16):
        views = view_sampler.viewsphere_rotations(n_views, num_cyclo)
        n = len(views)
        rng = np.random.RandomState(0)
        emb = rng.randn(n, latent).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        # encoder returning a fixed row per call count is hard; instead use a
        # closure mapping a "crop" whose first pixel encodes a row index
        def encode(x):
            idx = (x[:, 0, 0, 0] * 1000).astype(jnp.int32) % n
            return jnp.asarray(emb)[idx] + 0.001  # near-exact match to row idx
        bbs = rng.randint(0, 100, (n, 4))
        return Codebook(encode, views, emb, bbs, num_cyclo=num_cyclo), n

    def test_self_retrieval(self):
        cb, n = self._codebook()
        for want in (0, 5, n - 1):
            x = np.full((8, 8, 3), want / 1000.0, np.float32)
            R = cb.nearest_rotation(x)
            np.testing.assert_allclose(R, cb.viewsphere[want])
            idx = cb.nearest_rotation(x, return_idcs=True)
            assert int(idx[0]) == want

    def test_top_n(self):
        cb, n = self._codebook()
        x = np.full((8, 8, 3), 7 / 1000.0, np.float32)
        idcs = cb.nearest_rotation(x, top_n=3, return_idcs=True)
        assert len(idcs) == 3 and int(idcs[0]) == 7

    def test_upright_stride(self):
        cb, n = self._codebook(num_cyclo=4)
        x = np.full((8, 8, 3), 6 / 1000.0, np.float32)  # 6 = view 1, cyclo 2
        idx = cb.nearest_rotation(x, upright=True, return_idcs=True)
        assert int(idx[0]) % 4 == 0  # restricted to cyclo-0 entries

    def test_upright_ignored_when_top_n_gt_1(self):
        # reference precedence (auto_pose/ae/codebook.py:64-71): top_n > 1
        # runs the plain argpartition path; upright only applies at top_n == 1
        cb, n = self._codebook(num_cyclo=4)
        x = np.full((8, 8, 3), 6 / 1000.0, np.float32)  # 6 = view 1, cyclo 2
        idcs = cb.nearest_rotation(x, top_n=3, upright=True, return_idcs=True)
        assert len(idcs) == 3
        assert int(idcs[0]) == 6  # NOT restricted to cyclo-0 multiples

    def test_batch_query(self):
        cb, n = self._codebook()
        xs = np.stack(
            [np.full((8, 8, 3), i / 1000.0, np.float32) for i in (1, 2, 3)]
        )
        Rs = cb.nearest_rotation_batch(xs)
        assert Rs.shape == (3, 3, 3)
        np.testing.assert_allclose(Rs[1], cb.viewsphere[2])


class TestAutoPose6D:
    def _setup(self):
        cfg = TrainConfig()  # K_train = [1075.65, 1073.90], radius 700
        views = view_sampler.viewsphere_rotations(12, 4)
        n = len(views)
        emb = np.eye(n, 16, dtype=np.float32)
        # rendered bbox centered on the principal point, 100x100
        bbs = np.tile(
            np.array([[360 - 50, 270 - 50, 100, 100]]), (n, 1)
        )
        target = 3

        def encode(x):
            return jnp.asarray(emb[target : target + 1])

        return cfg, Codebook(encode, views, emb, bbs, num_cyclo=4), target

    def test_depth_from_bb_ratio(self):
        cfg, cb, target = self._setup()
        x = np.zeros((32, 32, 3), np.float32)
        # same camera, detected bbox half the size -> twice the depth
        K_test = cfg.K
        pred_bb = [310, 220, 50, 50]
        Rs, ts = cb.auto_pose6d(x, pred_bb, K_test, 1, cfg)
        np.testing.assert_allclose(ts[0, 2], 1400.0, rtol=1e-6)

    def test_centered_detection_no_lateral_offset(self):
        cfg, cb, target = self._setup()
        x = np.zeros((32, 32, 3), np.float32)
        K_test = cfg.K
        # same bbox as rendered -> t = (0, 0, radius), R unchanged
        pred_bb = [310, 220, 100, 100]
        Rs, ts = cb.auto_pose6d(x, pred_bb, K_test, 1, cfg)
        np.testing.assert_allclose(ts[0], [0.0, 0.0, 700.0], atol=1e-9)
        np.testing.assert_allclose(Rs[0], cb.viewsphere[target], atol=1e-12)

    def test_off_center_rotation_correction(self):
        cfg, cb, target = self._setup()
        x = np.zeros((32, 32, 3), np.float32)
        K_test = cfg.K
        # shift detection 200px right -> tx > 0 and R corrected by rot about y
        pred_bb = [510, 220, 100, 100]
        Rs, ts = cb.auto_pose6d(x, pred_bb, K_test, 1, cfg)
        assert ts[0, 0] > 0 and abs(ts[0, 1]) < 1e-9
        expected_angle = np.arctan(ts[0, 0] / np.sqrt(ts[0, 2] ** 2 + ts[0, 1] ** 2))
        from augmentedautoencoder_tpu.geometry.transform import rotation_error

        angle = rotation_error(cb.viewsphere[target], Rs[0])
        np.testing.assert_allclose(angle, expected_angle, rtol=1e-9)

    def test_depth_pred_override(self):
        cfg, cb, target = self._setup()
        x = np.zeros((32, 32, 3), np.float32)
        Rs, ts = cb.auto_pose6d(x, [310, 220, 50, 50], cfg.K, 1, cfg, depth_pred=900.0)
        np.testing.assert_allclose(ts[0, 2], 900.0)
