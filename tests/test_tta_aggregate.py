"""Test-time aggregation: top-k codebook blending + multi-crop TTA voting.

New capability beyond the reference (which always takes the single cosine
argmax, auto_pose/ae/codebook.py:64-71): `auto_pose6d_batch` can blend the
top-k matches (quaternion + rendered-bbox averaging within an angular
window of the top-1) and average cosine votes over jittered crops.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from augmentedautoencoder_tpu.codebook import (
    Codebook,
    _TTA_OFFSETS,
    tta_jittered_bboxes,
)
from augmentedautoencoder_tpu.config import TrainConfig
from augmentedautoencoder_tpu.geometry import transform
from augmentedautoencoder_tpu.geometry.transform import (
    matrices_from_quaternions,
    quaternion_from_matrix,
    quaternion_matrix,
    quaternions_from_matrices,
    rotation_error,
    rotz,
)


class TestBatchedQuaternions:
    def test_matches_scalar_roundtrip(self):
        rng = np.random.RandomState(0)
        Rs = np.stack(
            [transform.random_rotation_matrix(rng.rand(3))[:3, :3] for _ in range(64)]
        )
        qs = quaternions_from_matrices(Rs)
        for R, q in zip(Rs, qs):
            q_ref = quaternion_from_matrix(R)
            # quaternion sign is a gauge freedom
            assert min(np.abs(q - q_ref).max(), np.abs(q + q_ref).max()) < 1e-9
        np.testing.assert_allclose(matrices_from_quaternions(qs), Rs, atol=1e-9)

    def test_pivot_branches_covered(self):
        # 180-degree rotations about each axis exercise every Shepperd pivot
        Rs = np.stack(
            [np.eye(3)]
            + [quaternion_matrix([0, *ax])[:3, :3] for ax in np.eye(3)]
        )
        np.testing.assert_allclose(
            matrices_from_quaternions(quaternions_from_matrices(Rs)), Rs, atol=1e-9
        )

    def test_leading_shape_preserved(self):
        rng = np.random.RandomState(1)
        Rs = np.stack(
            [transform.random_rotation_matrix(rng.rand(3))[:3, :3] for _ in range(6)]
        ).reshape(2, 3, 3, 3)
        assert quaternions_from_matrices(Rs).shape == (2, 3, 4)


class TestJitteredBboxes:
    def test_first_is_original_and_size_unchanged(self):
        bbs = tta_jittered_bboxes([10, 20, 40, 60], 8)
        assert bbs.shape == (8, 4)
        np.testing.assert_allclose(bbs[0], [10, 20, 40, 60])
        # offsets only — w/h untouched (training never jitters scale)
        np.testing.assert_allclose(bbs[:, 2:], np.tile([40, 60], (8, 1)))
        # offsets stay within the training MAX_REL_OFFSET=0.2 envelope
        assert np.abs(bbs[:, 0] - 10).max() <= 0.2 * 40 + 1e-9
        assert np.abs(bbs[:, 1] - 20).max() <= 0.2 * 60 + 1e-9

    def test_pattern_is_deterministic_and_distinct(self):
        a = tta_jittered_bboxes([0, 0, 10, 10], 8)
        b = tta_jittered_bboxes([0, 0, 10, 10], 8)
        np.testing.assert_array_equal(a, b)
        assert len({tuple(r) for r in a.round(6).tolist()}) == 8

    def test_max_enforced(self):
        with pytest.raises(ValueError):
            tta_jittered_bboxes([0, 0, 10, 10], len(_TTA_OFFSETS) + 1)


def _angular_codebook(angles_deg, latent=8):
    """Codebook of in-plane rotations with codes on a smooth circle, so
    cosine similarity decays smoothly with angular distance — the SO(3)
    quantization-grid regime top-k blending is built for."""
    views = np.stack([rotz(np.radians(a)) for a in angles_deg])
    th = np.radians(np.asarray(angles_deg, np.float64))
    emb = np.zeros((len(th), latent), np.float32)
    # slow code-space rotation: 15 deg of pose = small angle in code space
    emb[:, 0] = np.cos(th / 3.0)
    emb[:, 1] = np.sin(th / 3.0)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    bbs = np.tile(np.array([[100.0, 80.0, 40.0, 40.0]]), (len(th), 1))

    def encode_factory(query_angles_deg):
        q = np.radians(np.asarray(query_angles_deg, np.float64))
        codes = np.zeros((len(q), latent), np.float32)
        codes[:, 0] = np.cos(q / 3.0)
        codes[:, 1] = np.sin(q / 3.0)

        def encode(x):
            return jnp.asarray(codes[: x.shape[0]])

        return encode

    return views, emb, bbs, encode_factory


class TestTopkAggregation:
    cfg = TrainConfig()

    def _pose(self, query_deg, k, angles=None, **kw):
        angles = list(range(0, 90, 5)) if angles is None else angles
        views, emb, bbs, enc = _angular_codebook(angles)
        cb = Codebook(enc([query_deg]), views, emb, bbs, num_cyclo=1)
        x = np.zeros((1, 8, 8, 3), np.float32)
        det_bb = np.array([[100.0, 80.0, 40.0, 40.0]])
        Rs, ts, idcs = cb.auto_pose6d_batch(
            x, det_bb, self.cfg.K, self.cfg, topk_aggregate=k, **kw
        )
        return Rs[0], ts[0], int(idcs[0])

    def test_k1_equals_argmax_path(self):
        R1, t1, i1 = self._pose(22.5, 1)
        # k>1 path with an aggregation window of ~0 degenerates to top-1
        Rk, tk, ik = self._pose(22.5, 4, agg_angle_deg=1e-6)
        assert i1 == ik
        np.testing.assert_allclose(R1, Rk, atol=1e-9)
        np.testing.assert_allclose(t1, tk, atol=1e-9)

    def test_blending_beats_grid_quantization(self):
        # true pose 22.5 deg sits exactly between the 20 and 25 deg bins:
        # argmax is >= 2.5 deg wrong by construction, the top-4 blend
        # interpolates the local neighborhood
        true_R = rotz(np.radians(22.5))
        R_argmax, _, _ = self._pose(22.5, 1)
        R_blend, _, _ = self._pose(22.5, 4)
        err_argmax = np.degrees(rotation_error(true_R, R_argmax))
        err_blend = np.degrees(rotation_error(true_R, R_blend))
        assert err_argmax >= 2.4
        assert err_blend < err_argmax / 2

    def test_distant_modes_never_averaged(self):
        # candidate set spans two far-apart clusters (0-10 and 170-180 deg);
        # the inlier window must keep the blend inside the top-1 cluster —
        # naive averaging would land near 90 deg, which matches nothing
        angles = [0, 5, 10, 170, 175, 180]
        R, _, idx = self._pose(5.0, 6, angles=angles)
        err_to_cluster = np.degrees(rotation_error(rotz(np.radians(5.0)), R))
        assert err_to_cluster < 12.0

    def test_translation_uses_blended_rendered_bb(self):
        # all rendered bbs identical -> blending must reproduce the plain
        # depth estimate exactly
        _, t1, _ = self._pose(22.5, 1)
        _, tk, _ = self._pose(22.5, 4)
        np.testing.assert_allclose(t1[2], tk[2], rtol=1e-6)

    def test_upright_restricts_candidates(self):
        angles = list(range(0, 90, 5))
        views, emb, bbs, enc = _angular_codebook(angles)
        cb = Codebook(enc([22.5]), views, emb, bbs, num_cyclo=3)
        x = np.zeros((1, 8, 8, 3), np.float32)
        det_bb = np.array([[100.0, 80.0, 40.0, 40.0]])
        _, _, idcs = cb.auto_pose6d_batch(
            x, det_bb, self.cfg.K, self.cfg, topk_aggregate=3, upright=True
        )
        assert int(idcs[0]) % 3 == 0


class TestMultiCropTTA:
    cfg = TrainConfig()

    def _row_codebook(self, n=24, latent=16, num_cyclo=1):
        from augmentedautoencoder_tpu.geometry import view_sampler

        views = view_sampler.viewsphere_rotations(12, num_cyclo)[:n]
        n = len(views)
        rng = np.random.RandomState(0)
        emb = rng.randn(n, latent).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)

        def encode(x):
            idx = (x[:, 0, 0, 0] * 1000).astype(jnp.int32) % n
            return jnp.asarray(emb)[idx]

        bbs = np.tile(np.array([[100.0, 80.0, 40.0, 40.0]]), (n, 1))
        return Codebook(encode, views, emb, bbs, num_cyclo=num_cyclo), n

    def test_majority_vote_wins(self):
        cb, n = self._row_codebook()
        # detection's 3 jittered crops: two vote row 4, one votes row 9
        xs = np.stack(
            [np.full((8, 8, 3), v / 1000.0, np.float32) for v in (4, 4, 9)]
        )
        det_bb = np.array([[100.0, 80.0, 40.0, 40.0]])
        _, _, idcs = cb.auto_pose6d_batch(xs, det_bb, self.cfg.K, self.cfg, tta=3)
        assert int(idcs[0]) == 4

    def test_identical_crops_match_single(self):
        cb, n = self._row_codebook()
        x1 = np.full((1, 8, 8, 3), 7 / 1000.0, np.float32)
        det_bb = np.array([[100.0, 80.0, 40.0, 40.0]])
        R1, t1, i1 = cb.auto_pose6d_batch(x1, det_bb, self.cfg.K, self.cfg)
        xs = np.repeat(x1, 4, axis=0)
        R4, t4, i4 = cb.auto_pose6d_batch(
            xs, det_bb, self.cfg.K, self.cfg, tta=4
        )
        assert int(i1[0]) == int(i4[0])
        np.testing.assert_allclose(R1, R4, atol=1e-6)
        np.testing.assert_allclose(t1, t4, atol=1e-6)

    def test_batch_of_detections_stays_detection_major(self):
        cb, n = self._row_codebook()
        # det0 votes row 2 (x3), det1 votes row 11 (x3)
        xs = np.stack(
            [np.full((8, 8, 3), v / 1000.0, np.float32) for v in (2, 2, 2, 11, 11, 11)]
        )
        det_bbs = np.tile(np.array([[100.0, 80.0, 40.0, 40.0]]), (2, 1))
        _, _, idcs = cb.auto_pose6d_batch(xs, det_bbs, self.cfg.K, self.cfg, tta=3)
        assert list(idcs) == [2, 11]

    def test_wrong_stack_size_raises(self):
        cb, n = self._row_codebook()
        xs = np.zeros((5, 8, 8, 3), np.float32)
        det_bbs = np.tile(np.array([[100.0, 80.0, 40.0, 40.0]]), (2, 1))
        with pytest.raises(ValueError):
            cb.auto_pose6d_batch(xs, det_bbs, self.cfg.K, self.cfg, tta=3)


class TestConfigPlumbing:
    def test_eval_cfg_keys(self, tmp_path):
        from augmentedautoencoder_tpu.config.eval_config import load_eval_config

        p = tmp_path / "eval.cfg"
        p.write_text(
            "[METHOD]\nMETHOD: aae\n[DATA]\nDATASET: x\n"
            "[BBOXES]\nTOPK_AGGREGATE: 8\nTTA_CROPS: 5\n"
            "ICP_FRAME_ACCURATE: True\n"
        )
        cfg = load_eval_config(str(p))
        assert cfg.topk_aggregate == 8
        assert cfg.tta_crops == 5
        assert cfg.icp_frame_accurate is True
        # defaults = strict reference parity
        p2 = tmp_path / "eval2.cfg"
        p2.write_text("[METHOD]\nMETHOD: aae\n")
        cfg2 = load_eval_config(str(p2))
        assert cfg2.topk_aggregate == 1
        assert cfg2.tta_crops == 1
        assert cfg2.topk_rescore == 1
        assert cfg2.icp_frame_accurate is False
