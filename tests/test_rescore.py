"""Depth-based re-scoring of top-k pose hypotheses (pose/rescore.py).

New capability vs the reference (which always commits to the single cosine
argmax, auto_pose/ae/codebook.py:64-71): the top-k matches are expanded into
full 6D hypotheses, each is rendered, and the one whose depth best matches
the observed depth wins — correcting wrong-basin matches that ICP (a local
refinement) cannot fix.
"""

import numpy as np
import pytest

from augmentedautoencoder_tpu.codebook import Codebook
from augmentedautoencoder_tpu.config import TrainConfig
from augmentedautoencoder_tpu.geometry.transform import rotz
from augmentedautoencoder_tpu.pose.rescore import (
    depth_hypothesis_scores,
    select_best_hypothesis,
)

from test_tta_aggregate import _angular_codebook

CFG = TrainConfig()
DET_BB = np.array([[100.0, 80.0, 40.0, 40.0]])


def _codebook(query_angles, angles=None, num_cyclo=1):
    angles = list(range(0, 180, 5)) if angles is None else angles
    views, emb, bbs, enc = _angular_codebook(angles)
    return Codebook(enc(np.atleast_1d(query_angles)), views, emb, bbs,
                    num_cyclo=num_cyclo), np.asarray(angles)


class FakeDepthRenderer:
    """Renderer-contract stub whose depth encodes the pose's in-plane angle:
    a full-frame plane at 500 + 10 * angle_deg(R). Lets tests control which
    hypothesis 'explains' the observed depth."""

    def render(self, obj_id, W, H, K, R, t, near, far, random_light=False):
        ang = np.degrees(np.arctan2(R[1, 0], R[0, 0])) % 360.0
        depth = np.full((H, W), 500.0 + 10.0 * ang, np.float32)
        return np.zeros((H, W, 3), np.uint8), depth


class TestPose6dFromIndices:
    def test_matches_argmax_path_bitwise(self):
        cb, _ = _codebook([22.5])
        x = np.zeros((1, 8, 8, 3), np.float32)
        Rs, ts, idcs = cb.auto_pose6d_batch(x, DET_BB, CFG.K, CFG)
        Rs2, ts2 = cb.pose6d_from_indices(idcs, DET_BB, CFG.K, CFG)
        np.testing.assert_array_equal(Rs, Rs2)
        np.testing.assert_array_equal(ts, ts2)

    def test_2d_indices_flatten_to_hypotheses(self):
        cb, _ = _codebook([22.5])
        idcs_k = np.array([[4, 5, 3]])
        Rs, ts = cb.pose6d_from_indices(idcs_k, DET_BB, CFG.K, CFG)
        assert Rs.shape == (3, 3, 3) and ts.shape == (3, 3)
        for j, idx in enumerate(idcs_k[0]):
            R1, t1 = cb.pose6d_from_indices(np.array([idx]), DET_BB, CFG.K, CFG)
            np.testing.assert_array_equal(Rs[j], R1[0])
            np.testing.assert_array_equal(ts[j], t1[0])

    def test_depth_pred_repeats_per_candidate(self):
        cb, _ = _codebook([22.5])
        idcs_k = np.array([[4, 5]])
        _, ts = cb.pose6d_from_indices(
            idcs_k, DET_BB, CFG.K, CFG, depth_pred=np.array([777.0])
        )
        np.testing.assert_allclose(ts[:, 2], 777.0)


class TestTopkCandidates:
    def test_sorted_best_first_and_k1_is_argmax(self):
        cb, angles = _codebook([22.5])
        x = np.zeros((1, 8, 8, 3), np.float32)
        idcs, sims = cb.topk_candidates(x, 4)
        assert idcs.shape == (1, 4)
        assert np.all(np.diff(sims[0]) <= 1e-12)
        _, _, argmax_idx = cb.auto_pose6d_batch(x, DET_BB, CFG.K, CFG)
        assert idcs[0, 0] == argmax_idx[0]
        # 22.5 deg sits between the 20 and 25 deg bins: both must be in top-2
        assert {angles[i] for i in idcs[0, :2]} == {20, 25}


class TestDepthScoring:
    K_TEST = CFG.K

    def test_matching_hypothesis_scores_one(self):
        ren = FakeDepthRenderer()
        R_true = rotz(np.radians(40.0))
        _, d_obs = ren.render(0, 64, 48, self.K_TEST, R_true, np.zeros(3), 10, 1e4)
        Rs = np.stack([rotz(np.radians(a)) for a in (40.0, 120.0)])
        ts = np.tile([0.0, 0.0, 550.0], (2, 1))
        s = depth_hypothesis_scores(ren, self.K_TEST, (64, 48), d_obs, Rs, ts)
        assert s[0] == pytest.approx(1.0)
        assert s[1] == pytest.approx(0.0)

    def test_select_best_ties_resolve_to_best_cosine(self):
        ren = FakeDepthRenderer()
        R = rotz(np.radians(40.0))
        _, d_obs = ren.render(0, 64, 48, self.K_TEST, R, np.zeros(3), 10, 1e4)
        Rs_k = np.stack([R, R])[None]  # identical hypotheses -> tie
        ts_k = np.tile([0.0, 0.0, 550.0], (1, 2, 1))
        best, scores = select_best_hypothesis(
            ren, self.K_TEST, (64, 48), d_obs, Rs_k, ts_k
        )
        assert best[0] == 0
        assert scores.shape == (1, 2)

    def test_rescore_corrects_wrong_basin(self):
        """Cosine ranks the 20/25-deg bins first (query 22.5), but the
        observed depth was produced by the 170-deg pose: with k large
        enough to reach the 170-deg bin, re-scoring must pick it."""
        cb, angles = _codebook([22.5])
        x = np.zeros((1, 8, 8, 3), np.float32)
        k = len(angles)  # expand every bin so 170 deg is reachable
        idcs_k, _ = cb.topk_candidates(x, k)
        Rs_f, ts_f = cb.pose6d_from_indices(idcs_k, DET_BB, CFG.K, CFG)
        ren = FakeDepthRenderer()
        _, d_obs = ren.render(
            0, 64, 48, CFG.K, rotz(np.radians(170.0)), np.zeros(3), 10, 1e4
        )
        best, _ = select_best_hypothesis(
            ren, CFG.K, (64, 48), d_obs,
            Rs_f.reshape(1, k, 3, 3), ts_f.reshape(1, k, 3), tau=20.0,
        )
        # rotation correction tilts the in-plane angle slightly; the winner
        # must be the 170-deg bin's index regardless
        assert angles[idcs_k[0, best[0]]] == 170

    def test_offscreen_hypothesis_never_wins(self):
        class EmptyRenderer:
            def render(self, *a, **kw):
                return np.zeros((48, 64, 3), np.uint8), np.zeros((48, 64), np.float32)

        s = depth_hypothesis_scores(
            EmptyRenderer(), self.K_TEST, (64, 48),
            np.full((48, 64), 550.0, np.float32),
            np.eye(3)[None], np.array([[0.0, 0.0, 550.0]]),
        )
        assert s[0] == -1.0


class TestIcpFixedIndices:
    def test_stage2_keeps_the_rescored_candidate(self):
        """With both ICP cloud stages gated out (empty synthetic depth), a
        fixed_idcs refine_batch must return exactly pose6d_from_indices at
        the original depth — NOT a fresh argmax re-query."""
        from augmentedautoencoder_tpu.pose.icp import ICP, SynRenderer

        class EmptyRenderer:
            def render(self, *a, **kw):
                return np.zeros((48, 64, 3), np.uint8), np.zeros((48, 64), np.float32)

        cb, _ = _codebook([22.5])
        fixed = np.array([30])  # NOT the cosine argmax (bins 20/25 deg win)
        R0, t0 = cb.pose6d_from_indices(fixed, DET_BB, CFG.K, CFG)
        icp = ICP({"obj": SynRenderer(EmptyRenderer())})
        Rs, ts = icp.refine_batch(
            [np.zeros((8, 8), np.float32)], list(R0), list(t0), CFG.K, (64, 48),
            class_name="obj", codebook=cb,
            det_imgs=np.zeros((1, 8, 8, 3), np.float32), det_bbs=DET_BB,
            train_cfg=CFG, fixed_idcs=fixed,
        )
        expect_R, expect_t = cb.pose6d_from_indices(
            fixed, DET_BB, CFG.K, CFG, depth_pred=t0[:, 2]
        )
        np.testing.assert_allclose(Rs, expect_R, atol=1e-12)
        np.testing.assert_allclose(ts, expect_t, atol=1e-12)


class TestConfigGuards:
    def test_eval_cfg_mutual_exclusion(self, tmp_path):
        from augmentedautoencoder_tpu.config.eval_config import load_eval_config

        p = tmp_path / "eval.cfg"
        p.write_text(
            "[METHOD]\nMETHOD: aae\n[DATA]\nDATASET: d\nDATASET_PATH: /x\n"
            "OBJ_ID: 1\nSCENES: [1]\n[BBOXES]\nTOPK_AGGREGATE: 4\nTOPK_RESCORE: 4\n"
        )
        with pytest.raises(ValueError, match="mutually exclusive"):
            load_eval_config(str(p))

    def test_eval_cfg_parses_rescore(self, tmp_path):
        from augmentedautoencoder_tpu.config.eval_config import load_eval_config

        p = tmp_path / "eval.cfg"
        p.write_text(
            "[METHOD]\nMETHOD: aae\n[DATA]\nDATASET: d\nDATASET_PATH: /x\n"
            "OBJ_ID: 1\nSCENES: [1]\n[BBOXES]\nTOPK_RESCORE: 8\n"
        )
        assert load_eval_config(str(p)).topk_rescore == 8
