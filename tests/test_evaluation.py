"""Evaluation tests: metrics, matching, BOP CSV, and a full ae_eval run on a
synthetic BOP-format scene."""

import json
import os
import sys

import numpy as np
import pytest

from augmentedautoencoder_tpu.evaluation import pose_errors
from augmentedautoencoder_tpu.evaluation.bop_writer import (
    BopEstimate,
    read_bop_csv,
    write_bop_csv,
)
from augmentedautoencoder_tpu.evaluation.matching import (
    EstimateErrors,
    error_threshold,
    match_and_eval_performance_scores,
    match_poses,
)
from augmentedautoencoder_tpu.geometry import transform

K = np.array([[100.0, 0, 45], [0, 100.0, 34], [0, 0, 1.0]])


@pytest.fixture(scope="module")
def pts():
    rng = np.random.RandomState(0)
    return rng.rand(200, 3) * 60.0 - 30.0


class TestPointMetrics:
    def test_add_zero_for_identical(self, pts):
        R = transform.random_rotation_matrix(np.array([0.1, 0.2, 0.3]))[:3, :3]
        t = np.array([1.0, 2.0, 700.0])
        assert pose_errors.add(R, t, R, t, pts) == 0.0

    def test_add_translation_offset(self, pts):
        R = np.eye(3)
        t1 = np.array([0.0, 0.0, 700.0])
        t2 = t1 + [3.0, 4.0, 0.0]
        np.testing.assert_allclose(pose_errors.add(R, t1, R, t2, pts), 5.0, rtol=1e-6)

    def test_adi_leq_add(self, pts):
        R1 = np.eye(3)
        R2 = transform.rotation_matrix(0.3, [0, 0, 1])[:3, :3]
        t = np.array([0.0, 0.0, 700.0])
        adi = pose_errors.adi(R1, t, R2, t, pts)
        add = pose_errors.add(R1, t, R2, t, pts)
        assert adi <= add + 1e-5

    def test_re_te(self):
        R1 = np.eye(3)
        R2 = transform.rotation_matrix(np.deg2rad(30), [0, 1, 0])[:3, :3]
        np.testing.assert_allclose(pose_errors.re(R1, R2), 30.0, rtol=1e-6)
        assert pose_errors.te([0, 0, 700], [0, 0, 750]) == 50.0

    def test_proj(self, pts):
        R = np.eye(3)
        t1 = np.array([0.0, 0.0, 700.0])
        t2 = np.array([7.0, 0.0, 700.0])  # 7mm at z=700, f=100 -> ~1 px
        err = pose_errors.proj(R, t1, R, t2, K, pts)
        assert 0.8 < err < 1.2

    def test_cou_mask(self):
        a = np.zeros((10, 10), bool)
        b = np.zeros((10, 10), bool)
        a[:5], b[:5] = True, True
        assert pose_errors.cou_mask(a, b) == 0.0
        b[:] = False
        b[5:] = True
        assert pose_errors.cou_mask(a, b) == 1.0


class TestVSD:
    def test_vsd_zero_for_identical_pose(self):
        from augmentedautoencoder_tpu.renderer import FakeRenderer

        fake = FakeRenderer(object_radius=30.0)
        R = np.eye(3)
        t = np.array([0.0, 0.0, 700.0])
        _, depth_test = fake.render(0, 90, 68, K, R, t, 10, 10000)
        err = pose_errors.vsd(R, t, R, t, depth_test, K, fake)
        assert err < 0.01

    def test_vsd_high_for_wrong_depth(self):
        from augmentedautoencoder_tpu.renderer import FakeRenderer

        fake = FakeRenderer(object_radius=30.0)
        R = np.eye(3)
        t_gt = np.array([0.0, 0.0, 700.0])
        t_est = np.array([0.0, 0.0, 900.0])  # 200mm off >> tau=20
        _, depth_test = fake.render(0, 90, 68, K, R, t_gt, 10, 10000)
        err = pose_errors.vsd(R, t_est, R, t_gt, depth_test, K, fake)
        assert err > 0.5


class TestMatching:
    def test_greedy_matching(self):
        ests = [
            EstimateErrors(0, 0, 1, score=0.9, errors={0: 0.1, 1: 0.5}),
            EstimateErrors(0, 0, 1, score=0.8, errors={0: 0.05, 1: 0.2}),
        ]
        matches = match_poses(ests, threshold=0.3, n_top=-1)
        # highest score first: takes gt0 (err .1); second takes gt1 (err .2)
        assert matches[0][1] == 0 and matches[1][1] == 1

    def test_threshold_rejects(self):
        ests = [EstimateErrors(0, 0, 1, 1.0, {0: 0.9})]
        assert match_poses(ests, threshold=0.3)[0][1] is None

    def test_recall(self):
        ests = [
            EstimateErrors(0, i, 1, 1.0, {0: 0.1 if i < 7 else 0.9})
            for i in range(10)
        ]
        n_gts = {(0, i, 1): 1 for i in range(10)}
        scores = match_and_eval_performance_scores(ests, n_gts, threshold=0.3)
        assert scores["recall"] == 0.7
        assert scores["n_gt"] == 10

    def test_thresholds(self):
        assert error_threshold("vsd", error_thresh=0.3) == 0.3
        assert error_threshold("re", error_thresh_deg=5) == 5
        assert error_threshold("te", error_thresh_mm=50) == 50
        assert error_threshold("add", model_diameter=120.0) == 12.0
        with pytest.raises(ValueError):
            error_threshold("add")


class TestBopCSV:
    def test_roundtrip(self, tmp_path):
        ests = [
            BopEstimate(1, 2, 5, 0.9, np.eye(3), np.array([1.0, 2.0, 700.0]), 0.2)
        ]
        path = write_bop_csv(ests, str(tmp_path), "aaetpu", "tless")
        assert path.endswith("aaetpu_tless-test.csv")
        back = read_bop_csv(path)
        assert len(back) == 1
        np.testing.assert_allclose(back[0].R, np.eye(3))
        np.testing.assert_allclose(back[0].t, [1.0, 2.0, 700.0])
        assert back[0].scene_id == 1 and back[0].obj_id == 5


@pytest.mark.e2e
class TestEvalPipeline:
    def _make_scene(self, root, renderer, Rs, W=90, H=68):
        """Write a synthetic BOP-format scene rendered at known GT poses."""
        import cv2

        scene_dir = os.path.join(root, "test", "000001")
        os.makedirs(os.path.join(scene_dir, "rgb"), exist_ok=True)
        os.makedirs(os.path.join(scene_dir, "depth"), exist_ok=True)
        os.makedirs(os.path.join(scene_dir, "mask_visib"), exist_ok=True)
        t = np.array([0.0, 0.0, 300.0])
        gt, cam, gt_info = {}, {}, {}
        from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox

        for i, R in enumerate(Rs):
            bgr, depth = renderer.render(0, W, H, K, R, t, 10, 10000, random_light=False)
            cv2.imwrite(os.path.join(scene_dir, "rgb", f"{i:06d}.png"), bgr)
            cv2.imwrite(
                os.path.join(scene_dir, "depth", f"{i:06d}.png"),
                np.round(depth).astype(np.uint16),
            )
            cv2.imwrite(
                os.path.join(scene_dir, "mask_visib", f"{i:06d}_000000.png"),
                (depth > 0).astype(np.uint8) * 255,
            )
            ys, xs = np.nonzero(depth > 0)
            bb = [int(v) for v in calc_2d_bbox(xs, ys, (W, H))]
            gt[str(i)] = [
                {
                    "obj_id": 1,
                    "cam_R_m2c": R.ravel().tolist(),
                    "cam_t_m2c": t.tolist(),
                }
            ]
            cam[str(i)] = {"cam_K": K.ravel().tolist(), "depth_scale": 1.0}
            # unoccluded synthetic views: visib ~1, spread slightly so the
            # occlusion-binned plots see more than one bin
            gt_info[str(i)] = [
                {
                    "bbox_obj": bb,
                    "bbox_visib": bb,
                    "visib_fract": round(0.95 - 0.25 * (i % 3), 2),
                }
            ]
        with open(os.path.join(scene_dir, "scene_gt.json"), "w") as fh:
            json.dump(gt, fh)
        with open(os.path.join(scene_dir, "scene_camera.json"), "w") as fh:
            json.dump(cam, fh)
        with open(os.path.join(scene_dir, "scene_gt_info.json"), "w") as fh:
            json.dump(gt_info, fh)
        return scene_dir

    def test_evaluator_with_external_detections(self, tmp_path):
        """EST_BBS path: detections json replaces GT boxes."""
        import jax.numpy as jnp

        from augmentedautoencoder_tpu.codebook import Codebook
        from augmentedautoencoder_tpu.config import TrainConfig
        from augmentedautoencoder_tpu.config.eval_config import EvalConfig
        from augmentedautoencoder_tpu.evaluation.evaluator import Evaluator
        from augmentedautoencoder_tpu.geometry.view_sampler import (
            calc_2d_bbox,
            viewsphere_rotations,
        )
        from augmentedautoencoder_tpu.renderer import Renderer
        from augmentedautoencoder_tpu.renderer.procedural import make_icosphere

        renderer = Renderer([], backend="numpy",
                            meshes=[make_icosphere(subdivisions=2, radius=60.0)])
        views = viewsphere_rotations(12, 4, 300.0)
        scene_dir = self._make_scene(str(tmp_path / "data"), renderer, [views[2]])

        # detections: the true bbox, slightly jittered
        import cv2

        depth = cv2.imread(os.path.join(scene_dir, "depth", "000000.png"),
                           cv2.IMREAD_UNCHANGED)
        ys, xs = np.nonzero(depth > 0)
        x, y, w, h = [float(v) for v in calc_2d_bbox(xs, ys, (90, 68))]
        det_json = {"1": {"0": [{"obj_id": 1, "bbox": [x - 1, y, w + 2, h], "score": 0.9}]}}
        det_path = tmp_path / "dets.json"
        with open(det_path, "w") as fh:
            json.dump(det_json, fh)

        # identity-style codebook: encode crops with a trivial projection so
        # self-similar crops retrieve plausibly (quality isn't the point —
        # the detection plumbing is)
        train_cfg = TrainConfig(h=32, w=32, c=3)
        train_cfg.radius = 300.0
        train_cfg.render_dims = (90, 68)
        train_cfg.k = tuple(K.ravel())
        train_cfg.min_n_views, train_cfg.num_cyclo = 12, 4

        def encode(xb):
            b = xb.shape[0]
            pooled = xb.reshape(b, -1)
            cols = (jnp.arange(16) * (pooled.shape[1] // 16)).astype(jnp.int32)
            return pooled[:, cols]

        # embedding from rendered views through the same encoder
        import jax

        emb_imgs = []
        bbs = []
        for R in views:
            bgr, d = renderer.render(0, 90, 68, K, R, np.array([0, 0, 300.0]), 10, 10000)
            ys2, xs2 = np.nonzero(d > 0)
            bb = calc_2d_bbox(xs2, ys2, (90, 68))
            bbs.append(bb)
            from augmentedautoencoder_tpu.data.dataset import extract_square_patch

            emb_imgs.append(extract_square_patch(bgr, bb, 1.2, resize=(32, 32)) / 255.0)
        z = np.asarray(encode(jnp.asarray(np.stack(emb_imgs), jnp.float32)))
        z = z / np.maximum(np.linalg.norm(z, axis=1, keepdims=True), 1e-9)
        codebook = Codebook(encode, views, z, np.asarray(bbs), num_cyclo=4)

        ec = EvalConfig()
        ec.dataset_path = str(tmp_path / "data")
        ec.obj_id = 1
        ec.scenes = [1]
        ec.cam_type = ""
        ec.estimate_bbs = True
        ec.detections_path = str(det_path)
        ec.error_types = ["re", "te"]
        ec.error_thresh_deg = 180.0
        ec.error_thresh_mm = 1e9

        ev = Evaluator(codebook, train_cfg, ec)
        out = ev.run(str(tmp_path / "evalout"), progress=False)
        assert len(out["results"]) == 1
        r = out["results"][0]
        assert r.score == 0.9 and r.gt_idx == -1
        assert "re" in r.errors and "te" in r.errors
        # generous thresholds -> recall 1
        assert out["scores"]["re"]["recall"] == 1.0

        # sixd17 per-view result file written in the reference layout
        # (eval_dir/<scene:02d>/<im:04d>_<obj:02d>.yml, ae_eval.py:241-243)
        from augmentedautoencoder_tpu.evaluation.sixd_writer import (
            load_results_sixd17,
        )

        yml = tmp_path / "evalout" / "01" / f"{r.im_id:04d}_01.yml"
        assert yml.exists()
        parsed = load_results_sixd17(str(yml))
        assert parsed["run_time"] >= 0
        assert len(parsed["ests"]) == 1
        np.testing.assert_allclose(parsed["ests"][0]["R"], r.R_est, atol=1e-7)
        np.testing.assert_allclose(parsed["ests"][0]["t"], r.t_est, atol=1e-7)
        assert parsed["ests"][0]["score"] == 0.9

    def test_gt_masks_zero_background(self, tmp_path):
        """GT_MASKS feeds background-zeroed crops, matching the reference
        BOP driver's `img * mask_visib` (compute_bop_results_m3.py:162-176).
        Also covers SceneLoader.load_mask_visib present/missing cases."""
        import cv2

        from augmentedautoencoder_tpu.config import TrainConfig
        from augmentedautoencoder_tpu.config.eval_config import EvalConfig
        from augmentedautoencoder_tpu.evaluation.evaluator import Evaluator
        from augmentedautoencoder_tpu.evaluation.scene_loader import SceneLoader
        from augmentedautoencoder_tpu.geometry.view_sampler import (
            viewsphere_rotations,
        )
        from augmentedautoencoder_tpu.renderer import Renderer
        from augmentedautoencoder_tpu.renderer.procedural import make_icosphere

        renderer = Renderer([], backend="numpy",
                            meshes=[make_icosphere(subdivisions=2, radius=60.0)])
        views = viewsphere_rotations(12, 4, 300.0)
        scene_dir = self._make_scene(str(tmp_path / "data"), renderer, [views[0]])

        # pollute the background so unmasked crops can't be all-object
        rgb_p = os.path.join(scene_dir, "rgb", "000000.png")
        img = cv2.imread(rgb_p)
        mask = cv2.imread(
            os.path.join(scene_dir, "mask_visib", "000000_000000.png"),
            cv2.IMREAD_UNCHANGED,
        ) > 127
        noise = np.random.RandomState(0).randint(
            30, 255, img.shape).astype(np.uint8)
        img[~mask] = noise[~mask]
        cv2.imwrite(rgb_p, img)

        loader = SceneLoader(scene_dir)
        m = loader.load_mask_visib(0, 0)
        assert m is not None and m.dtype == bool and m.any()
        assert loader.load_mask_visib(0, 7) is None  # no such instance

        captured = []

        class StubCodebook:
            def auto_pose6d_batch(self, crops, bbs, K_, cfg, **kw):
                captured.append(crops.copy())
                n = crops.shape[0]
                return (np.tile(np.eye(3), (n, 1, 1)),
                        np.tile(np.array([0.0, 0.0, 300.0]), (n, 1)),
                        np.zeros(n, int))

        train_cfg = TrainConfig(h=32, w=32, c=3)
        ec = EvalConfig()
        ec.obj_id = 1
        ev = Evaluator(StubCodebook(), train_cfg, ec)

        ec.gt_masks = False
        assert len(ev.estimate_image(loader, 1, 0)) == 1
        ec.gt_masks = True
        assert len(ev.estimate_image(loader, 1, 0)) == 1
        unmasked, masked = captured
        # padded square crop corners lie outside the silhouette: noisy
        # unmasked, exactly zero once the visible mask is applied
        assert unmasked[0, 0, 0].sum() > 0
        assert masked[0, 0, 0].sum() == 0
        assert not np.array_equal(unmasked, masked)
        # object interior identical either way
        cy, cx = 16, 16
        np.testing.assert_array_equal(unmasked[0, cy, cx], masked[0, cy, cx])

    def test_ae_eval_cli_on_synthetic_scene(self, tmp_path, monkeypatch):
        # reuse the e2e workspace recipe: train + embed a tiny experiment
        from tests.test_end_to_end import TINY_CFG

        import cv2

        from augmentedautoencoder_tpu.cli import ae_embed, ae_eval, ae_train
        from augmentedautoencoder_tpu.renderer import Renderer
        from augmentedautoencoder_tpu.renderer.procedural import (
            make_textured_asymmetric,
            save_ply,
        )

        ws_path = str(tmp_path / "workspace")
        model_path = str(tmp_path / "sphere.ply")
        save_ply(make_textured_asymmetric(subdivisions=2, radius=60.0), model_path)
        bg_dir = tmp_path / "bg"
        bg_dir.mkdir()
        rng = np.random.RandomState(0)
        for i in range(8):
            cv2.imwrite(str(bg_dir / f"bg_{i}.jpg"), rng.randint(0, 255, (48, 64, 3), np.uint8))

        monkeypatch.setenv("AE_WORKSPACE_PATH", ws_path)
        from augmentedautoencoder_tpu.cli import ae_init_workspace

        ae_init_workspace.main()
        with open(os.path.join(ws_path, "cfg", "evalobj.cfg"), "w") as fh:
            fh.write(TINY_CFG.format(model_path=model_path, bg_glob=str(bg_dir / "*.jpg")))

        def run(module, argv):
            monkeypatch.setattr(sys, "argv", ["prog"] + argv)
            module.main()

        run(ae_train, ["evalobj"])
        run(ae_embed, ["evalobj", "--batch_size", "16"])

        # synthetic test scene: GT rotations ARE codebook views -> the barely
        # trained model must still retrieve them (images match embedding
        # renders exactly), so re ~ 0 and vsd ~ 0
        renderer = Renderer([], backend="numpy",
                            meshes=[make_textured_asymmetric(subdivisions=2, radius=60.0)])
        from augmentedautoencoder_tpu.geometry.view_sampler import viewsphere_rotations

        views = viewsphere_rotations(12, 4, 300.0)
        dataset_root = str(tmp_path / "bopdata")
        self._make_scene(dataset_root, renderer, [views[0], views[5], views[9]])

        eval_cfg_text = f"""
[METHOD]
METHOD: aae
[DATA]
DATASET: synth
DATASET_PATH: {dataset_root}
OBJ_ID: 1
SCENES: [1]
CAM_TYPE:
[BBOXES]
ESTIMATE_BBS: False
SINGLE_INSTANCE: True
ICP: False
[EVALUATION]
COMPUTE_ERRORS: True
EVALUATE_ERRORS: True
[METRIC]
ERROR_TYPES: ['vsd', 're', 'te']
VSD_DELTA: 15
VSD_TAU: 20
VSD_COST: step
ERROR_THRESH: 0.3
ERROR_THRESH_DEG: 15
ERROR_THRESH_MM: 100
TOP_N_EVAL: 1
TOP_N: 1
[PLOT]
COMPUTE_PLOTS: True
"""
        with open(os.path.join(ws_path, "cfg_eval", "eval.cfg"), "w") as fh:
            fh.write(eval_cfg_text)

        run(ae_eval, ["evalobj", "synth_eval"])

        eval_dir = os.path.join(
            ws_path, "experiments", "evalobj", "eval", "synth_eval", "synth"
        )
        assert os.path.exists(os.path.join(eval_dir, "results.json"))
        with open(os.path.join(eval_dir, "scores.json")) as fh:
            scores = json.load(fh)
        # exact-match retrieval: rotation recall must be perfect, translation
        # near-perfect, vsd = 0 under step cost
        assert scores["re"]["recall"] == 1.0
        assert scores["te"]["recall"] == 1.0
        assert scores["vsd"]["recall"] == 1.0
        with open(os.path.join(eval_dir, "results.json")) as fh:
            results = json.load(fh)
        assert len(results) == 3
        for r in results:
            assert r["errors"]["re"] < 1.0  # degrees
            assert r["errors"]["te"] < 10.0  # mm
        assert os.path.exists(os.path.join(eval_dir, "error_hist_re.png"))
        assert os.path.exists(os.path.join(eval_dir, "recall_by_metric.png"))
        # occlusion-binned analysis plots (reference eval_plots.py:540-662)
        # fire because the fixture scene carries visib_fract in gt_info
        assert os.path.exists(os.path.join(eval_dir, "vsd_occlusion.png"))
        assert os.path.exists(os.path.join(eval_dir, "vsd_occlusion.tex"))
        assert os.path.exists(os.path.join(eval_dir, "R_err_occlusion.png"))
        assert os.path.exists(os.path.join(eval_dir, "R_err_occlusion.tex"))
        # scene overlay with the estimate (eval_plots.py:210-265)
        assert os.path.exists(os.path.join(eval_dir, "scene_with_estimate.png"))
        # reconstruction + nearest-neighbor grids (eval_plots.py:37-72)
        assert os.path.exists(os.path.join(eval_dir, "reconstruction_imgs.png"))
        assert os.path.exists(os.path.join(eval_dir, "nearest_neighbors.png"))

        # ---- second run with ICP refinement through the CLI wiring
        # (regression: the _Refiner closure once shadowed its ICP handle and
        # recursed; this drives evaluator -> _Refiner -> ICP.refine end-to-end)
        with open(os.path.join(ws_path, "cfg_eval", "eval.cfg"), "w") as fh:
            fh.write(eval_cfg_text.replace("ICP: False", "ICP: True"))
        run(ae_eval, ["evalobj", "synth_eval_icp"])
        icp_dir = os.path.join(
            ws_path, "experiments", "evalobj", "eval", "synth_eval_icp", "synth"
        )
        with open(os.path.join(icp_dir, "results.json")) as fh:
            icp_results = json.load(fh)
        assert len(icp_results) == 3
        for r in icp_results:
            # starting from the exact pose, refinement must stay near it
            assert r["errors"]["re"] < 5.0
            assert r["errors"]["te"] < 20.0

        # ---- third run: the reference's per-figure [PLOT] toggles
        # (eval_template.cfg:32-44 / ae_eval.py:183-276) actually gate
        # emission — everything off except VIEWSPHERE
        with open(os.path.join(ws_path, "cfg_eval", "eval.cfg"), "w") as fh:
            fh.write(eval_cfg_text + """
VIEWSPHERE: True
NEAREST_NEIGHBORS: False
SCENE_WITH_ESTIMATE: False
CUM_T_ERROR_HIST: False
CUM_R_ERROR_HIST: False
CUM_VSD_ERROR_HIST: False
VSD_OCCLUSION: False
R_ERROR_OCCLUSION: False
RECONSTRUCTION_TEST_BATCH: False
ANIMATE_EMBEDDING_PCA: True
""")
        run(ae_eval, ["evalobj", "synth_eval_toggles"])
        tog_dir = os.path.join(
            ws_path, "experiments", "evalobj", "eval", "synth_eval_toggles", "synth"
        )
        assert os.path.exists(os.path.join(tog_dir, "results.json"))
        assert os.path.exists(os.path.join(tog_dir, "viewsphere.png"))
        # ANIMATE_EMBEDDING_PCA: real multi-frame GIF (the reference's
        # function is an empty stub)
        from PIL import Image

        gif = Image.open(os.path.join(tog_dir, "embedding_path.gif"))
        assert getattr(gif, "n_frames", 1) == 3  # one per eval crop
        # the scores bar rides the master COMPUTE_PLOTS switch
        assert os.path.exists(os.path.join(tog_dir, "recall_by_metric.png"))
        for off in (
            "error_hist_re.png", "vsd_occlusion.png", "R_err_occlusion.png",
            "scene_with_estimate.png", "reconstruction_imgs.png",
            "nearest_neighbors.png",
        ):
            assert not os.path.exists(os.path.join(tog_dir, off)), off
