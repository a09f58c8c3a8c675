"""End-to-end slice through the real CLI surface:

  ae_init_workspace -> ae_train (render + train) -> ae_embed (codebook)
  -> nearest_rotation self-retrieval on embedding renders.

Uses a procedural textured asymmetric PLY, tiny dims, the numpy rasterizer — fully
hermetic (no GL, no assets, no TPU).
"""

import os
import sys
import textwrap

import numpy as np
import pytest

TINY_CFG = textwrap.dedent(
    """
    [Paths]
    MODEL_PATH: {model_path}
    BACKGROUND_IMAGES_GLOB: {bg_glob}

    [Dataset]
    MODEL: reconst
    H: 32
    W: 32
    C: 3
    RADIUS: 300
    RENDER_DIMS: (90, 68)
    K: [100, 0, 45, 0, 100, 34, 0, 0, 1]
    VERTEX_SCALE: 1
    ANTIALIASING: 1
    PAD_FACTOR: 1.2
    CLIP_NEAR: 10
    CLIP_FAR: 10000
    NOOF_TRAINING_IMGS: 16
    NOOF_BG_IMGS: 8

    [Augmentation]
    REALISTIC_OCCLUSION: False
    SQUARE_OCCLUSION: False
    MAX_REL_OFFSET: 0.2
    CODE: Sequential([
        Sometimes(0.5, Add((-25, 25), per_channel=0.3)),
        Sometimes(0.5, Multiply((0.6, 1.4)))
        ], random_order=False)

    [Embedding]
    EMBED_BB: True
    MIN_N_VIEWS: 12
    NUM_CYCLO: 4

    [Network]
    BATCH_NORMALIZATION: False
    AUXILIARY_MASK: False
    VARIATIONAL: 0
    LOSS: L2
    BOOTSTRAP_RATIO: 4
    NORM_REGULARIZE: 0
    LATENT_SPACE_SIZE: 16
    NUM_FILTER: [8, 16]
    STRIDES: [2, 2]
    KERNEL_SIZE_ENCODER: 5
    KERNEL_SIZE_DECODER: 5

    [Training]
    OPTIMIZER: Adam
    NUM_ITER: 10
    BATCH_SIZE: 8
    LEARNING_RATE: 1e-3
    SAVE_INTERVAL: 10

    [Queue]
    NUM_THREADS: 1
    QUEUE_SIZE: 2
    """
)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import cv2

    from augmentedautoencoder_tpu.renderer.procedural import (
        make_textured_asymmetric,
        save_ply,
    )

    root = tmp_path_factory.mktemp("ws")
    ws_path = str(root / "workspace")

    model_path = str(root / "sphere.ply")
    # asymmetric textured object: retrieval is well-conditioned (distinct
    # views have cosine gaps >> float ulp; a sphere's in-plane duplicates
    # do not, making exact self-retrieval depend on bit-identical paths)
    save_ply(make_textured_asymmetric(subdivisions=2, radius=60.0), model_path)

    bg_dir = root / "bg"
    bg_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(8):
        cv2.imwrite(str(bg_dir / f"bg_{i}.jpg"), rng.randint(0, 255, (48, 64, 3), np.uint8))

    os.environ["AE_WORKSPACE_PATH"] = ws_path
    from augmentedautoencoder_tpu.cli import ae_init_workspace

    ae_init_workspace.main()

    cfg_text = TINY_CFG.format(model_path=model_path, bg_glob=str(bg_dir / "*.jpg"))
    with open(os.path.join(ws_path, "cfg", "e2e_obj.cfg"), "w") as fh:
        fh.write(cfg_text)
    return ws_path


def run_cli(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    module.main()


@pytest.mark.e2e
class TestEndToEnd:
    def test_full_pipeline(self, workspace, monkeypatch):
        from augmentedautoencoder_tpu.cli import ae_embed, ae_train

        # ---- train (renders the dataset, runs 10 fused iterations, saves)
        run_cli(ae_train, ["e2e_obj"], monkeypatch)
        log_dir = os.path.join(workspace, "experiments", "e2e_obj")
        assert os.path.exists(os.path.join(log_dir, "e2e_obj.cfg"))
        ckpt_dir = os.path.join(log_dir, "checkpoints")
        assert any(n.startswith("chkpt-") for n in os.listdir(ckpt_dir))
        figs = os.listdir(os.path.join(log_dir, "train_figures"))
        assert any(n.startswith("training_images_") for n in figs)

        # ---- debug mode writes the augmented grid without training further
        run_cli(ae_train, ["e2e_obj", "-d"], monkeypatch)
        assert "debug_augmented_batch.png" in os.listdir(
            os.path.join(log_dir, "train_figures")
        )

        # ---- embed
        run_cli(ae_embed, ["e2e_obj", "--batch_size", "16"], monkeypatch)

        # ---- infer: self-retrieval of embedding renders
        from augmentedautoencoder_tpu import factory

        codebook, dataset = factory.build_codebook_from_name(
            "e2e_obj", return_dataset=True
        )
        n = dataset.embedding_size
        assert codebook.embedding_normalized.shape == (n, 16)
        assert codebook.embed_obj_bbs.shape == (n, 4)

        batch, _ = dataset.render_embedding_image_batch(0, 8)
        assert batch.dtype == np.uint8  # on-device normalization contract
        idcs = codebook.nearest_rotation(batch[0], return_idcs=True)
        assert int(idcs[0]) == 0  # exact self-retrieval of view 0

        Rs = codebook.nearest_rotation_batch(batch.astype(np.float32) / 255.0)
        recovered = [int(codebook.nearest_rotation(batch[i],
                                                   return_idcs=True)[0]) for i in range(8)]
        # the encoder is barely trained; self-retrieval must still be exact
        # because identical inputs produce identical codes. NB indices are
        # recovered up to duplicate rotations: linspace(0, 2pi, num_cyclo)
        # includes both endpoints (reference dataset.py:54), so cyclo index
        # num_cyclo-1 duplicates cyclo 0 — compare rotations, not indices.
        for i, r in enumerate(recovered):
            np.testing.assert_allclose(
                codebook.viewsphere[r], codebook.viewsphere[i], atol=1e-12
            )
        assert Rs.shape == (8, 3, 3)

        # ---- full 6D on a rendered view through auto_pose6d
        cfg = dataset.cfg
        x = batch[3]  # uint8 crop
        bb = codebook.embed_obj_bbs[3]
        Rs_est, ts_est = codebook.auto_pose6d(x, bb, cfg.K, 1, cfg)
        np.testing.assert_allclose(ts_est[0, 2], cfg.radius, rtol=1e-5)
        np.testing.assert_allclose(Rs_est[0], codebook.viewsphere[3], atol=1e-5)

    def test_pose_estimator_api(self, workspace, monkeypatch, tmp_path):
        """Full m3-style API: test cfg -> AePoseEstimator.process()."""
        import cv2

        from augmentedautoencoder_tpu import factory
        from augmentedautoencoder_tpu.pose import AePoseEstimator, BoundingBox
        from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox

        test_cfg = tmp_path / "m3.cfg"
        test_cfg.write_text(
            "[auto_pose]\n"
            "camPose = False\n"
            "upright = False\n"
            "topk = 1\n"
            "color_format = bgr\n"
            "color_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            "class_2_encoder = {'sphere': 'e2e_obj'}\n"
        )
        estimator = AePoseEstimator(str(test_cfg))
        assert estimator.query_process_requirements() == ["color_img", "camK", "bboxes"]

        # scene: the object rendered at a known pose
        codebook, dataset = factory.build_codebook_from_name(
            "e2e_obj", return_dataset=True
        )
        cfg = dataset.cfg
        R = codebook.viewsphere[5]
        t = np.array([0.0, 0.0, cfg.radius])
        bgr, depth = dataset.renderer.render(
            0, cfg.render_dims[0], cfg.render_dims[1], cfg.K, R, t,
            cfg.clip_near, cfg.clip_far, random_light=False,
        )
        ys, xs = np.nonzero(depth > 0)
        x, y, w, h = calc_2d_bbox(xs, ys, cfg.render_dims)
        W, H = cfg.render_dims
        box = BoundingBox(
            xmin=x / W, ymin=y / H, xmax=(x + w) / W, ymax=(y + h) / H,
            classes={"sphere": 0.99},
        )
        poses = estimator.process(bboxes=[box], color_img=bgr, camK=cfg.K)
        assert len(poses) == 1
        pose = poses[0]
        assert pose.name == "sphere"
        # translation in meters, z near radius (0.3 m), small lateral offset
        t_m = pose.trafo[:3, 3]
        assert abs(t_m[2] - cfg.radius / 1000.0) < 0.05
        assert np.linalg.norm(t_m[:2]) < 0.05
        # rotation is a valid rotation matrix
        R_est = pose.trafo[:3, :3]
        np.testing.assert_allclose(R_est @ R_est.T, np.eye(3), atol=1e-6)

        # unknown class boxes are skipped
        poses2 = estimator.process(
            bboxes=[BoundingBox(classes={"unknown": 1.0})], color_img=bgr, camK=cfg.K
        )
        assert poses2 == []

        # multi-class frame: two codebooks (here backed by the same
        # experiment) grouped and batched per class in one process() call
        test_cfg2 = tmp_path / "m3_two.cfg"
        test_cfg2.write_text(
            "[auto_pose]\n"
            "camPose = False\n"
            "upright = False\n"
            "topk = 1\n"
            "color_format = bgr\n"
            "color_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            "class_2_encoder = {'sphere': 'e2e_obj', 'sphere2': 'e2e_obj'}\n"
        )
        est2 = AePoseEstimator(str(test_cfg2))
        box2 = BoundingBox(
            xmin=x / W, ymin=y / H, xmax=(x + w) / W, ymax=(y + h) / H,
            classes={"sphere2": 0.8},
        )
        poses3 = est2.process(bboxes=[box, box2], color_img=bgr, camK=cfg.K)
        assert {p.name for p in poses3} == {"sphere", "sphere2"}
        # same crop through the same weights -> identical pose
        np.testing.assert_allclose(poses3[0].trafo, poses3[1].trafo, atol=1e-6)

        # depth-based ICP refinement through the m3 API (use_icp; the
        # reference's estimator only carries this as commented-out code)
        test_cfg3 = tmp_path / "m3_icp.cfg"
        test_cfg3.write_text(
            "[auto_pose]\n"
            "camPose = False\n"
            "upright = False\n"
            "topk = 1\n"
            "use_icp = True\n"
            "color_format = bgr\n"
            "color_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            "class_2_encoder = {'sphere': 'e2e_obj'}\n"
        )
        est3 = AePoseEstimator(str(test_cfg3))
        assert "depth_img" in est3.query_process_requirements()
        poses_icp = est3.process(
            bboxes=[box], color_img=bgr, depth_img=depth, camK=cfg.K
        )
        assert len(poses_icp) == 1
        t_icp = poses_icp[0].trafo[:3, 3]
        # depth stage must keep (usually improve) the z estimate
        assert abs(t_icp[2] - cfg.radius / 1000.0) <= abs(t_m[2] - cfg.radius / 1000.0) + 0.01
        R_icp = poses_icp[0].trafo[:3, :3]
        np.testing.assert_allclose(R_icp @ R_icp.T, np.eye(3), atol=1e-5)

    def test_pose_server_matches_estimator(self, workspace, monkeypatch, tmp_path):
        """PoseServer (stacked encoders + codebook slab, one dispatch per
        frame) must return the same poses as the per-class AePoseEstimator,
        and its pipelined stream must match the sync path."""
        from augmentedautoencoder_tpu import factory
        from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox
        from augmentedautoencoder_tpu.pose import AePoseEstimator, BoundingBox
        from augmentedautoencoder_tpu.serving import PoseServer

        test_cfg = tmp_path / "m3_srv.cfg"
        test_cfg.write_text(
            "[auto_pose]\n"
            "camPose = False\n"
            "upright = False\n"
            "topk = 1\n"
            "color_format = bgr\n"
            "color_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            "class_2_encoder = {'sphere': 'e2e_obj', 'sphere2': 'e2e_obj'}\n"
        )
        estimator = AePoseEstimator(str(test_cfg))
        server = PoseServer(str(test_cfg), max_dets_per_class=4)

        codebook, dataset = factory.build_codebook_from_name(
            "e2e_obj", return_dataset=True
        )
        cfg = dataset.cfg
        W, H = cfg.render_dims
        frames = []
        for view in (2, 5, 9):
            R = codebook.viewsphere[view]
            bgr, depth = dataset.renderer.render(
                0, W, H, cfg.K, R, np.array([0.0, 0.0, cfg.radius]),
                cfg.clip_near, cfg.clip_far, random_light=False,
            )
            ys, xs = np.nonzero(depth > 0)
            x, y, w, h = calc_2d_bbox(xs, ys, cfg.render_dims)
            boxes = [
                BoundingBox(xmin=x / W, ymin=y / H, xmax=(x + w) / W,
                            ymax=(y + h) / H, classes={"sphere": 0.99}),
                BoundingBox(xmin=x / W, ymin=y / H, xmax=(x + w) / W,
                            ymax=(y + h) / H, classes={"sphere2": 0.8}),
            ]
            frames.append({"bboxes": boxes, "color_img": bgr, "camK": cfg.K})

        # sync parity vs the estimator
        for fr in frames:
            ref = estimator.process(**fr)
            out = server.process(**fr)
            assert {p.name for p in out} == {p.name for p in ref}
            for p_ref, p_out in zip(ref, out):
                np.testing.assert_allclose(p_out.trafo, p_ref.trafo, atol=1e-4)

        # pipelined stream == sync results, order preserved
        streamed = list(server.process_stream(iter(frames), depth=2))
        assert len(streamed) == 3
        for fr, got in zip(frames, streamed):
            want = server.process(**fr)
            for p_w, p_g in zip(want, got):
                np.testing.assert_allclose(p_g.trafo, p_w.trafo, atol=1e-6)

        # depth-enabled serving: with use_icp the server refines with the
        # frame's depth image (poses stay valid, z stays near truth)
        icp_cfg = tmp_path / "m3_srv_icp.cfg"
        icp_cfg.write_text(test_cfg.read_text().replace(
            "topk = 1\n", "topk = 1\nuse_icp = True\n"
        ))
        srv_icp = PoseServer(str(icp_cfg), max_dets_per_class=4)
        R = codebook.viewsphere[5]
        bgr, depth = dataset.renderer.render(
            0, W, H, cfg.K, R, np.array([0.0, 0.0, cfg.radius]),
            cfg.clip_near, cfg.clip_far, random_light=False,
        )
        ys, xs = np.nonzero(depth > 0)
        x, y, w, h = calc_2d_bbox(xs, ys, cfg.render_dims)
        box = BoundingBox(xmin=x / W, ymin=y / H, xmax=(x + w) / W,
                          ymax=(y + h) / H, classes={"sphere": 0.99})
        out = srv_icp.process([box], bgr, cfg.K, depth_img=depth)
        assert len(out) == 1
        t_m = out[0].trafo[:3, 3]
        assert abs(t_m[2] - cfg.radius / 1000.0) < 0.05
        R_est = out[0].trafo[:3, :3]
        np.testing.assert_allclose(R_est @ R_est.T, np.eye(3), atol=1e-5)

        # the threaded pipelined stream (retrieve on a worker thread so
        # frame n's ICP overlaps frame n+1's dispatch) must match the sync
        # path bitwise: ICP subsampling draws from the global np.random
        # (reference icp_utils.py:269-270 parity), so both passes reseed —
        # retrieves are serialized in submit order, making draw order equal
        icp_frames = [
            {"bboxes": [box], "color_img": bgr, "camK": cfg.K,
             "depth_img": depth}
            for _ in range(3)
        ]
        np.random.seed(7)
        icp_sync = [srv_icp.process(**fr) for fr in icp_frames]
        np.random.seed(7)
        icp_streamed = list(
            srv_icp.process_stream(iter(icp_frames), depth=2)
        )
        assert len(icp_streamed) == 3
        for s_out, p_out in zip(icp_sync, icp_streamed):
            np.testing.assert_allclose(
                p_out[0].trafo, s_out[0].trafo, atol=0
            )

        # crowded frame OVERFLOWS max_dets_per_class: a server with
        # max_dets=2 must chunk (not silently drop) and match the roomy
        # server detection-for-detection (regression: pre-round-3 the
        # extras vanished from the results)
        crowded = [
            BoundingBox(xmin=x / W, ymin=y / H, xmax=(x + w) / W,
                        ymax=(y + h) / H, classes={"sphere": 0.9})
            for _ in range(5)
        ]
        small = PoseServer(str(test_cfg), max_dets_per_class=2)
        got = small.process(crowded, bgr, cfg.K)
        want = server.process(crowded, bgr, cfg.K)  # max_dets=4: 2 chunks
        assert len(got) == len(want) == 5
        for p_w, p_g in zip(want, got):
            np.testing.assert_allclose(p_g.trafo, p_w.trafo, atol=1e-6)

    def test_pose_server_profile_stages(self, workspace, monkeypatch, tmp_path):
        """profile=True accumulates the crop/dispatch/readback/pose-math
        stage split (scripts/bench_serving_breakdown.py reads it); off by
        default it stays empty."""
        from augmentedautoencoder_tpu import factory
        from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox
        from augmentedautoencoder_tpu.pose import BoundingBox
        from augmentedautoencoder_tpu.serving import PoseServer

        test_cfg = tmp_path / "m3_prof.cfg"
        test_cfg.write_text(
            "[auto_pose]\n"
            "camPose = False\nupright = False\ntopk = 1\n"
            "color_format = bgr\ncolor_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            "class_2_encoder = {'sphere': 'e2e_obj'}\n"
        )
        codebook, dataset = factory.build_codebook_from_name(
            "e2e_obj", return_dataset=True
        )
        cfg = dataset.cfg
        W, H = cfg.render_dims
        bgr, depth = dataset.renderer.render(
            0, W, H, cfg.K, codebook.viewsphere[3],
            np.array([0.0, 0.0, cfg.radius]),
            cfg.clip_near, cfg.clip_far, random_light=False,
        )
        ys, xs = np.nonzero(depth > 0)
        x, y, w, h = calc_2d_bbox(xs, ys, cfg.render_dims)
        box = BoundingBox(xmin=x / W, ymin=y / H, xmax=(x + w) / W,
                          ymax=(y + h) / H, classes={"sphere": 0.99})

        plain = PoseServer(str(test_cfg), max_dets_per_class=2)
        plain.process([box], bgr, cfg.K)
        assert plain.profile_times == {}

        prof = PoseServer(str(test_cfg), max_dets_per_class=2, profile=True)
        want = plain.process([box], bgr, cfg.K)
        for _ in range(2):
            got = prof.process([box], bgr, cfg.K)
        # profiling must not perturb results
        np.testing.assert_allclose(got[0].trafo, want[0].trafo, atol=1e-6)
        summary = prof.profile_summary()
        assert set(summary) == {"crop_extract", "dispatch", "readback", "pose_math"}
        assert all(v >= 0.0 for v in summary.values())
        assert prof.profile_frames == 2

    def test_pose_server_aggregate_and_rescore_knobs(
        self, workspace, monkeypatch, tmp_path
    ):
        """PoseServer honors topk_aggregate (device lax.top_k + shared
        aggregate_candidates blend) and topk_rescore (hypothesis expansion +
        depth re-scoring) — each must match the AePoseEstimator running the
        same m3 config on the same frame."""
        from augmentedautoencoder_tpu import factory
        from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox
        from augmentedautoencoder_tpu.pose import AePoseEstimator, BoundingBox
        from augmentedautoencoder_tpu.serving import PoseServer

        base = (
            "[auto_pose]\n"
            "camPose = False\nupright = False\ntopk = 1\n"
            "color_format = bgr\ncolor_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            "class_2_encoder = {'sphere': 'e2e_obj'}\n"
        )
        codebook, dataset = factory.build_codebook_from_name(
            "e2e_obj", return_dataset=True
        )
        cfg = dataset.cfg
        W, H = cfg.render_dims
        bgr, depth = dataset.renderer.render(
            0, W, H, cfg.K, codebook.viewsphere[7],
            np.array([0.0, 0.0, cfg.radius]),
            cfg.clip_near, cfg.clip_far, random_light=False,
        )
        ys, xs = np.nonzero(depth > 0)
        x, y, w, h = calc_2d_bbox(xs, ys, cfg.render_dims)
        box = BoundingBox(xmin=x / W, ymin=y / H, xmax=(x + w) / W,
                          ymax=(y + h) / H, classes={"sphere": 0.99})

        agg_cfg = tmp_path / "m3_agg.cfg"
        agg_cfg.write_text(base + "topk_aggregate = 4\n")
        ref = AePoseEstimator(str(agg_cfg)).process(
            [box], color_img=bgr, camK=cfg.K
        )
        srv = PoseServer(str(agg_cfg), max_dets_per_class=2)
        assert srv._query_k == 4
        out = srv.process([box], bgr, cfg.K)
        np.testing.assert_allclose(out[0].trafo, ref[0].trafo, atol=1e-4)
        # the blend must differ from the plain argmax pose (k>1 is live)
        plain_cfg = tmp_path / "m3_plain.cfg"
        plain_cfg.write_text(base)
        plain = PoseServer(str(plain_cfg), max_dets_per_class=2)
        p0 = plain.process([box], bgr, cfg.K)
        assert np.abs(out[0].trafo - p0[0].trafo).max() > 0

        rs_cfg = tmp_path / "m3_rs.cfg"
        rs_cfg.write_text(base + "topk_rescore = 4\n")
        est_rs = AePoseEstimator(str(rs_cfg))
        assert "depth_img" in est_rs.query_process_requirements()
        ref_rs = est_rs.process(
            [box], color_img=bgr, camK=cfg.K, depth_img=depth
        )
        srv_rs = PoseServer(str(rs_cfg), max_dets_per_class=2)
        out_rs = srv_rs.process([box], bgr, cfg.K, depth_img=depth)
        np.testing.assert_allclose(out_rs[0].trafo, ref_rs[0].trafo, atol=1e-4)
        # without depth the rescore server falls back to the argmax path
        out_nodepth = srv_rs.process([box], bgr, cfg.K)
        np.testing.assert_allclose(
            out_nodepth[0].trafo, p0[0].trafo, atol=1e-6
        )

        both = tmp_path / "m3_both.cfg"
        both.write_text(base + "topk_aggregate = 4\ntopk_rescore = 4\n")
        with pytest.raises(ValueError, match="mutually exclusive"):
            AePoseEstimator(str(both))

        # upright restricts candidates to the in-plane-free stride — the
        # server must match the estimator's upright results (it used to
        # silently ignore the flag), with and without aggregation
        for extra in ("", "topk_aggregate = 4\n"):
            up_cfg = tmp_path / f"m3_up{len(extra)}.cfg"
            up_cfg.write_text(
                base.replace("upright = False", "upright = True") + extra
            )
            ref_up = AePoseEstimator(str(up_cfg)).process(
                [box], color_img=bgr, camK=cfg.K
            )
            out_up = PoseServer(str(up_cfg), max_dets_per_class=2).process(
                [box], bgr, cfg.K
            )
            np.testing.assert_allclose(
                out_up[0].trafo, ref_up[0].trafo, atol=1e-4
            )

    def test_pose_server_topk_kernel_path_interpret(
        self, workspace, monkeypatch, tmp_path
    ):
        """The serving TPU branch for k>1 (fused grouped top-k Pallas
        kernel) must produce the same poses as the XLA lax.top_k path —
        exercised on CPU by forcing _on_tpu and interpret-mode pallas,
        with and without the upright stride."""
        from functools import partial
        from unittest import mock

        from jax.experimental import pallas as pl

        from augmentedautoencoder_tpu import factory
        from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox
        from augmentedautoencoder_tpu.pose import BoundingBox
        from augmentedautoencoder_tpu.serving import PoseServer

        base = (
            "[auto_pose]\n"
            "camPose = False\nupright = False\ntopk = 1\n"
            "color_format = bgr\ncolor_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            "class_2_encoder = {'sphere': 'e2e_obj'}\n"
            "topk_aggregate = 4\n"
        )
        codebook, dataset = factory.build_codebook_from_name(
            "e2e_obj", return_dataset=True
        )
        cfg = dataset.cfg
        W, H = cfg.render_dims
        bgr, depth = dataset.renderer.render(
            0, W, H, cfg.K, codebook.viewsphere[7],
            np.array([0.0, 0.0, cfg.radius]),
            cfg.clip_near, cfg.clip_far, random_light=False,
        )
        ys, xs = np.nonzero(depth > 0)
        x, y, w, h = calc_2d_bbox(xs, ys, cfg.render_dims)
        box = BoundingBox(xmin=x / W, ymin=y / H, xmax=(x + w) / W,
                          ymax=(y + h) / H, classes={"sphere": 0.99})

        for upright in (False, True):
            txt = base if not upright else base.replace(
                "upright = False", "upright = True"
            )
            m3 = tmp_path / f"m3_kernel_{upright}.cfg"
            m3.write_text(txt)
            srv = PoseServer(str(m3), max_dets_per_class=2)
            ref = srv.process([box], bgr, cfg.K)  # XLA path (CPU backend)

            srv2 = PoseServer(str(m3), max_dets_per_class=2)
            srv2._on_tpu = True
            orig = pl.pallas_call
            with mock.patch.object(
                pl, "pallas_call", partial(orig, interpret=True)
            ):
                out = srv2.process([box], bgr, cfg.K)
            np.testing.assert_allclose(
                out[0].trafo, ref[0].trafo, atol=1e-5
            )

    def test_estimator_tta_and_topk_aggregate_knobs(
        self, workspace, monkeypatch, tmp_path
    ):
        """[auto_pose] topk_aggregate / tta_crops knob plumbing through the
        real AePoseEstimator.process: parsing, explicit-1/1 parity with the
        plain estimator, well-formed + deterministic aggregated output.
        (Accuracy semantics live in tests/test_tta_aggregate.py with
        controlled codebooks — the 10-iteration e2e fixture model's
        similarity landscape is too flat to pin rotations.)"""
        from augmentedautoencoder_tpu import factory
        from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox
        from augmentedautoencoder_tpu.pose import AePoseEstimator, BoundingBox

        base = (
            "[auto_pose]\n"
            "camPose = False\nupright = False\ntopk = 1\n"
            "color_format = bgr\ncolor_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            "class_2_encoder = {'sphere': 'e2e_obj'}\n"
        )
        plain_cfg = tmp_path / "m3_plain.cfg"
        plain_cfg.write_text(base)
        one_cfg = tmp_path / "m3_one.cfg"
        one_cfg.write_text(base + "topk_aggregate = 1\ntta_crops = 1\n")
        agg_cfg = tmp_path / "m3_agg.cfg"
        agg_cfg.write_text(base + "topk_aggregate = 4\ntta_crops = 5\n")

        codebook, dataset = factory.build_codebook_from_name(
            "e2e_obj", return_dataset=True
        )
        cfg = dataset.cfg
        W, H = cfg.render_dims
        bgr, depth = dataset.renderer.render(
            0, W, H, cfg.K, codebook.viewsphere[4],
            np.array([0.0, 0.0, cfg.radius]),
            cfg.clip_near, cfg.clip_far, random_light=False,
        )
        ys, xs = np.nonzero(depth > 0)
        x, y, w, h = calc_2d_bbox(xs, ys, cfg.render_dims)
        box = BoundingBox(xmin=x / W, ymin=y / H, xmax=(x + w) / W,
                          ymax=(y + h) / H, classes={"sphere": 0.99})

        plain = AePoseEstimator(str(plain_cfg))
        assert plain._topk_aggregate == 1 and plain._tta_crops == 1
        agg = AePoseEstimator(str(agg_cfg))
        assert agg._topk_aggregate == 4 and agg._tta_crops == 5

        p = plain.process([box], color_img=bgr, camK=cfg.K)[0]
        # explicit 1/1 = strict parity with the default path
        one = AePoseEstimator(str(one_cfg)).process(
            [box], color_img=bgr, camK=cfg.K
        )[0]
        np.testing.assert_allclose(one.trafo, p.trafo, atol=1e-12)

        a = agg.process([box], color_img=bgr, camK=cfg.K)[0]
        R_est = a.trafo[:3, :3]
        np.testing.assert_allclose(R_est @ R_est.T, np.eye(3), atol=1e-6)
        assert np.all(np.isfinite(a.trafo))
        assert 0.0 < a.trafo[2, 3] < 10.0  # meters, in front of the camera
        # deterministic jitter pattern -> deterministic aggregate
        a2 = agg.process([box], color_img=bgr, camK=cfg.K)[0]
        np.testing.assert_allclose(a2.trafo, a.trafo, atol=0.0)

    def test_pose_server_bf16_serving(self, workspace, monkeypatch, tmp_path):
        """bf16 serving (bf16 convs + bf16 codebook slab, f32 latent head
        and f32 cosine accumulation — the recipe bf16 training validated)
        must retrieve the same codebook views as the f32 server on
        exact-match crops."""
        from augmentedautoencoder_tpu import factory
        from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox
        from augmentedautoencoder_tpu.pose import BoundingBox
        from augmentedautoencoder_tpu.serving import PoseServer

        test_cfg = tmp_path / "m3_bf16.cfg"
        test_cfg.write_text(
            "[auto_pose]\n"
            "camPose = False\n"
            "upright = False\n"
            "topk = 1\n"
            "color_format = bgr\n"
            "color_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            "class_2_encoder = {'sphere': 'e2e_obj'}\n"
        )
        server32 = PoseServer(str(test_cfg), max_dets_per_class=4)
        server16 = PoseServer(
            str(test_cfg), max_dets_per_class=4, precision="bfloat16"
        )
        assert server16._slab.dtype.name == "bfloat16"

        codebook, dataset = factory.build_codebook_from_name(
            "e2e_obj", return_dataset=True
        )
        cfg = dataset.cfg
        W, H = cfg.render_dims
        for view in (2, 9):
            R = codebook.viewsphere[view]
            bgr, depth = dataset.renderer.render(
                0, W, H, cfg.K, R, np.array([0.0, 0.0, cfg.radius]),
                cfg.clip_near, cfg.clip_far, random_light=False,
            )
            ys, xs = np.nonzero(depth > 0)
            x, y, w, h = calc_2d_bbox(xs, ys, cfg.render_dims)
            box = BoundingBox(xmin=x / W, ymin=y / H, xmax=(x + w) / W,
                              ymax=(y + h) / H, classes={"sphere": 0.99})
            h32 = server32.submit([box], bgr, cfg.K)
            h16 = server16.submit([box], bgr, cfg.K)
            p32 = server32.retrieve(h32)
            p16 = server16.retrieve(h16)
            assert len(p16) == len(p32) == 1
            # bf16 may only flip retrieval on NEAR-TIED cosines (the 10-iter
            # fixture model has genuinely tied views; production codebooks
            # were A/B'd at 100% agreement, scripts/bench_serving_bf16.py).
            # Same view -> identical pose; different view -> the two max
            # cosines must be within bf16 resolution of each other.
            # handle internals hold per-chunk (max_dets,) arrays; k=1
            # handles carry no scores (retrieve never needs them), so for
            # the near-tie check recompute both cosines from the f32
            # codebook directly
            i32 = int(np.asarray(h32.idcs["sphere"][0])[0])
            i16 = int(np.asarray(h16.idcs["sphere"][0])[0])
            if i16 == i32:
                np.testing.assert_allclose(p16[0].trafo, p32[0].trafo, atol=1e-5)
            else:
                import jax.numpy as jnp
                from augmentedautoencoder_tpu.pose.estimator import (
                    extract_square_patch_centered,
                )

                crop = extract_square_patch_centered(
                    bgr, [x, y, w, h], server32._est.pad_factors["sphere"],
                    resize=server32._est.patch_sizes["sphere"],
                    interpolation="linear", black_borders=True,
                )
                z = np.asarray(
                    server32._encode(
                        server32._params_by_class["sphere"],
                        jnp.asarray(crop[None]),
                    )
                )[0]
                zn = z / np.linalg.norm(z)
                emb = np.asarray(codebook.embedding_normalized)
                v32, v16 = float(zn @ emb[i32]), float(zn @ emb[i16])
                assert abs(v16 - v32) < 0.05, (i32, i16, v32, v16)
            R16 = p16[0].trafo[:3, :3]
            np.testing.assert_allclose(R16 @ R16.T, np.eye(3), atol=1e-5)

        # config-driven precision selection
        cfg16 = tmp_path / "m3_bf16b.cfg"
        cfg16.write_text(
            test_cfg.read_text().replace(
                "topk = 1\n", "topk = 1\nserving_precision = bfloat16\n"
            )
        )
        assert PoseServer(str(cfg16), max_dets_per_class=4).precision == "bfloat16"

    def test_pose_server_recommended_recipe_matches_estimator(
        self, workspace, monkeypatch, tmp_path
    ):
        """The FULL shipped accuracy recipe — frame-accurate ICP +
        topk_aggregate 8 — served by PoseServer must match
        AePoseEstimator.process pose-for-pose (same global np.random ICP
        subsample stream), with upright both off and on; the bf16 serving
        arm of the same recipe must stay a valid nearby pose."""
        from augmentedautoencoder_tpu import factory
        from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox
        from augmentedautoencoder_tpu.pose import AePoseEstimator, BoundingBox
        from augmentedautoencoder_tpu.serving import PoseServer

        base = (
            "[auto_pose]\n"
            "camPose = False\nupright = {up}\ntopk = 1\n"
            "use_icp = True\nicp_frame_accurate = True\n"
            "topk_aggregate = 8\n"
            "color_format = bgr\ncolor_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            "class_2_encoder = {{'sphere': 'e2e_obj'}}\n"
        )
        codebook, dataset = factory.build_codebook_from_name(
            "e2e_obj", return_dataset=True
        )
        cfg = dataset.cfg
        W, H = cfg.render_dims
        bgr, depth = dataset.renderer.render(
            0, W, H, cfg.K, codebook.viewsphere[4],
            np.array([0.0, 0.0, cfg.radius]),
            cfg.clip_near, cfg.clip_far, random_light=False,
        )
        ys, xs = np.nonzero(depth > 0)
        x, y, w, h = calc_2d_bbox(xs, ys, cfg.render_dims)
        box = BoundingBox(xmin=x / W, ymin=y / H, xmax=(x + w) / W,
                          ymax=(y + h) / H, classes={"sphere": 0.99})

        for up in ("False", "True"):
            cfg_path = tmp_path / f"m3_recipe_{up}.cfg"
            cfg_path.write_text(base.format(up=up))
            est = AePoseEstimator(str(cfg_path))
            srv = PoseServer(str(cfg_path), max_dets_per_class=4)
            # ICP subsampling draws from the global np.random stream; reset
            # it identically so both paths see the same clouds
            np.random.seed(123)
            ref = est.process([box], color_img=bgr, camK=cfg.K,
                              depth_img=depth)
            np.random.seed(123)
            out = srv.process([box], bgr, cfg.K, depth_img=depth)
            assert len(out) == len(ref) == 1
            np.testing.assert_allclose(
                out[0].trafo, ref[0].trafo, atol=1e-4,
                err_msg=f"recipe mismatch (upright={up})",
            )

        # bf16 arm of the same recipe: near-tied candidate flips allowed,
        # but the served pose must stay rigid and near the f32 one
        srv16 = PoseServer(
            str(tmp_path / "m3_recipe_False.cfg"), max_dets_per_class=4,
            precision="bfloat16",
        )
        np.random.seed(123)
        out16 = srv16.process([box], bgr, cfg.K, depth_img=depth)
        R16 = out16[0].trafo[:3, :3]
        np.testing.assert_allclose(R16 @ R16.T, np.eye(3), atol=1e-5)
        assert abs(out16[0].trafo[2, 3] - cfg.radius / 1000.0) < 0.05

    def test_aae_image_demo_cli(self, workspace, monkeypatch, tmp_path):
        """The reference's single-crop demo (test/aae_image.py): estimate a
        crop's rotation and write input|re-rendered-estimate side by side."""
        import cv2

        from augmentedautoencoder_tpu import factory
        from augmentedautoencoder_tpu.cli import aae_image
        from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox

        codebook, dataset = factory.build_codebook_from_name(
            "e2e_obj", return_dataset=True
        )
        cfg = dataset.cfg
        W, H = cfg.render_dims
        R = codebook.viewsphere[7]
        bgr, depth = dataset.renderer.render(
            0, W, H, cfg.K, R, np.array([0.0, 0.0, cfg.radius]),
            cfg.clip_near, cfg.clip_far, random_light=False,
        )
        ys, xs = np.nonzero(depth > 0)
        from augmentedautoencoder_tpu.data.dataset import extract_square_patch

        crop = extract_square_patch(
            bgr, calc_2d_bbox(xs, ys, cfg.render_dims), cfg.pad_factor,
            resize=(cfg.w, cfg.h),
        )
        crop_path = tmp_path / "crop.png"
        cv2.imwrite(str(crop_path), crop)
        out_dir = tmp_path / "demo_out"
        run_cli(aae_image, ["e2e_obj", "-f", str(crop_path),
                            "-o", str(out_dir)], monkeypatch)
        out = cv2.imread(str(out_dir / "crop_estimate.png"))
        assert out is not None
        # input | estimate side-by-side: twice the crop width
        assert out.shape == (cfg.h, 2 * cfg.w, 3)
        assert out[:, cfg.w:].max() > 0  # estimate pane rendered

    def test_variant_pipeline_aux_mask_vae_bn(self, workspace, monkeypatch):
        """Train -> embed -> infer with every optional [Network] head ON
        (AUXILIARY_MASK + VARIATIONAL + BATCH_NORMALIZATION, reference
        encoder.py:70-94 / decoder.py:68-75): pins the CLI + factory paths
        for tuple decoder outputs and batch_stats restore."""
        import re as _re

        from augmentedautoencoder_tpu import factory
        from augmentedautoencoder_tpu.cli import ae_embed, ae_train

        cfg_path = os.path.join(workspace, "cfg", "e2e_var.cfg")
        base = open(os.path.join(workspace, "cfg", "e2e_obj.cfg")).read()
        var = base
        for k, v in (("AUXILIARY_MASK", "True"), ("VARIATIONAL", "1e-4"),
                     ("BATCH_NORMALIZATION", "True")):
            var = _re.sub(rf"{k}:.*", f"{k}: {v}", var)
        assert var != base
        with open(cfg_path, "w") as fh:
            fh.write(var)

        run_cli(ae_train, ["e2e_var"], monkeypatch)
        run_cli(ae_embed, ["e2e_var", "--batch_size", "16"], monkeypatch)

        codebook, dataset, decode = factory.build_codebook_from_name(
            "e2e_var", return_dataset=True, return_decoder=True
        )
        n = dataset.embedding_size
        assert codebook.embedding_normalized.shape == (n, 16)

        batch, _ = dataset.render_embedding_image_batch(0, 8)
        idcs = codebook.nearest_rotation(batch[0], return_idcs=True)
        assert 0 <= int(idcs[0]) < n
        # decode strips the mask head (factory returns reconstruction only)
        z = codebook.test_embedding(batch[:2], normalized=False)
        reconst = np.asarray(decode(z))
        assert reconst.shape == (2, 32, 32, 3)
        assert np.isfinite(reconst).all()
        assert 0.0 <= reconst.min() and reconst.max() <= 1.0  # sigmoid output

    def test_aae_webcam_demo_cli(self, workspace, monkeypatch):
        """The reference's live demo loop (test/aae_webcam.py) driven
        hermetically: a fake capture serves a rendered view, the loop
        estimates + re-renders it, 'q' quits, the stream is released."""
        import cv2

        from augmentedautoencoder_tpu import factory
        from augmentedautoencoder_tpu.cli import aae_webcam

        codebook, dataset = factory.build_codebook_from_name(
            "e2e_obj", return_dataset=True
        )
        cfg = dataset.cfg
        W, H = cfg.render_dims
        frame, _ = dataset.renderer.render(
            0, W, H, cfg.K, codebook.viewsphere[3],
            np.array([0.0, 0.0, cfg.radius]),
            cfg.clip_near, cfg.clip_far, random_light=False,
        )

        class FakeCap:
            def __init__(self, src):
                self.released = False

            def set(self, *a):
                pass

            def read(self):
                return True, frame.copy()

            def release(self):
                self.released = True

        caps, shown = {}, {}
        monkeypatch.setattr(cv2, "VideoCapture",
                            lambda src: caps.setdefault("c", FakeCap(src)))
        monkeypatch.setattr(cv2, "imshow",
                            lambda name, img: shown.__setitem__(
                                name, np.asarray(img)))
        # second displayed frame quits the loop
        keys = iter([255, ord("q"), ord("q"), ord("q")])
        monkeypatch.setattr(cv2, "waitKey", lambda ms: next(keys))
        run_cli(aae_webcam, ["e2e_obj"], monkeypatch)

        assert caps["c"].released
        assert len(shown) == 2  # input pane + estimate pane
        for img in shown.values():
            assert img.size > 0 and np.max(img) > 0

    def test_detector_webcam_pose_demo_cli(self, workspace, monkeypatch, tmp_path):
        """The 2-stage detector->pose demo (reference
        test/aae_retina_webcam_pose.py role) driven hermetically OUT OF THE
        BOX: fake capture serves a rendered view on black background, the
        SHIPPED ForegroundContourDetector finds it, the estimator poses it,
        'q' quits."""
        import cv2

        from augmentedautoencoder_tpu import factory
        from augmentedautoencoder_tpu.cli import detector_webcam_pose

        test_cfg = tmp_path / "m3_demo.cfg"
        test_cfg.write_text(
            "[auto_pose]\n"
            "camPose = False\n"
            "upright = False\n"
            "topk = 1\n"
            "color_format = bgr\n"
            "color_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            "class_2_encoder = {'sphere': 'e2e_obj'}\n"
        )
        codebook, dataset = factory.build_codebook_from_name(
            "e2e_obj", return_dataset=True
        )
        cfg = dataset.cfg
        W, H = cfg.render_dims
        frame, _ = dataset.renderer.render(
            0, W, H, cfg.K, codebook.viewsphere[4],
            np.array([0.0, 0.0, cfg.radius]),
            cfg.clip_near, cfg.clip_far, random_light=False,
        )

        class FakeCap:
            def __init__(self, src):
                self.released = False

            def set(self, *a):
                pass

            def read(self):
                return True, frame.copy()

            def release(self):
                self.released = True

        caps, shown = {}, []
        monkeypatch.setattr(cv2, "VideoCapture",
                            lambda src: caps.setdefault("c", FakeCap(src)))
        monkeypatch.setattr(cv2, "imshow",
                            lambda name, img: shown.append(np.asarray(img)))
        keys = iter([255, ord("q"), ord("q"), ord("q")])
        monkeypatch.setattr(cv2, "waitKey", lambda ms: next(keys))
        run_cli(
            detector_webcam_pose,
            [str(test_cfg), "--detector",
             "augmentedautoencoder_tpu.pose.detectors:"
             'ForegroundContourDetector:{"class_name": "sphere", "thresh": 5}',
             "--camK", ",".join(str(v) for v in np.asarray(cfg.K).ravel())],
            monkeypatch,
        )
        assert caps["c"].released
        assert len(shown) == 2
        # the overlay frame differs from the raw render: green detection
        # rectangle + pose text were drawn
        assert not np.array_equal(shown[-1], frame)

    def test_resume_from_checkpoint(self, workspace, monkeypatch):
        from augmentedautoencoder_tpu.cli import ae_train

        # bump NUM_ITER and retrain: must resume from step 10, not restart
        cfg_path = os.path.join(workspace, "cfg", "e2e_obj.cfg")
        with open(cfg_path) as fh:
            text = fh.read()
        with open(cfg_path, "w") as fh:
            fh.write(text.replace("NUM_ITER: 10", "NUM_ITER: 14"))
        run_cli(ae_train, ["e2e_obj"], monkeypatch)
        from augmentedautoencoder_tpu.training import CheckpointManager

        mgr = CheckpointManager(os.path.join(workspace, "experiments", "e2e_obj", "checkpoints"))
        assert mgr.latest_step() == 14
        restored = mgr.restore()
        # codebook from the earlier ae_embed carried forward
        assert "embedding_normalized" in restored
