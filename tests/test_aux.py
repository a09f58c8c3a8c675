"""Aux subsystem tests: metrics writer, occlusion masks, dsprites, reports."""

import json
import os

import numpy as np
import pytest

from augmentedautoencoder_tpu.data.occlusion_masks import (
    load_mask_bank,
    synthesize_mask_bank,
    workspace_mask_bank,
)
from augmentedautoencoder_tpu.training.metrics import MetricWriter


class TestMetricWriter:
    def test_jsonl_and_tensorboard(self, tmp_path):
        w = MetricWriter(str(tmp_path))
        w.write_scalars(10, {"loss": 0.5, "reg": 0.1})
        w.write_scalars(20, {"loss": 0.25})
        w.write_image(20, "grid", np.zeros((8, 8, 3), np.uint8))
        w.close()
        lines = open(tmp_path / "metrics.jsonl").read().strip().split("\n")
        assert len(lines) == 2
        rec = json.loads(lines[0])
        assert rec["step"] == 10 and rec["loss"] == 0.5
        # tensorboard event file written when tb is available
        assert any(n.startswith("events") for n in os.listdir(tmp_path))


class TestOcclusionMasks:
    def test_bitpacked_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        masks = rng.rand(3, 224, 224) > 0.5
        packed = np.packbits(masks.astype(np.uint8))
        path = tmp_path / "masks.bin"
        packed.tofile(path)
        loaded = load_mask_bank(str(path), (224, 224))
        assert loaded.shape == (3, 224, 224)
        np.testing.assert_array_equal(loaded, masks)

    def test_resize(self, tmp_path):
        masks = np.zeros((1, 224, 224), bool)
        masks[0, :112] = True
        np.packbits(masks.astype(np.uint8)).tofile(tmp_path / "m.bin")
        loaded = load_mask_bank(str(tmp_path / "m.bin"), (64, 64))
        assert loaded.shape == (1, 64, 64)
        assert loaded[0, :32].all() and not loaded[0, 32:].any()

    def test_workspace_lookup(self, tmp_path):
        assert workspace_mask_bank(str(tmp_path), (64, 64)) is None
        d = tmp_path / "random_tless_masks"
        d.mkdir()
        masks = np.ones((2, 224, 224), bool)
        np.packbits(masks.astype(np.uint8)).tofile(d / "arbitrary_syn_masks_1000.bin")
        loaded = workspace_mask_bank(str(tmp_path), (32, 32))
        assert loaded.shape == (2, 32, 32) and loaded.all()

    def test_synthesized_bank(self):
        masks = synthesize_mask_bank(5, (64, 64))
        assert masks.shape == (5, 64, 64)
        fracs = masks.mean(axis=(1, 2))
        assert (fracs > 0.005).all() and (fracs < 0.6).all()


class TestDsprites:
    def test_loader_on_synthetic_npz(self, tmp_path):
        from augmentedautoencoder_tpu.data.dsprites import load_dsprites_training_images

        # dsprites-format npz with the REAL latent grid (1,3,6,40,32,32) but
        # tiny 4x4 images; image value encodes its flat index for checking
        latents_sizes = np.array([1, 3, 6, 40, 32, 32])
        n = int(latents_sizes.prod())
        imgs = np.zeros((n, 4, 4), np.uint8)
        imgs[:, 0, 0] = np.arange(n) % 251  # fingerprint
        grids = np.meshgrid(*[np.arange(s) for s in latents_sizes], indexing="ij")
        latents_classes = np.stack([g.reshape(-1) for g in grids], axis=1)
        path = tmp_path / "dsprites.npz"
        np.savez(
            path, imgs=imgs, latents_classes=latents_classes,
            latents_values=latents_classes.astype(np.float32),
            metadata=np.array({"latents_sizes": latents_sizes}),
        )
        tx, ty = load_dsprites_training_images(str(path))
        assert tx.shape == (245760, 4, 4, 1) and ty.shape == tx.shape
        # x is the raw heart block (many distinct images); y pins everything
        # but orientation, so it draws from exactly 40 source images
        assert len(np.unique(tx[:, 0, 0, 0])) > 100
        assert len(np.unique(ty[:, 0, 0, 0])) <= 40

    def test_index_math(self):
        # latent_to_index is a mixed-radix ravel; verify on a known case
        latents_sizes = np.array([1, 3, 6, 40, 32, 32])
        bases = np.concatenate((latents_sizes[::-1].cumprod()[::-1][1:], [1]))
        idx = np.dot([0, 1, 5, 39, 31, 31], bases)
        assert idx == 1 * (6 * 40 * 32 * 32) + 5 * (40 * 32 * 32) + 39 * 32 * 32 + 31 * 32 + 31

    @pytest.mark.slow
    @pytest.mark.usefixtures("host_serial")
    def test_dsprites_cli_train_embed(self, tmp_path, monkeypatch):
        """MODEL: dsprites end to end through the REAL CLIs (reference
        ae_train.py:88-90 / ae_embed.py:84-85): train the orientation AE on
        a synthetic dsprites npz, then embed the 40-image orientation
        codebook into the checkpoint."""
        import sys

        # dsprites-format npz, real latent grid, tiny 8x8 binary images
        latents_sizes = np.array([1, 3, 6, 40, 32, 32])
        n = int(latents_sizes.prod())
        rng = np.random.RandomState(0)
        imgs = (rng.rand(n, 8, 8) > 0.7).astype(np.uint8)
        grids = np.meshgrid(*[np.arange(s) for s in latents_sizes], indexing="ij")
        latents_classes = np.stack([g.reshape(-1) for g in grids], axis=1)
        npz = tmp_path / "dsprites.npz"
        np.savez(
            npz, imgs=imgs, latents_classes=latents_classes,
            latents_values=latents_classes.astype(np.float32),
            metadata=np.array({"latents_sizes": latents_sizes}),
        )

        ws_path = str(tmp_path / "ws")
        monkeypatch.setenv("AE_WORKSPACE_PATH", ws_path)
        from augmentedautoencoder_tpu.cli import ae_embed, ae_init_workspace, ae_train

        def run(mod, argv):
            monkeypatch.setattr(sys, "argv", ["prog"] + argv)
            mod.main()

        run(ae_init_workspace, [])
        with open(os.path.join(ws_path, "cfg", "sprites.cfg"), "w") as fh:
            fh.write(f"""
[Paths]
MODEL_PATH: {npz}
BACKGROUND_IMAGES_GLOB:

[Dataset]
MODEL: dsprites
H: 8
W: 8
C: 1
RADIUS: 1
RENDER_DIMS: (8, 8)
K: [1, 0, 4, 0, 1, 4, 0, 0, 1]
VERTEX_SCALE: 1
ANTIALIASING: 1
PAD_FACTOR: 1.2
CLIP_NEAR: 10
CLIP_FAR: 10000
NOOF_TRAINING_IMGS: 64
NOOF_BG_IMGS: 1

[Augmentation]
CODE: Sequential([])

[Embedding]
EMBED_BB: False
MIN_N_VIEWS: 40
NUM_CYCLO: 1

[Network]
BATCH_NORMALIZATION: False
AUXILIARY_MASK: False
VARIATIONAL: 0
LOSS: L2
BOOTSTRAP_RATIO: 4
NORM_REGULARIZE: 0
LATENT_SPACE_SIZE: 8
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
""")
        run(ae_train, ["sprites"])
        run(ae_embed, ["sprites"])

        # embedded orientation codebook: 40 rows (train_y[::1024][40:80]),
        # unit-norm, saved inside the checkpoint dir
        from augmentedautoencoder_tpu.training.checkpoint import CheckpointManager

        ckpt_dir = os.path.join(
            ws_path, "experiments", "sprites", "checkpoints"
        )
        payload = CheckpointManager(ckpt_dir).restore()
        z = np.asarray(payload["embedding_normalized"])
        assert z.shape == (40, 8)
        np.testing.assert_allclose(np.linalg.norm(z, axis=1), 1.0, rtol=1e-5)


class TestReports:
    def test_latex_report(self, tmp_path):
        from augmentedautoencoder_tpu.evaluation.latex_report import generate_report

        eval_dir = str(tmp_path)
        with open(os.path.join(eval_dir, "scores.json"), "w") as fh:
            json.dump(
                {"vsd": {"recall": 0.8, "n_correct": 8, "n_gt": 10, "threshold": 0.3}},
                fh,
            )
        tex = generate_report(eval_dir, "test_exp", "A=1\nB=2", "C=3")
        content = open(tex).read()
        assert "0.8000" in content
        assert "\\begin{document}" in content and "test\\_exp" in content

    def test_comparative_report(self, tmp_path):
        from augmentedautoencoder_tpu.evaluation.comparative_report import (
            write_comparative_report,
        )

        for exp, recall in (("exp_a", 0.5), ("exp_b", 0.9)):
            d = tmp_path / "experiments" / "grp" / exp / "eval" / "ev1" / "tless"
            d.mkdir(parents=True)
            with open(d / "scores.json", "w") as fh:
                json.dump({"vsd": {"recall": recall, "n_correct": 1, "n_gt": 2}}, fh)
        tex = write_comparative_report(str(tmp_path), "grp", str(tmp_path / "out"))
        content = open(tex).read()
        assert "exp\\_a" in content and "0.9000" in content
        summary = json.load(open(tmp_path / "out" / "comparative_scores.json"))
        assert len(summary) == 2


class TestTikzExport:
    def test_hist_and_cumulative_tex(self, tmp_path):
        """pgfplots twins for the paper-export use case the reference served
        via matplotlib2tikz (eval_plots.py:303-431)."""
        import numpy as np

        from augmentedautoencoder_tpu.evaluation.tikz import (
            write_cumulative_tikz,
            write_hist_tikz,
        )

        errs = np.random.RandomState(0).rand(50) * 30
        p1 = write_hist_tikz(errs, "re", str(tmp_path))
        p2 = write_cumulative_tikz(errs, "re", str(tmp_path), threshold=15.0)
        t1 = open(p1).read()
        t2 = open(p2).read()
        assert "\\begin{tikzpicture}" in t1 and "ybar interval" in t1
        assert "recall" in t2 and "axis cs:15" in t2
        # balanced environments -> \input-able
        for t in (t1, t2):
            assert t.count("\\begin{axis}") == t.count("\\end{axis}") == 1

    def test_plot_functions_emit_tex_twin(self, tmp_path):
        import numpy as np

        from augmentedautoencoder_tpu.evaluation import plots

        errs = np.random.RandomState(1).rand(40) * 10
        plots.plot_error_hist(errs, "te", str(tmp_path))
        plots.plot_cumulative_error(errs, "te", str(tmp_path), threshold=5.0)
        assert (tmp_path / "error_hist_te.tex").exists()
        assert (tmp_path / "cumulative_te.tex").exists()


class TestAnalysisPlots:
    """Occlusion-binned boxplots, scene overlay, reconstruction grids
    (reference eval_plots.py:37-72, 210-265, 540-662)."""

    def test_animate_embedding_path_gif(self, tmp_path):
        """Working implementation of the reference's EMPTY animator stub
        (eval_plots.py:664-665): multi-frame GIF, one frame per test code,
        capped at max_frames."""
        from PIL import Image

        from augmentedautoencoder_tpu.evaluation import plots

        rng = np.random.RandomState(0)
        emb = rng.randn(200, 16)
        codes = rng.randn(12, 16)
        p = plots.animate_embedding_path(emb, codes, str(tmp_path))
        gif = Image.open(p)
        assert gif.n_frames == 12
        p2 = plots.animate_embedding_path(emb, codes, str(tmp_path), max_frames=5)
        assert Image.open(p2).n_frames == 5

    def test_animate_embedding_path_trajectory_visible_at_any_scale(self, tmp_path):
        """Regression: the axes must cover BOTH the backdrop and the
        trajectory — codes at 100x the backdrop's scale used to render
        entirely off-axes (FuncAnimation never rescales), producing a GIF
        that animated an empty backdrop."""
        from PIL import Image

        from augmentedautoencoder_tpu.evaluation import plots

        rng = np.random.RandomState(0)
        emb = rng.randn(200, 16)  # unit-ish backdrop cloud
        codes = 100.0 * rng.randn(8, 16)  # wildly out-of-scale trajectory
        p = plots.animate_embedding_path(emb, codes, str(tmp_path))
        gif = Image.open(p)
        gif.seek(gif.n_frames - 1)  # last frame: full path drawn
        arr = np.asarray(gif.convert("RGB"), np.int16)
        red = (arr[..., 0] > 150) & (arr[..., 1] < 100) & (arr[..., 2] < 100)
        assert red.sum() > 20, "red trajectory not visible in the frame"

    def test_error_vs_visibility_boxplots_and_tex(self, tmp_path):
        import numpy as np

        from augmentedautoencoder_tpu.evaluation import plots

        rng = np.random.RandomState(0)
        vis = rng.rand(80)
        errs = 30.0 * (1.0 - vis) + rng.rand(80) * 5  # worse when occluded
        p = plots.plot_error_vs_visibility(errs, vis, "vsd", str(tmp_path))
        assert p.endswith("vsd_occlusion.png") and (tmp_path / "vsd_occlusion.png").exists()
        tex = (tmp_path / "vsd_occlusion.tex").read_text()
        assert "boxplot prepared" in tex
        assert tex.count("\\begin{axis}") == tex.count("\\end{axis}") == 1
        # re rectification + reference file naming (R_err_occlusion)
        p2 = plots.plot_error_vs_visibility([175.0, 10.0], [0.2, 0.8], "re", str(tmp_path))
        assert p2.endswith("R_err_occlusion.png")
        assert (tmp_path / "R_err_occlusion.tex").exists()

    def test_visibility_bins_include_outer_edges(self, tmp_path):
        import re as _re

        import numpy as np

        from augmentedautoencoder_tpu.evaluation import plots

        # visib exactly 0.0 and 1.0 (common in real BOP gt_info) must land
        # in the first/last bin — counts sum to the estimate count
        rng = np.random.RandomState(1)
        vis = np.concatenate([[0.0, 1.0], rng.rand(48)])
        errs = np.concatenate([[3.0, 4.0], rng.rand(48)])
        plots.plot_error_vs_visibility(errs, vis, "vsd", str(tmp_path))
        tex = (tmp_path / "vsd_occlusion.tex").read_text()
        counts = eval(_re.search(r"bin counts (\[[0-9, ]*\])", tex).group(1))
        assert sum(counts) == 50

    def test_boxplot_tikz_whiskers_match_matplotlib(self, tmp_path):
        import numpy as np

        from augmentedautoencoder_tpu.evaluation.tikz import write_boxplot_tikz

        vals = np.concatenate([5 + np.arange(20) * 0.1, [80.0]])  # one flier
        write_boxplot_tikz([vals], [0.5], "flier_box", str(tmp_path))
        tex = (tmp_path / "flier_box.tex").read_text()
        # 1.5-IQR whiskers (matplotlib default), the outlier as a mark
        assert "upper whisker=80" not in tex
        assert "coordinates {(0,80)}" in tex

    def test_saved_figures_are_rgb(self, tmp_path):
        import matplotlib.image as mpimg
        import numpy as np

        from augmentedautoencoder_tpu.evaluation import plots

        # BGR-blue input (channel 0) must come out blue-dominant in the
        # written PNG (RGB channel 2) for both writers
        x = np.zeros((16, 8, 8, 3), np.float32)
        x[..., 0] = 1.0
        p = plots.plot_reconstruction_grid(x, x, str(tmp_path))
        px = mpimg.imread(p)[1, 1]
        assert px[2] > px[0]

        scene = np.zeros((32, 32, 3), np.uint8)
        scene[..., 0] = 200
        out = str(tmp_path / "ov.png")
        plots.plot_scene_with_estimate(
            scene, np.zeros_like(scene, np.float32), [2, 2, 8, 8], 0.5, 1, out
        )
        img = mpimg.imread(out)
        h, w = img.shape[:2]
        c = img[h // 2, w // 2]
        assert c[2] > c[0]

    def test_error_vs_visibility_with_empty_bins(self, tmp_path):
        from augmentedautoencoder_tpu.evaluation import plots

        # all visibility mass in one bin: 9 empty bins must not crash and
        # the tex twin must still be balanced
        p = plots.plot_error_vs_visibility(
            [1.0, 2.0, 3.0], [0.91, 0.95, 0.99], "vsd", str(tmp_path)
        )
        assert (tmp_path / "vsd_occlusion.tex").exists()
        tex = (tmp_path / "vsd_occlusion.tex").read_text()
        assert tex.count("boxplot prepared") == 1  # one non-empty bin

    def test_scene_overlay_raw_and_refined(self, tmp_path):
        import numpy as np

        from augmentedautoencoder_tpu.evaluation import plots

        scene = np.full((40, 60, 3), 50, np.uint8)
        obj = np.zeros((40, 60, 3), np.float32)
        obj[10:20, 20:35] = 200.0
        out = str(tmp_path / "scene_with_estimate.png")
        p = plots.plot_scene_with_estimate(
            scene, obj, bbox=[18, 8, 20, 14], score=0.87, obj_id=5,
            out_path=out, refined_render=obj,
        )
        assert p == out and (tmp_path / "scene_with_estimate.png").exists()

    def test_reconstruction_and_nn_grids(self, tmp_path):
        import numpy as np

        from augmentedautoencoder_tpu.evaluation import plots

        rng = np.random.RandomState(3)
        x = rng.randint(0, 255, (16, 16, 16, 3)).astype(np.float32)  # uint8 scale
        recon = rng.rand(16, 16, 16, 3).astype(np.float32)
        p = plots.plot_reconstruction_grid(x, recon, str(tmp_path))
        assert (tmp_path / "reconstruction_imgs.png").exists()
        # grid is two 4x4 tiles side by side
        import matplotlib.image as mpimg

        img = mpimg.imread(p)
        assert img.shape[1] == 2 * img.shape[0]

        rows = [[rng.rand(16, 16, 3) for _ in range(9)] for _ in range(4)]
        plots.plot_nearest_neighbors(rows, str(tmp_path))
        assert (tmp_path / "nearest_neighbors.png").exists()

    def test_scene_with_3d_boxes(self, tmp_path):
        import numpy as np

        from augmentedautoencoder_tpu.evaluation import plots

        scene = np.zeros((68, 90, 3), np.uint8)
        K = np.array([[100.0, 0, 45], [0, 100.0, 34], [0, 0, 1]])
        pose = (np.eye(3), np.array([0.0, 0.0, 300.0]))
        out = str(tmp_path / "scene_boxes.png")
        p = plots.plot_scene_with_3d_boxes(
            scene, K, [-30, -30, -30], [30, 30, 30], [pose], out,
            gt_poses=[pose],
        )
        assert p == out and (tmp_path / "scene_boxes.png").exists()
        import matplotlib.image as mpimg

        img = mpimg.imread(out)
        assert img[..., 1].max() > 0.5  # green estimate edges drawn


class TestTiles4:
    def test_rgbd_grid_layout(self):
        import numpy as np

        from augmentedautoencoder_tpu.utils.misc import tiles4

        rng = np.random.RandomState(0)
        batch = rng.rand(3, 8, 8, 4)
        grid = tiles4(batch, rows=2, cols=2, spacing_x=2, spacing_y=2)
        # 2 rows of cells -> 4 image rows; 2 cols
        assert grid.shape == (4 * 8 + 3 * 2, 2 * 8 + 1 * 2, 3)
        # cell (0,0): rgb of sample 0 on top, its depth (replicated) below
        np.testing.assert_allclose(grid[:8, :8], batch[0, :, :, :3])
        np.testing.assert_allclose(
            grid[10:18, :8], np.repeat(batch[0, :, :, 3:4], 3, axis=2)
        )
        # unused 4th cell stays ones background
        np.testing.assert_allclose(grid[20:, 10:], 1.0)

    def test_rejects_non_rgbd(self):
        import numpy as np
        import pytest

        from augmentedautoencoder_tpu.utils.misc import tiles4

        with pytest.raises(ValueError, match="N, H, W, 4"):
            tiles4(np.zeros((2, 8, 8, 3)), 1, 2)


class TestExperimentGroups:
    """Reference CLI surface uses `exp_group/experiment` names everywhere
    (reference README.md:118-139, auto_pose/ae/utils.py:28-90); the grouped
    form must resolve cfg + log-dir paths and drive ae_train end to end."""

    def test_split_experiment_name(self):
        from augmentedautoencoder_tpu.cli import split_experiment_name

        assert split_experiment_name("my_obj") == ("my_obj", "")
        assert split_experiment_name("exp_group/my_obj") == ("my_obj", "exp_group")
        # deeper nesting keeps the innermost group (reference behavior:
        # only one group level is meaningful)
        assert split_experiment_name("a/b/c") == ("c", "b")

    def test_grouped_paths(self, tmp_path, monkeypatch):
        from augmentedautoencoder_tpu import workspace

        ws = str(tmp_path / "ws")
        monkeypatch.setenv("AE_WORKSPACE_PATH", ws)
        workspace.init_workspace(ws)
        cfgp = workspace.get_config_file_path(ws, "obj1", "tless")
        assert cfgp == os.path.join(ws, "cfg", "tless", "obj1.cfg")
        logd = workspace.get_log_dir(ws, "obj1", "tless")
        assert logd == os.path.join(ws, "experiments", "tless", "obj1")

    def test_grouped_ae_train_gen(self, tmp_path, monkeypatch):
        """Drive `ae_train exp_group/obj -gen` through the real CLI."""
        import sys
        import textwrap

        import cv2

        from augmentedautoencoder_tpu import workspace
        from augmentedautoencoder_tpu.cli import ae_train
        from augmentedautoencoder_tpu.renderer.procedural import (
            make_textured_asymmetric,
            save_ply,
        )

        ws = str(tmp_path / "ws")
        monkeypatch.setenv("AE_WORKSPACE_PATH", ws)
        workspace.init_workspace(ws)
        model_path = str(tmp_path / "obj.ply")
        save_ply(make_textured_asymmetric(subdivisions=1, radius=60.0), model_path)
        bg_dir = tmp_path / "bg"
        bg_dir.mkdir()
        rng = np.random.RandomState(0)
        for i in range(2):
            cv2.imwrite(
                str(bg_dir / f"bg_{i}.jpg"),
                rng.randint(0, 255, (32, 48, 3), np.uint8),
            )
        cfg = textwrap.dedent(
            f"""
            [Paths]
            MODEL_PATH: {model_path}
            BACKGROUND_IMAGES_GLOB: {bg_dir}/*.jpg

            [Dataset]
            MODEL: reconst
            H: 16
            W: 16
            C: 3
            RADIUS: 300
            RENDER_DIMS: (60, 45)
            K: [70, 0, 30, 0, 70, 22, 0, 0, 1]
            VERTEX_SCALE: 1
            ANTIALIASING: 1
            PAD_FACTOR: 1.2
            CLIP_NEAR: 10
            CLIP_FAR: 10000
            NOOF_TRAINING_IMGS: 4
            NOOF_BG_IMGS: 2

            [Augmentation]
            REALISTIC_OCCLUSION: False
            SQUARE_OCCLUSION: False
            MAX_REL_OFFSET: 0.2
            CODE: Sequential([], random_order=False)

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
            LATENT_SPACE_SIZE: 8
            NUM_FILTER: [4, 8]
            STRIDES: [2, 2]
            KERNEL_SIZE_ENCODER: 3
            KERNEL_SIZE_DECODER: 3

            [Training]
            OPTIMIZER: Adam
            NUM_ITER: 2
            BATCH_SIZE: 4
            LEARNING_RATE: 1e-3
            SAVE_INTERVAL: 2

            [Queue]
            NUM_THREADS: 1
            QUEUE_SIZE: 2
            """
        )
        cfg_dir = os.path.join(ws, "cfg", "exp_group")
        os.makedirs(cfg_dir)
        with open(os.path.join(cfg_dir, "tiny.cfg"), "w") as fh:
            fh.write(cfg)

        monkeypatch.setattr(sys, "argv", ["prog", "exp_group/tiny", "-gen"])
        ae_train.main()

        log_dir = os.path.join(ws, "experiments", "exp_group", "tiny")
        assert os.path.exists(os.path.join(log_dir, "tiny.cfg"))
        # the render cache lands under tmp_datasets keyed by cfg md5
        assert os.listdir(os.path.join(ws, "tmp_datasets"))


class TestBenchErrorLine:
    def test_wedged_backend_prints_one_honest_json_line(self, monkeypatch, capsys):
        """bench.py must never hang the driver: with the backend probe
        failing (wedged TPU tunnel), it prints exactly one JSON line with
        value 0, an explanatory error, and the newest recorded BENCH_r*
        figure (so the artifact still carries the last known-good rate)."""
        import bench

        monkeypatch.setattr(bench, "_backend_usable", lambda *a, **k: False)
        bench.main()
        lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        assert len(lines) == 1
        rec = json.loads(lines[0])
        assert rec["value"] == 0.0
        assert "error" in rec and "not a perf regression" in rec["error"]
        # the repo ships BENCH_r01/r02 with real figures -> last_good present
        assert rec["last_good"]["value"] > 0
        assert rec["last_good"]["round"].startswith("BENCH_r")

    def test_last_recorded_sorts_by_round_number_not_lexicographically(
        self, tmp_path
    ):
        """BENCH_r9 must not beat BENCH_r10 (nor r99 beat r100): the
        last_good figure must come from the numerically newest round."""
        import bench

        for rnd, val in [("r9", 111.0), ("r10", 222.0), ("r100", 333.0)]:
            (tmp_path / f"BENCH_{rnd}.json").write_text(
                json.dumps({"parsed": {"value": val, "unit": "crops/s"}})
            )
        rec = bench._last_recorded(str(tmp_path))
        assert rec == {"round": "BENCH_r100.json", "value": 333.0}
        # zero-value rounds (wedged-tunnel error lines) are skipped
        (tmp_path / "BENCH_r101.json").write_text(
            json.dumps({"parsed": {"value": 0.0, "error": "wedged"}})
        )
        assert bench._last_recorded(str(tmp_path))["value"] == 333.0
