"""Numerical parity against the reference TF1 architecture.

Builds the reference's exact encoder/decoder graph with tf.compat.v1
(tf.layers conv/dense auto-naming, SAME padding, NN-upsampling — mirroring
auto_pose/ae/encoder.py:38-68 / decoder.py:36-84), runs it on random input,
then ports the TF variables into this build's Flax AAE via tf_interop and
asserts the latent codes and reconstructions agree to float tolerance.

This validates (a) architecture parity and (b) that the reference's
published pretrained checkpoints can be imported and evaluated natively.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow").compat.v1

from augmentedautoencoder_tpu.training.tf_interop import (
    load_tf_checkpoint_variables,
    reference_params_to_flax,
)

H = W = 32
LATENT = 8
FILTERS = [8, 16]
STRIDES = [2, 2]
KERNEL = 5


# tf.layers is gone under Keras 3; _tf_refgraph rebuilds the same graph with
# raw tf.nn ops and tf.layers' VARIABLE NAMES ('conv2d/kernel', 'dense/...')
# — which is exactly what reference checkpoints contain.
from _tf_refgraph import build_reference_graph as _build_ref_graph


def build_reference_graph(x):
    """The reference encoder+decoder graph shape (encoder.py:38-68,
    decoder.py:36-84), small dims."""
    return _build_ref_graph(x, FILTERS, STRIDES, LATENT, H, W, kernel=KERNEL)


@pytest.fixture(scope="module")
def tf_run(tmp_path_factory):
    tf.disable_eager_execution()
    tmp = tmp_path_factory.mktemp("tfckpt")
    rng = np.random.RandomState(0)
    x_val = rng.rand(4, H, W, 3).astype(np.float32)

    graph = tf.Graph()
    with graph.as_default():
        with tf.variable_scope("my_exp"):
            x = tf.placeholder(tf.float32, [None, H, W, 3])
            z, recon = build_reference_graph(x)
            # codebook-in-checkpoint like the reference (codebook.py:27-48)
            emb = tf.Variable(
                rng.rand(50, LATENT).astype(np.float32),
                trainable=False, name="embedding_normalized",
            )
            bbs = tf.Variable(
                rng.randint(0, 100, (50, 4)).astype(np.int32),
                trainable=False, name="embed_obj_bbs_var",
            )
        saver = tf.train.Saver()
        with tf.Session(graph=graph) as sess:
            sess.run(tf.global_variables_initializer())
            z_val, recon_val = sess.run([z, recon], {x: x_val})
            ckpt_path = saver.save(sess, str(tmp / "chkpt"), global_step=77)
    return {
        "ckpt": ckpt_path, "x": x_val, "z": z_val, "recon": recon_val,
        "emb": None, "bbs": None,
    }


class TestTFInterop:
    def test_variable_loading_and_scope_strip(self, tf_run):
        tf_vars = load_tf_checkpoint_variables(tf_run["ckpt"], scope="my_exp")
        assert "conv2d/kernel" in tf_vars
        assert "embedding_normalized" in tf_vars
        assert tf_vars["conv2d/kernel"].shape == (KERNEL, KERNEL, 3, FILTERS[0])

    def test_forward_parity(self, tf_run):
        import jax.numpy as jnp

        from augmentedautoencoder_tpu.config import TrainConfig
        from augmentedautoencoder_tpu.models import AAE

        tf_vars = load_tf_checkpoint_variables(tf_run["ckpt"], scope="my_exp")
        payload = reference_params_to_flax(tf_vars, num_filters=tuple(FILTERS))

        cfg = TrainConfig(h=H, w=W, c=3, latent_space_size=LATENT)
        cfg.num_filter = FILTERS
        cfg.strides = STRIDES
        model = AAE.from_config(cfg)

        x = jnp.asarray(tf_run["x"])
        out = model.apply({"params": payload["params"]}, x, x)
        np.testing.assert_allclose(np.asarray(out.z), tf_run["z"], atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out.reconstruction), tf_run["recon"], atol=2e-4
        )

    def test_codebook_import(self, tf_run):
        tf_vars = load_tf_checkpoint_variables(tf_run["ckpt"], scope="my_exp")
        payload = reference_params_to_flax(tf_vars, num_filters=tuple(FILTERS))
        assert payload["embedding_normalized"].shape == (50, LATENT)
        assert payload["embed_obj_bbs"].shape == (50, 4)

    def test_import_cli_full_flow(self, tf_run, tmp_path, monkeypatch):
        """ae_import_tf -> build_codebook_from_name -> nearest_rotation with
        the TF graph's weights and codebook."""
        import sys
        import textwrap

        import jax.numpy as jnp

        from augmentedautoencoder_tpu.cli import ae_import_tf

        ws_path = str(tmp_path / "ws")
        monkeypatch.setenv("AE_WORKSPACE_PATH", ws_path)
        from augmentedautoencoder_tpu import workspace as wsmod

        wsmod.init_workspace(ws_path)

        cfg_path = tmp_path / "imported.cfg"
        cfg_path.write_text(textwrap.dedent(f"""
            [Paths]
            MODEL_PATH: /nonexistent.ply
            BACKGROUND_IMAGES_GLOB: /nonexistent/*.jpg
            [Dataset]
            MODEL: reconst
            H: {H}
            W: {W}
            C: 3
            RADIUS: 700
            [Embedding]
            EMBED_BB: True
            MIN_N_VIEWS: 12
            NUM_CYCLO: 4
            [Network]
            LATENT_SPACE_SIZE: {LATENT}
            NUM_FILTER: {FILTERS}
            STRIDES: {STRIDES}
            """))

        monkeypatch.setattr(
            sys, "argv",
            ["prog", tf_run["ckpt"], "imported_exp", "--cfg", str(cfg_path),
             "--scope", "my_exp"],
        )
        ae_import_tf.main()

        from augmentedautoencoder_tpu import factory

        codebook = factory.build_codebook_from_name("imported_exp")
        # the imported 50-row embedding answers queries; R comes from the
        # 12x4 viewsphere (50 > 48 rows: imported codebooks may be any size
        # — index into viewsphere is only valid for matching sizes, so use
        # return_idcs here)
        x = np.asarray(tf_run["x"][0])
        idx = codebook.nearest_rotation(x, return_idcs=True)
        assert 0 <= int(idx[0]) < 50
        # the query's latent must equal the TF graph's z for the same input
        z = codebook.test_embedding(x, normalized=False)
        np.testing.assert_allclose(z, tf_run["z"][0], atol=2e-4)

    def test_import_to_orbax_checkpoint(self, tf_run, tmp_path):
        from augmentedautoencoder_tpu.training.tf_interop import (
            import_reference_checkpoint,
        )
        from augmentedautoencoder_tpu.training.checkpoint import CheckpointManager

        import_reference_checkpoint(
            tf_run["ckpt"], "my_exp", str(tmp_path / "ckpts"), step=77,
            num_filters=tuple(FILTERS),
        )
        mgr = CheckpointManager(str(tmp_path / "ckpts"))
        restored = mgr.restore()
        assert int(restored["step"]) == 77
        assert "embedding_normalized" in restored
        assert "encoder" in restored["params"]


class TestVariationalSplit:
    """The VAE reference encoder creates dense (z) + dense_1 (q_sigma) before
    the decoder's dense_2; the sigma head shares the latent kernel shape
    (auto_pose/ae/encoder.py:70-78). Pure-dict test, no TF graph needed."""

    def _vars(self, with_sigma):
        rng = np.random.RandomState(0)
        v = {
            "conv2d/kernel": rng.randn(5, 5, 3, 8).astype(np.float32),
            "conv2d/bias": np.zeros(8, np.float32),
            "conv2d_1/kernel": rng.randn(5, 5, 8, 16).astype(np.float32),
            "conv2d_1/bias": np.zeros(16, np.float32),
            "dense/kernel": rng.randn(1024, 8).astype(np.float32),
            "dense/bias": np.zeros(8, np.float32),
        }
        k = 1
        if with_sigma:
            v["dense_1/kernel"] = np.zeros((1024, 8), np.float32)
            v["dense_1/bias"] = np.zeros(8, np.float32)
            k = 2
        v[f"dense_{k}/kernel"] = rng.randn(8, 1024).astype(np.float32)
        v[f"dense_{k}/bias"] = np.zeros(1024, np.float32)
        v["conv2d_2/kernel"] = rng.randn(5, 5, 16, 8).astype(np.float32)
        v["conv2d_2/bias"] = np.zeros(8, np.float32)
        v["conv2d_3/kernel"] = rng.randn(5, 5, 8, 3).astype(np.float32)
        v["conv2d_3/bias"] = np.zeros(3, np.float32)
        return v

    def test_sigma_head_detected_and_decoder_dense_correct(self):
        from augmentedautoencoder_tpu.training.tf_interop import (
            split_reference_variables,
        )

        g = split_reference_variables(self._vars(True), 2, 2, variational=True)
        assert g["latent_sigma"] is not None
        assert g["latent_sigma"]["kernel"].shape == (1024, 8)
        assert g["decoder_dense"]["kernel"].shape == (8, 1024)  # NOT the sigma

    def test_vae_checkpoint_without_flag_raises(self):
        from augmentedautoencoder_tpu.training.tf_interop import (
            split_reference_variables,
        )

        with pytest.raises(ValueError, match="variational"):
            split_reference_variables(self._vars(True), 2, 2)

    def test_flag_without_sigma_raises(self):
        from augmentedautoencoder_tpu.training.tf_interop import (
            split_reference_variables,
        )

        with pytest.raises(ValueError, match="q_sigma"):
            split_reference_variables(self._vars(False), 2, 2, variational=True)

    def test_non_vae_unchanged(self):
        from augmentedautoencoder_tpu.training.tf_interop import (
            split_reference_variables,
        )

        g = split_reference_variables(self._vars(False), 2, 2)
        assert g["latent_sigma"] is None
        assert g["decoder_dense"]["kernel"].shape == (8, 1024)


@pytest.mark.e2e
class TestRealDataRunbook:
    """The README 'Real-data runbook' chain, smoke-tested on synthetic
    BOP-layout fixtures: reference TF checkpoint -> ae_import_tf ->
    ae_eval -> compute_bop_results CSV. Keeps the parity path warm so the
    day real T-LESS/BOP assets appear, the run is one command block."""

    def test_import_eval_bop_chain(self, tmp_path, monkeypatch):
        import json
        import os
        import sys
        import textwrap

        import cv2

        # ---- reference-style TF checkpoint with a 48-row codebook
        # (12 views x 4 cyclo so codebook indices map onto the viewsphere)
        tf.disable_eager_execution()
        rng = np.random.RandomState(0)
        graph = tf.Graph()
        with graph.as_default():
            with tf.variable_scope("obj5"):
                x = tf.placeholder(tf.float32, [None, H, W, 3])
                z, recon = build_reference_graph(x)
                emb_np = rng.rand(48, LATENT).astype(np.float32)
                emb_np /= np.linalg.norm(emb_np, axis=1, keepdims=True)
                tf.Variable(emb_np, trainable=False, name="embedding_normalized")
                tf.Variable(
                    np.tile(np.array([10, 8, 40, 44], np.int32), (48, 1)),
                    trainable=False, name="embed_obj_bbs_var",
                )
            saver = tf.train.Saver()
            with tf.Session(graph=graph) as sess:
                sess.run(tf.global_variables_initializer())
                ckpt = saver.save(sess, str(tmp_path / "tf" / "chkpt"),
                                  global_step=30000)

        # ---- workspace + import
        ws_path = str(tmp_path / "ws")
        monkeypatch.setenv("AE_WORKSPACE_PATH", ws_path)
        from augmentedautoencoder_tpu import workspace as wsmod
        from augmentedautoencoder_tpu.cli import ae_import_tf

        wsmod.init_workspace(ws_path)
        cfg_path = tmp_path / "obj5_train.cfg"
        cfg_path.write_text(textwrap.dedent(f"""
            [Paths]
            MODEL_PATH: /nonexistent.ply
            BACKGROUND_IMAGES_GLOB: /nonexistent/*.jpg
            [Dataset]
            MODEL: reconst
            H: {H}
            W: {W}
            C: 3
            RADIUS: 700
            PAD_FACTOR: 1.2
            [Embedding]
            EMBED_BB: True
            MIN_N_VIEWS: 12
            NUM_CYCLO: 4
            [Network]
            LATENT_SPACE_SIZE: {LATENT}
            NUM_FILTER: {FILTERS}
            STRIDES: {STRIDES}
            """))

        def run(module, argv):
            monkeypatch.setattr(sys, "argv", ["prog"] + argv)
            module.main()

        run(ae_import_tf,
            [ckpt, "tless_obj5", "--cfg", str(cfg_path), "--scope", "obj5"])

        # ---- synthetic BOP-layout scene (rgb + gt + gt_info + camera)
        bop = tmp_path / "bop"
        scene_dir = bop / "test" / "000001"
        (scene_dir / "rgb").mkdir(parents=True)
        Kc = np.array([[120.0, 0, 32], [0, 120.0, 32], [0, 0, 1]])
        gt, gt_info, cam = {}, {}, {}
        for im in range(2):
            cv2.imwrite(str(scene_dir / "rgb" / f"{im:06d}.png"),
                        rng.randint(0, 255, (64, 64, 3), np.uint8))
            R = np.eye(3)
            gt[str(im)] = [{"obj_id": 5, "cam_R_m2c": R.ravel().tolist(),
                            "cam_t_m2c": [0.0, 0.0, 700.0]}]
            gt_info[str(im)] = [{"bbox_obj": [16, 16, 30, 30],
                                 "bbox_visib": [16, 16, 30, 30],
                                 "visib_fract": 0.9}]
            cam[str(im)] = {"cam_K": Kc.ravel().tolist(), "depth_scale": 1.0}
        (scene_dir / "scene_gt.json").write_text(json.dumps(gt))
        (scene_dir / "scene_gt_info.json").write_text(json.dumps(gt_info))
        (scene_dir / "scene_camera.json").write_text(json.dumps(cam))

        # ---- ae_eval (rgb-only metrics; no mesh/renderer needed)
        from augmentedautoencoder_tpu.cli import ae_eval

        (tmp_path / "ws" / "cfg_eval" / "eval.cfg").write_text(textwrap.dedent(f"""
            [METHOD]
            METHOD: aae
            [DATA]
            DATASET: synthbop
            DATASET_PATH: {bop}
            OBJ_ID: 5
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
            ERROR_TYPES: ['re', 'te']
            ERROR_THRESH_DEG: 180
            ERROR_THRESH_MM: 1000000
            TOP_N_EVAL: 1
            TOP_N: 1
            [PLOT]
            COMPUTE_PLOTS: True
            """))
        run(ae_eval, ["tless_obj5", "bop_parity"])
        eval_dir = os.path.join(ws_path, "experiments", "tless_obj5", "eval",
                                "bop_parity", "synthbop")
        assert os.path.exists(os.path.join(eval_dir, "results.json"))
        assert os.path.exists(os.path.join(eval_dir, "scores.json"))
        with open(os.path.join(eval_dir, "results.json")) as fh:
            results = json.load(fh)
        assert len(results) == 2  # one estimate per image, plumbing-complete

        # ---- BOP19 CSV across targets
        from augmentedautoencoder_tpu.cli import compute_bop_results

        (bop / "test_targets_bop19.json").write_text(json.dumps(
            [{"scene_id": 1, "im_id": 0, "obj_id": 5, "inst_count": 1},
             {"scene_id": 1, "im_id": 1, "obj_id": 5, "inst_count": 1}]
        ))
        m3_cfg = tmp_path / "m3_tless.cfg"
        m3_cfg.write_text(
            "[auto_pose]\n"
            "camPose = False\nupright = False\ntopk = 1\n"
            "color_format = bgr\ncolor_data_type = np.uint8\n"
            "depth_data_type = np.float32\n"
            "class_2_encoder = {5: 'tless_obj5'}\n"
        )
        out_dir = tmp_path / "bop_out"
        out_dir.mkdir()
        run(compute_bop_results,
            [str(m3_cfg), "--dataset_path", str(bop), "--dataset_name",
             "tless", "--out_dir", str(out_dir), "--method", "aae-tpu"])
        csvs = list(out_dir.glob("*.csv"))
        assert len(csvs) == 1
        lines = csvs[0].read_text().strip().splitlines()
        assert lines[0].startswith("scene_id,im_id,obj_id,score,R,t,time")
        assert len(lines) == 3  # header + 2 estimates
        # every row carries a 9-number R and 3-number t in mm
        for row in lines[1:]:
            cells = row.split(",")
            assert len(cells[4].split()) == 9
            assert len(cells[5].split()) == 3
