"""R_est/t_est parity against the REFERENCE's own Codebook.auto_pose6d at
FULL reference dims (128x128x3, filters [128,256,512,512], latent 128).

This is the BASELINE.md bit-compat target run end to end:
  * the reference-named TF1 graph at full size carries random weights and a
    codebook built by encoding view images through that TF graph
    (auto_pose/ae/codebook.py:190-219 semantics: encode -> numpy l2norm);
  * the reference's ACTUAL Codebook class (auto_pose/ae/codebook.py,
    imported from /root/reference with progressbar stubbed) answers
    auto_pose6d(session, crop, bb, K, ...) through a real TF session;
  * the SAME TF checkpoint is imported through tf_interop into the flax
    AAE and our Codebook answers auto_pose6d on identical crops;
  * assert: identical nearest-neighbor indices, R_est/t_est equal.

Skipped when tensorflow or the reference checkout is unavailable. Slow
(full-dims CPU convolutions) — the smaller-dims interop path is covered by
test_tf_parity.py.
"""

import configparser
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

tf_root = pytest.importorskip("tensorflow")
tf = tf_root.compat.v1

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "auto_pose")),
    reason="reference checkout not available",
)

H = W = 128
FILTERS = [128, 256, 512, 512]
STRIDES = [2, 2, 2, 2]
LATENT = 128
N_VIEWS = 42
NUM_CYCLO = 4
K_TEST = np.array([[1075.65, 0.0, 360.0], [0.0, 1073.90, 270.0], [0.0, 0.0, 1.0]])


def _load_reference_codebook_class():
    """Import auto_pose/ae/codebook.py without the package __init__ (which
    pulls heavy deps); stub progressbar which isn't in this image."""
    if "progressbar" not in sys.modules:
        pb = types.ModuleType("progressbar")
        pb.ProgressBar = lambda **kw: types.SimpleNamespace(
            start=lambda: None, update=lambda *a: None, finish=lambda: None
        )
        pb.widgets = types.SimpleNamespace()
        pb.Bar = lambda *a, **k: None
        pb.Percentage = lambda *a, **k: None
        pb.ETA = lambda *a, **k: None
        sys.modules["progressbar"] = pb

    pkg_dir = os.path.join(REF, "auto_pose", "ae")
    pkg_name = "_ref_ae"
    if pkg_name + ".codebook" in sys.modules:
        return sys.modules[pkg_name + ".codebook"].Codebook
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [pkg_dir]
    sys.modules[pkg_name] = pkg
    for sub in ("utils", "codebook"):
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.{sub}", os.path.join(pkg_dir, f"{sub}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = pkg_name
        sys.modules[f"{pkg_name}.{sub}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules[pkg_name + ".codebook"].Codebook


@pytest.fixture(scope="module")
def parity_setup(tmp_path_factory):
    from _tf_refgraph import build_reference_graph

    from augmentedautoencoder_tpu.geometry import view_sampler

    tf.disable_eager_execution()
    tmp = tmp_path_factory.mktemp("full_dims")
    rng = np.random.RandomState(42)

    viewsphere = view_sampler.viewsphere_rotations(N_VIEWS, NUM_CYCLO, radius=700.0)
    n_emb = len(viewsphere)

    # plausible rendered bboxes (xywh in the 720x540 render frame)
    bbs = np.stack(
        [
            rng.randint(200, 400, n_emb),
            rng.randint(120, 300, n_emb),
            rng.randint(80, 200, n_emb),
            rng.randint(80, 200, n_emb),
        ],
        axis=1,
    ).astype(np.int32)

    view_imgs = rng.rand(n_emb, H, W, 3).astype(np.float32)
    test_crops = (rng.rand(8, H, W, 3) * 255).astype(np.uint8)
    predicted_bbs = np.stack(
        [
            rng.randint(100, 500, 8),
            rng.randint(80, 350, 8),
            rng.randint(60, 250, 8),
            rng.randint(60, 250, 8),
        ],
        axis=1,
    ).astype(np.float64)

    RefCodebook = _load_reference_codebook_class()

    train_args = configparser.ConfigParser(inline_comment_prefixes=(";", "#"))
    train_args.read(os.path.join(REF, "auto_pose", "ae", "cfg", "train_template.cfg"))

    graph = tf.Graph()
    with graph.as_default():
        with tf.variable_scope("full_exp"):
            x_ph = tf.placeholder(tf.float32, [None, H, W, 3])
            z, recon = build_reference_graph(x_ph, FILTERS, STRIDES, LATENT, H, W)
            encoder = types.SimpleNamespace(x=x_ph, z=z, latent_space_size=LATENT)
            dataset = types.SimpleNamespace(
                embedding_size=n_emb,
                viewsphere_for_embedding=viewsphere,
                _kw={"num_cyclo": str(NUM_CYCLO)},
            )
            ref_cb = RefCodebook(encoder, dataset, embed_bb=True)
        saver = tf.train.Saver()
        sess = tf.Session(graph=graph)
        sess.run(tf.global_variables_initializer())

        # build the codebook the reference way: encode views, numpy-l2norm
        z_chunks = [
            sess.run(z, {x_ph: view_imgs[a : a + 16]})
            for a in range(0, n_emb, 16)
        ]
        emb = np.concatenate(z_chunks)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        sess.run(ref_cb.embedding_assign_op, {ref_cb.embedding: emb})
        sess.run(ref_cb.embed_obj_bbs_assign_op, {ref_cb.embed_obj_bbs: bbs})

        # reference answers, via the reference's own code paths
        ref = {"idx": [], "R": [], "t": [], "R_up": [], "z": None, "recon": None}
        for k in range(len(test_crops)):
            idcs = ref_cb.nearest_rotation(sess, test_crops[k], return_idcs=True)
            Rs, ts = ref_cb.auto_pose6d(
                sess, test_crops[k], predicted_bbs[k], K_TEST, 1, train_args
            )
            ref["idx"].append(int(idcs[0]))
            ref["R"].append(Rs[0])
            ref["t"].append(ts[0])
            R_up, _ = ref_cb.auto_pose6d(
                sess, test_crops[k], predicted_bbs[k], K_TEST, 1, train_args,
                upright=True,
            )
            ref["R_up"].append(R_up[0])
        ref["z"], ref["recon"] = sess.run(
            [z, recon], {x_ph: test_crops[:2] / 255.0}
        )
        ckpt_path = saver.save(sess, str(tmp / "chkpt"), global_step=1)
        sess.close()

    return {
        "ckpt": ckpt_path,
        "viewsphere": viewsphere,
        "bbs": bbs,
        "emb": emb,
        "crops": test_crops,
        "pred_bbs": predicted_bbs,
        "ref": ref,
    }


def _our_codebook(parity_setup):
    import jax
    import jax.numpy as jnp

    from augmentedautoencoder_tpu.codebook import Codebook
    from augmentedautoencoder_tpu.config import TrainConfig
    from augmentedautoencoder_tpu.models import AAE
    from augmentedautoencoder_tpu.training.tf_interop import (
        load_tf_checkpoint_variables,
        reference_params_to_flax,
    )

    tf_vars = load_tf_checkpoint_variables(parity_setup["ckpt"], scope="full_exp")
    payload = reference_params_to_flax(tf_vars, num_filters=tuple(FILTERS))

    cfg = TrainConfig(h=H, w=W, c=3, latent_space_size=LATENT)
    cfg.num_filter = FILTERS
    cfg.strides = STRIDES
    model = AAE.from_config(cfg)
    params = payload["params"]

    @jax.jit
    def encode(xb):
        return model.apply({"params": params}, xb, method="encode")

    cb = Codebook(
        encode,
        parity_setup["viewsphere"],
        payload["embedding_normalized"],
        payload["embed_obj_bbs"],
        num_cyclo=NUM_CYCLO,
    )
    return cb, cfg, model, params


class TestFullDimsParity:
    def test_forward_parity_full_dims(self, parity_setup):
        """VERDICT weak #4: layout/naming correctness at 128x128 /
        [128,256,512,512] where toy dims can't catch mistakes."""
        import jax.numpy as jnp

        from augmentedautoencoder_tpu.models import AAE  # noqa: F401

        cb, cfg, model, params = _our_codebook(parity_setup)
        x = jnp.asarray(parity_setup["crops"][:2] / 255.0, jnp.float32)
        out = model.apply({"params": params}, x, x)
        # full-dims f32 accumulation differences are larger than toy dims
        np.testing.assert_allclose(
            np.asarray(out.z), parity_setup["ref"]["z"], atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(out.reconstruction), parity_setup["ref"]["recon"], atol=5e-3
        )

    def test_nearest_rotation_indices_match(self, parity_setup):
        cb, *_ = _our_codebook(parity_setup)
        for k, crop in enumerate(parity_setup["crops"]):
            idx = cb.nearest_rotation(crop, return_idcs=True)
            assert int(idx[0]) == parity_setup["ref"]["idx"][k]

    def test_auto_pose6d_R_t_parity(self, parity_setup):
        """The BASELINE bit-compat target: identical crops -> identical
        R_est/t_est through both auto_pose6d implementations."""
        from augmentedautoencoder_tpu.config import TrainConfig

        cb, cfg, *_ = _our_codebook(parity_setup)
        # reference reads K/RADIUS from its own train_template.cfg; ours from
        # TrainConfig defaults — assert they agree first
        np.testing.assert_allclose(cfg.K, K_TEST)
        assert cfg.radius == 700.0
        for k, crop in enumerate(parity_setup["crops"]):
            Rs, ts = cb.auto_pose6d(
                crop, parity_setup["pred_bbs"][k], K_TEST, 1, cfg
            )
            np.testing.assert_allclose(
                Rs[0], parity_setup["ref"]["R"][k], rtol=0, atol=1e-9
            )
            np.testing.assert_allclose(
                ts[0], parity_setup["ref"]["t"][k], rtol=1e-12, atol=1e-9
            )

    def test_auto_pose6d_upright_parity(self, parity_setup):
        cb, cfg, *_ = _our_codebook(parity_setup)
        for k, crop in enumerate(parity_setup["crops"]):
            Rs, _ = cb.auto_pose6d(
                crop, parity_setup["pred_bbs"][k], K_TEST, 1, cfg, upright=True
            )
            np.testing.assert_allclose(
                Rs[0], parity_setup["ref"]["R_up"][k], rtol=0, atol=1e-9
            )
