"""Config parser tests: reference grammar coverage, safe_eval whitelisting."""

import textwrap

import numpy as np
import pytest

from augmentedautoencoder_tpu.config import load_train_config, safe_eval
from augmentedautoencoder_tpu.config.safe_eval import UnsafeExpressionError
from augmentedautoencoder_tpu.data import augment_spec as A

REFERENCE_TEMPLATE = textwrap.dedent(
    """
    [Paths]
    MODEL_PATH: /path/to/my_3d_model.ply
    BACKGROUND_IMAGES_GLOB: /path/to/VOC/JPEGImages/*.jpg

    [Dataset]
    MODEL: reconst
    H: 128
    W: 128
    C: 3
    RADIUS: 700
    RENDER_DIMS: (720, 540)
    K: [1075.65, 0, 720/2, 0, 1073.90, 540/2, 0, 0, 1]
    VERTEX_SCALE: 1
    ANTIALIASING: 1
    PAD_FACTOR: 1.2
    CLIP_NEAR: 10
    CLIP_FAR: 10000
    NOOF_TRAINING_IMGS: 20000
    NOOF_BG_IMGS: 15000

    [Augmentation]
    REALISTIC_OCCLUSION: False
    SQUARE_OCCLUSION: False
    MAX_REL_OFFSET: 0.20
    CODE: Sequential([
        Sometimes(0.5, Affine(scale=(1.0, 1.2))),
        Sometimes(0.5, CoarseDropout( p=0.2, size_percent=0.05) ),
        Sometimes(0.5, GaussianBlur(1.2*np.random.rand())),
        Sometimes(0.5, Add((-25, 25), per_channel=0.3)),
        Sometimes(0.3, Invert(0.2, per_channel=True)),
        Sometimes(0.5, Multiply((0.6, 1.4), per_channel=0.5)),
        Sometimes(0.5, Multiply((0.6, 1.4))),
        Sometimes(0.5, ContrastNormalization((0.5, 2.2), per_channel=0.3))
        ], random_order=False)

    [Embedding]
    EMBED_BB: True
    MIN_N_VIEWS: 2562
    NUM_CYCLO: 36

    [Network]
    BATCH_NORMALIZATION: False
    AUXILIARY_MASK: False
    VARIATIONAL: 0
    LOSS: L2
    BOOTSTRAP_RATIO: 4
    NORM_REGULARIZE: 0
    LATENT_SPACE_SIZE: 128
    NUM_FILTER: [128, 256, 512, 512]
    STRIDES: [2, 2, 2, 2]
    KERNEL_SIZE_ENCODER: 5
    KERNEL_SIZE_DECODER: 5

    [Training]
    OPTIMIZER: Adam
    NUM_ITER: 30000
    BATCH_SIZE: 64
    LEARNING_RATE: 2e-4
    SAVE_INTERVAL: 10000

    [Queue]
    NUM_THREADS: 10
    QUEUE_SIZE: 50
    """
)


@pytest.fixture
def cfg_file(tmp_path):
    p = tmp_path / "exp.cfg"
    p.write_text(REFERENCE_TEMPLATE)
    return str(p)


class TestSafeEval:
    def test_literals(self):
        assert safe_eval("[2, 2, 2, 2]") == [2, 2, 2, 2]
        assert safe_eval("(720, 540)") == (720, 540)
        assert safe_eval("True") is True
        assert safe_eval("2e-4") == 2e-4

    def test_arithmetic(self):
        k = safe_eval("[1075.65, 0, 720/2, 0, 1073.90, 540/2, 0, 0, 1]")
        assert k[2] == 360.0 and k[5] == 270.0

    def test_rejects_dunder_and_imports(self):
        for bad in (
            "__import__('os')",
            "().__class__",
            "open('/etc/passwd')",
            "exec('x=1')",
            "[x for x in range(3)]",
        ):
            with pytest.raises(UnsafeExpressionError):
                safe_eval(bad)

    def test_np_random_rand_quirk(self):
        v = safe_eval("1.2*np.random.rand()")
        assert 0.0 <= v <= 1.2

    def test_randomized_equivalence_with_python_eval(self):
        """Property check over the cfg grammar: for 200 generated
        deterministic expressions (numbers, lists/tuples, nesting, the
        arithmetic the reference cfgs use), safe_eval == eval. Guards the
        AST whitelist against silently diverging from the reference's
        semantics as it grows."""
        rng = np.random.RandomState(7)

        def gen_number():
            choice = rng.randint(4)
            if choice == 0:
                return str(rng.randint(-1000, 1000))
            if choice == 1:
                return f"{rng.uniform(-50, 50):.4f}"
            if choice == 2:
                return f"{rng.uniform(1e-6, 1.0):.2e}"
            return f"{rng.randint(1, 2000)}/{rng.randint(1, 9)}"

        def gen_expr(depth=0):
            choice = rng.randint(5 if depth < 2 else 2)
            if choice == 0:
                return gen_number()
            if choice == 1:
                op = rng.choice(["+", "-", "*"])
                return f"({gen_number()} {op} {gen_number()})"
            items = ", ".join(gen_expr(depth + 1) for _ in range(rng.randint(1, 5)))
            if choice == 2:
                return f"[{items}]"
            if choice == 3:
                return f"({items},)"
            return f"-{gen_number()}"

        for _ in range(200):
            expr = gen_expr()
            assert safe_eval(expr) == eval(expr), expr  # noqa: S307 (trusted gen)


class TestTrainConfig:
    def test_reference_template_loads(self, cfg_file):
        cfg = load_train_config(cfg_file)
        assert cfg.shape == (128, 128, 3)
        assert cfg.radius == 700.0
        assert cfg.render_dims == (720, 540)
        np.testing.assert_allclose(cfg.K[0], [1075.65, 0, 360])
        assert cfg.num_filter == [128, 256, 512, 512]
        assert cfg.strides == [2, 2, 2, 2]
        assert cfg.bootstrap_ratio == 4
        assert cfg.batch_size == 64
        assert cfg.learning_rate == 2e-4
        assert cfg.embedding_size == 2562 * 36

    def test_augmentation_chain_parses(self, cfg_file):
        cfg = load_train_config(cfg_file)
        chain = cfg.code
        assert isinstance(chain, A.Sequential)
        assert len(chain.children) == 8
        s0 = chain.children[0]
        assert isinstance(s0, A.Sometimes) and s0.p == 0.5
        assert isinstance(s0.child, A.Affine)
        assert A.as_range(s0.child.scale) == (1.0, 1.2)
        blur = chain.children[2].child
        assert isinstance(blur, A.GaussianBlur)
        lo, hi = A.as_range(blur.sigma)
        assert lo == hi and 0.0 <= lo <= 1.2  # sigma fixed at parse time
        inv = chain.children[4]
        assert inv.p == 0.3 and inv.child.per_channel == 1.0

    def test_occlusion_flags(self, cfg_file, tmp_path):
        cfg = load_train_config(cfg_file)
        assert cfg.realistic_occlusion == 0.0
        assert cfg.square_occlusion == 0.0
        p = tmp_path / "occ.cfg"
        p.write_text(REFERENCE_TEMPLATE.replace("SQUARE_OCCLUSION: False", "SQUARE_OCCLUSION: 0.25"))
        cfg2 = load_train_config(str(p))
        assert cfg2.square_occlusion == 0.25

    def test_neighbor_clutter_knobs(self, cfg_file, tmp_path):
        cfg = load_train_config(cfg_file)
        assert cfg.neighbor_clutter == 0.0
        assert cfg.neighbor_clutter_count == 1
        assert cfg.neighbor_clutter_shift == (0.35, 0.9)
        p = tmp_path / "nc.cfg"
        p.write_text(
            REFERENCE_TEMPLATE.replace(
                "MAX_REL_OFFSET: 0.20",
                "NEIGHBOR_CLUTTER: 0.5\n"
                "NEIGHBOR_CLUTTER_COUNT: 2\n"
                "NEIGHBOR_CLUTTER_SHIFT: (0.25, 0.8)\n"
                "MAX_REL_OFFSET: 0.20",
            )
        )
        cfg2 = load_train_config(str(p))
        assert cfg2.neighbor_clutter == 0.5
        assert cfg2.neighbor_clutter_count == 2
        assert cfg2.neighbor_clutter_shift == (0.25, 0.8)

    def test_cache_key_stable(self, cfg_file):
        a = load_train_config(cfg_file).dataset_cache_items()
        b = load_train_config(cfg_file).dataset_cache_items()
        assert a == b and "720" in a
