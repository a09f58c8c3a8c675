"""Load the reference repo's OWN shipped .cfg files through our parsers.

Direct evidence that reference configs load unchanged. Skipped when the
reference checkout isn't mounted.
"""

import glob
import os

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def test_reference_train_template_loads():
    from augmentedautoencoder_tpu.config import load_train_config
    from augmentedautoencoder_tpu.data import augment_spec as A

    cfg = load_train_config(
        os.path.join(REF, "auto_pose", "ae", "cfg", "train_template.cfg")
    )
    assert cfg.shape == (128, 128, 3)
    assert cfg.render_dims == (720, 540)
    np.testing.assert_allclose(cfg.K[0], [1075.65, 0, 360])
    assert cfg.num_filter == [128, 256, 512, 512]
    assert cfg.min_n_views == 2562 and cfg.num_cyclo == 36
    assert isinstance(cfg.code, A.Sequential) and len(cfg.code.children) == 8
    # the full augmentation chain must compile to a device function
    from augmentedautoencoder_tpu.data.augment import build_augmenter

    fn = build_augmenter(cfg.code)
    import jax
    import jax.numpy as jnp

    out = jax.jit(fn)(jax.random.PRNGKey(0), jnp.zeros((2, 128, 128, 3)))
    assert out.shape == (2, 128, 128, 3)


def test_reference_eval_template_loads():
    from augmentedautoencoder_tpu.config.eval_config import load_eval_config

    path = os.path.join(REF, "auto_pose", "ae", "cfg_eval", "eval_template.cfg")
    if not os.path.exists(path):
        candidates = glob.glob(os.path.join(REF, "auto_pose", "ae", "cfg_eval", "*.cfg"))
        if not candidates:
            pytest.skip("no eval cfg in reference")
        path = candidates[0]
    cfg = load_eval_config(path)
    assert cfg.vsd_tau > 0 and cfg.error_thresh > 0
    assert len(cfg.error_types) >= 1


def test_reference_m3_template_loads():
    from augmentedautoencoder_tpu.config import safe_eval
    import configparser

    path = os.path.join(REF, "auto_pose", "cfg_m3vision", "m3_template.cfg")
    if not os.path.exists(path):
        pytest.skip("no m3 template in reference")
    cp = configparser.ConfigParser(inline_comment_prefixes="#")
    cp.read(path)
    mapping = safe_eval(cp.get("auto_pose", "class_2_encoder"))
    assert isinstance(mapping, dict) and len(mapping) >= 1


def test_all_reference_cfgs_parse():
    """Every .cfg under the reference tree must at least parse through the
    matching loader without raising."""
    from augmentedautoencoder_tpu.config import load_train_config
    from augmentedautoencoder_tpu.config.eval_config import load_eval_config

    train_like, eval_like, other = 0, 0, 0
    for path in glob.glob(os.path.join(REF, "**", "*.cfg"), recursive=True):
        with open(path) as fh:
            head = fh.read(4000)
        if "[Dataset]" in head:
            load_train_config(path)
            train_like += 1
        elif "[METRIC]" in head or "[DATA]" in head:
            load_eval_config(path)
            eval_like += 1
        else:
            other += 1
    assert train_like >= 1
