"""The shared A/B scene set must be bit-reproducible from its seed.

Every quality study (PERF.md round 3/4) compares arms on a SHARED rendered
scene set; /tmp wipes between sessions destroyed that set twice because the
renderer's random_light path draws from the global np.random
(renderer/facade.py:_sample_light — same global-RNG contract as the
reference's meshrenderer). scripts/quality_eval_vsd.make_scenes now seeds
the global RNG, so regenerating with the same seed must reproduce every
pixel, mask, and GT json byte-for-byte.
"""

import hashlib
import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_quality_script():
    spec = importlib.util.spec_from_file_location(
        "quality_eval_vsd", os.path.join(REPO, "scripts", "quality_eval_vsd.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tree_digest(root: str) -> dict:
    digests = {}
    for dirpath, _, names in os.walk(root):
        for name in names:
            p = os.path.join(dirpath, name)
            with open(p, "rb") as fh:
                digests[os.path.relpath(p, root)] = hashlib.md5(fh.read()).hexdigest()
    return digests


def test_make_scenes_bit_reproducible(tmp_path):
    import numpy as np

    from augmentedautoencoder_tpu.renderer.procedural import (
        make_textured_asymmetric,
        save_ply,
    )

    model_path = str(tmp_path / "obj.ply")
    save_ply(make_textured_asymmetric(subdivisions=1, radius=60.0), model_path)
    q = _load_quality_script()

    trees = []
    for run in ("a", "b"):
        root = str(tmp_path / run)
        # perturb the global RNG stream between runs: the seeding inside
        # make_scenes must make the output independent of prior global state
        np.random.seed(ord(run))
        np.random.rand(run == "b" and 7 or 3)
        q.make_scenes(root, model_path, n=2, seed=123, instances=2)
        trees.append(_tree_digest(root))

    assert trees[0], "make_scenes produced no files"
    assert trees[0] == trees[1]
