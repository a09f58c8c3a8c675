"""Golden-file render test: the rasterizer's output is pinned to a
checked-in fixture so silent rendering regressions (shading, projection,
depth semantics) are caught — the golden-file layer of the test pyramid
(SURVEY.md section 4)."""

import os

import numpy as np

from augmentedautoencoder_tpu.renderer import Renderer
from augmentedautoencoder_tpu.renderer.procedural import make_icosphere

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_render.npz")


def test_render_matches_golden():
    data = np.load(FIXTURE)
    ren = Renderer([], backend="numpy", meshes=[make_icosphere(2, 60.0)])
    bgr, depth = ren.render(
        0, 180, 136, data["K"], data["R"], np.array([0, 0, 500.0]),
        10, 10000, random_light=False,
    )
    # color exact to 1 LSB (rounding), depth to float32 resolution
    diff = np.abs(bgr.astype(int) - data["bgr"].astype(int))
    assert diff.max() <= 1, f"color drifted: max diff {diff.max()}"
    np.testing.assert_allclose(depth, data["depth"], rtol=1e-5, atol=1e-3)


def test_native_matches_golden_when_available():
    from augmentedautoencoder_tpu.renderer.native import native_available

    if not native_available():
        import pytest

        pytest.skip("no C++ toolchain")
    data = np.load(FIXTURE)
    ren = Renderer([], backend="native", meshes=[make_icosphere(2, 60.0)])
    bgr, depth = ren.render(
        0, 180, 136, data["K"], data["R"], np.array([0, 0, 500.0]),
        10, 10000, random_light=False,
    )
    vis_match = (depth > 0) == (data["depth"] > 0)
    assert vis_match.mean() > 0.999
    both = (depth > 0) & (data["depth"] > 0)
    np.testing.assert_allclose(depth[both], data["depth"][both], rtol=1e-4)
    diff = np.abs(bgr[both].astype(int) - data["bgr"][both].astype(int))
    assert diff.max() <= 2
