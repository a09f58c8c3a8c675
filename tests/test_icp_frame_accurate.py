"""Frame-accurate ICP cloud geometry (pose/icp.py crop_offset path).

The reference renders the ICP synthetic depth at [0, 0, tz] — centered —
and re-projects the real crop through a crop-centered K
(icp_utils.py:248-270). For an instance far from the principal point the
two clouds are then seen along different viewing rays, which biases the
fitted x/y laterally (measured up to ~20 mm at +-115 mm offset, PERF.md
round-4 ICP-geometry study). The frame-accurate variant renders AT the
estimated lateral position and slices the real crop's window, putting both
clouds in the true camera frame.
"""

import numpy as np
import pytest

from augmentedautoencoder_tpu.pose.icp import ICP, SynRenderer
from augmentedautoencoder_tpu.renderer import Renderer
from augmentedautoencoder_tpu.renderer.mesh import load_mesh
from augmentedautoencoder_tpu.renderer.procedural import (
    make_textured_asymmetric,
    save_ply,
)

K = np.array([[240.0, 0, 80.0], [0, 240.0, 60.0], [0, 0, 1.0]])
W, H = 160, 120
T_GT = np.array([100.0, 8.0, 550.0])  # far off-center: ~44 px lateral


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("icpf") / "obj.ply")
    save_ply(make_textured_asymmetric(subdivisions=2, radius=45.0), path)
    renderer = Renderer([], backend="auto", meshes=[load_mesh(path)])
    _, depth_gt = renderer.render(
        0, W, H, K, np.eye(3), T_GT, 10, 10000, random_light=False
    )
    assert (depth_gt > 0).sum() > 200
    ys, xs = np.nonzero(depth_gt > 0)
    cx, cy = (xs.min() + xs.max()) // 2, (ys.min() + ys.max()) // 2
    size = int(max(xs.max() - xs.min(), ys.max() - ys.min()) * 1.2)
    left = max(cx - size // 2, 0)
    top = max(cy - size // 2, 0)
    crop = depth_gt[top:top + size, left:left + size]
    return renderer, crop, (left, top)


def _refine(scene, crop_offsets):
    renderer, crop, offset = scene
    icp = ICP({"obj": SynRenderer(renderer)})
    R0 = np.eye(3)
    t0 = T_GT + np.array([4.0, -3.0, 30.0])  # realistic initial error
    Rs, ts = icp.refine_batch(
        [crop], [R0], [t0], K, (W, H), class_name="obj",
        rng=np.random.RandomState(0),
        crop_offsets=[offset] if crop_offsets else None,
    )
    return ts[0]


def test_frame_accurate_removes_lateral_bias(scene):
    t_centered = _refine(scene, crop_offsets=False)
    t_frame = _refine(scene, crop_offsets=True)
    err_centered = np.linalg.norm(t_centered - T_GT)
    err_frame = np.linalg.norm(t_frame - T_GT)
    # the reference geometry leaves a lateral bias at this offset; the
    # frame-accurate clouds must land clearly closer to the truth
    assert err_frame < err_centered
    assert err_frame < 6.0, (t_frame, T_GT)
    # and the known failure axis (x, toward/away from the principal point)
    assert abs(t_frame[0] - T_GT[0]) < abs(t_centered[0] - T_GT[0])


def test_frame_accurate_matches_centered_at_principal_point(scene):
    """At the image center the two geometries see the same rays — the
    frame-accurate variant must not change the well-posed case."""
    renderer, _, _ = scene
    t_gt = np.array([0.0, 0.0, 550.0])
    _, depth_gt = renderer.render(
        0, W, H, K, np.eye(3), t_gt, 10, 10000, random_light=False
    )
    ys, xs = np.nonzero(depth_gt > 0)
    size = int(max(xs.max() - xs.min(), ys.max() - ys.min()) * 1.2)
    left = max((xs.min() + xs.max()) // 2 - size // 2, 0)
    top = max((ys.min() + ys.max()) // 2 - size // 2, 0)
    crop = depth_gt[top:top + size, left:left + size]
    icp = ICP({"obj": SynRenderer(renderer)})
    t0 = t_gt + np.array([0.0, 0.0, 25.0])
    outs = []
    for offs in (None, [(left, top)]):
        _, ts = icp.refine_batch(
            [crop], [np.eye(3)], [t0], K, (W, H), class_name="obj",
            rng=np.random.RandomState(1), crop_offsets=offs,
        )
        outs.append(ts[0])
    err_c = np.linalg.norm(outs[0] - t_gt)
    err_f = np.linalg.norm(outs[1] - t_gt)
    assert err_f < 6.0 and err_c < 6.0
