"""Renderer facade extras: SSAA path, cad-shading light mapping."""

import numpy as np

from augmentedautoencoder_tpu.renderer import Renderer
from augmentedautoencoder_tpu.renderer.procedural import make_icosphere

K = np.array([[200.0, 0, 90], [0, 200.0, 68], [0, 0, 1.0]])
T = np.array([0.0, 0.0, 500.0])


def test_ssaa_smooths_edges_keeps_depth_exact():
    mesh = make_icosphere(2, 60.0)
    plain = Renderer([], backend="numpy", meshes=[mesh], samples=1)
    ssaa = Renderer([], backend="numpy", meshes=[mesh], samples=2)
    b1, d1 = plain.render(0, 180, 136, K, np.eye(3), T, 10, 10000)
    b2, d2 = ssaa.render(0, 180, 136, K, np.eye(3), T, 10, 10000)
    # depth identical (depth pass is always 1x, like the reference MSAA path)
    np.testing.assert_array_equal(d1, d2)
    # color: silhouette edges are softened -> more distinct values near edges
    edge = (d1 > 0) != np.roll(d1 > 0, 1, axis=1)
    assert edge.any()
    # at least some edge pixels are blended (not pure bg/fg)
    edge_vals = b2[edge]
    blended = ((edge_vals > 5) & (edge_vals < 250)).any()
    assert blended


def test_cad_vs_vertex_shading_differ():
    mesh = make_icosphere(2, 60.0)  # colored
    vert = Renderer([], backend="numpy", meshes=[mesh], shading="vertex")
    import dataclasses

    cad = Renderer(
        [], backend="numpy", meshes=[dataclasses.replace(mesh)], shading="cad"
    )
    bv, _ = vert.render(0, 90, 68, K, np.eye(3), T, 10, 10000)
    bc, dc = cad.render(0, 90, 68, K, np.eye(3), T, 10, 10000)
    vis = dc > 0
    # cad ignores vertex colors: its visible pixels are near-monochrome in
    # hue (fixed material), unlike the orientation-colored vertex render
    spread_cad = bc[vis].astype(int).std(axis=0).mean()
    spread_vert = bv[vis].astype(int).std(axis=0).mean()
    assert spread_cad < spread_vert
