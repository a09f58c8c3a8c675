"""Mesh decimation (LOD) for the offline renderer: invariants + visual
agreement with the full mesh at render scale."""

import numpy as np
import pytest

from augmentedautoencoder_tpu.renderer.mesh import compute_vertex_normals, decimate_mesh
from augmentedautoencoder_tpu.renderer.procedural import (
    make_icosphere,
    make_textured_asymmetric,
)

K = np.array([[540.0, 0, 90], [0, 540.0, 67], [0, 0, 1]])


class TestDecimate:
    def test_face_budget_and_geometry(self):
        mesh = make_icosphere(4, 60.0)  # 5120 faces
        out = decimate_mesh(mesh, 1200)
        assert len(out.faces) <= 1200
        assert len(out.faces) >= 300  # not collapsed to nothing
        # vertices stay inside the original bbox (cluster means)
        assert (out.vertices.min(axis=0) >= mesh.vertices.min(axis=0) - 1e-9).all()
        assert (out.vertices.max(axis=0) <= mesh.vertices.max(axis=0) + 1e-9).all()
        # valid face indices, unit normals
        assert out.faces.max() < len(out.vertices)
        np.testing.assert_allclose(
            np.linalg.norm(out.normals, axis=1), 1.0, atol=1e-6
        )
        # radius preserved within a cluster-cell tolerance
        r = np.linalg.norm(out.vertices, axis=1)
        assert abs(np.median(r) - 60.0) < 3.0

    def test_noop_below_target(self):
        mesh = make_icosphere(2, 60.0)  # 320 faces
        assert decimate_mesh(mesh, 1000) is mesh

    def test_deterministic(self):
        mesh = make_textured_asymmetric(4, 60.0)
        a = decimate_mesh(mesh, 2000)
        b = decimate_mesh(mesh, 2000)
        np.testing.assert_array_equal(a.faces, b.faces)
        np.testing.assert_array_equal(a.vertices, b.vertices)

    def test_colors_averaged(self):
        mesh = make_textured_asymmetric(4, 60.0)
        out = decimate_mesh(mesh, 2000)
        assert out.colors is not None and out.colors.shape == (len(out.vertices), 3)
        assert out.colors.min() >= 0.0 and out.colors.max() <= 255.0

    def test_render_agreement_at_scale(self):
        """Decimated render ~= full render where triangles are ~1 px:
        silhouette IoU high, color close on the common silhouette."""
        from augmentedautoencoder_tpu.renderer import Renderer

        full = make_textured_asymmetric(4, 60.0)  # 5120 faces
        lod = decimate_mesh(full, 1300)
        r_full = Renderer([], backend="numpy", meshes=[full])
        r_lod = Renderer([], backend="numpy", meshes=[lod])
        R = np.eye(3)
        t = np.array([0.0, 0.0, 550.0])
        bgr_f, d_f = r_full.render(0, 180, 135, K, R, t, 10, 10000)
        bgr_l, d_l = r_lod.render(0, 180, 135, K, R, t, 10, 10000)
        m_f, m_l = d_f > 0, d_l > 0
        iou = (m_f & m_l).sum() / max((m_f | m_l).sum(), 1)
        assert iou > 0.93, iou
        both = m_f & m_l
        err = np.abs(
            bgr_f[both].astype(np.float64) - bgr_l[both].astype(np.float64)
        ).mean()
        assert err < 40.0, err  # checker texture: cluster-averaged colors blur

    def test_renderer_max_faces_param(self):
        from augmentedautoencoder_tpu.renderer import Renderer

        mesh = make_icosphere(4, 60.0)
        r = Renderer([], backend="numpy", meshes=[mesh], max_faces=800)
        assert len(r._meshes[0].faces) <= 800

    def test_cfg_option_parsed(self, tmp_path):
        import textwrap

        from augmentedautoencoder_tpu.config import load_train_config

        cfg_file = tmp_path / "t.cfg"
        cfg_file.write_text(
            textwrap.dedent(
                """
                [Dataset]
                MAX_RENDER_FACES: 4000
                """
            )
        )
        cfg = load_train_config(str(cfg_file))
        assert cfg.max_render_faces == 4000
