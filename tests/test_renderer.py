"""Renderer tests: projection/depth invariants, backend agreement, IO."""

import numpy as np
import pytest

from augmentedautoencoder_tpu.geometry import transform, view_sampler
from augmentedautoencoder_tpu.renderer import FakeRenderer, Renderer
from augmentedautoencoder_tpu.renderer.mesh import load_ply
from augmentedautoencoder_tpu.renderer.procedural import make_cube, make_icosphere, save_ply
from augmentedautoencoder_tpu.renderer import raster_numpy

K = np.array([[1075.65, 0, 360.0], [0, 1073.90, 270.0], [0, 0, 1.0]])
W, H = 720, 540
T = np.array([0.0, 0.0, 700.0])
NEAR, FAR = 10.0, 10000.0


@pytest.fixture(scope="module")
def sphere_mesh():
    return make_icosphere(subdivisions=3, radius=60.0)


@pytest.fixture(scope="module")
def numpy_renderer(sphere_mesh):
    return Renderer([], backend="numpy", meshes=[sphere_mesh])


class TestRasterInvariants:
    def test_depth_is_eye_space_z(self, numpy_renderer):
        R = np.eye(3)
        _, depth = numpy_renderer.render(0, W, H, K, R, T, NEAR, FAR)
        vis = depth[depth > 0]
        assert vis.size > 0
        # nearest sphere point is at radius 700 - 60 = 640 mm
        assert abs(vis.min() - 640.0) < 1.0
        assert vis.max() < 700.0 + 1.0  # silhouette depth < center distance

    def test_projected_silhouette_centered_and_sized(self, numpy_renderer):
        R = transform.random_rotation_matrix(np.array([0.3, 0.6, 0.9]))[:3, :3]
        _, depth = numpy_renderer.render(0, W, H, K, R, T, NEAR, FAR)
        ys, xs = np.nonzero(depth > 0)
        cx, cy = xs.mean(), ys.mean()
        assert abs(cx - K[0, 2]) < 2.0 and abs(cy - K[1, 2]) < 2.0
        # angular radius asin(60/700) -> pixel radius ~ f*tan(asin(r/d))
        expected_r = K[0, 0] * np.tan(np.arcsin(60.0 / 700.0))
        measured_r = (xs.max() - xs.min()) / 2.0
        assert abs(measured_r - expected_r) < 3.0

    def test_rotation_changes_colors_not_silhouette(self, numpy_renderer):
        R1 = np.eye(3)
        R2 = transform.rotation_matrix(1.0, [0, 1, 0])[:3, :3]
        bgr1, d1 = numpy_renderer.render(0, W, H, K, R1, T, NEAR, FAR)
        bgr2, d2 = numpy_renderer.render(0, W, H, K, R2, T, NEAR, FAR)
        # faceted sphere: silhouette identical up to boundary pixels
        m1, m2 = d1 > 0, d2 > 0
        iou = (m1 & m2).sum() / (m1 | m2).sum()
        assert iou > 0.99
        assert np.abs(bgr1.astype(int) - bgr2.astype(int)).mean() > 1.0

    def test_fixed_light_deterministic(self, numpy_renderer):
        R = np.eye(3)
        a = numpy_renderer.render(0, W, H, K, R, T, NEAR, FAR, random_light=False)
        b = numpy_renderer.render(0, W, H, K, R, T, NEAR, FAR, random_light=False)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_background_is_zero(self, numpy_renderer):
        bgr, depth = numpy_renderer.render(0, W, H, K, np.eye(3), T, NEAR, FAR)
        assert (bgr[depth == 0] == 0).all()


class TestNativeBackend:
    def test_native_matches_numpy(self, sphere_mesh):
        pytest.importorskip("ctypes")
        from augmentedautoencoder_tpu.renderer.native import native_available

        if not native_available():
            pytest.skip("no C++ toolchain")
        ren_np = Renderer([], backend="numpy", meshes=[sphere_mesh])
        ren_cc = Renderer([], backend="native", meshes=[sphere_mesh])
        R = transform.random_rotation_matrix(np.array([0.1, 0.5, 0.8]))[:3, :3]
        bgr_a, d_a = ren_np.render(0, W, H, K, R, T, NEAR, FAR)
        bgr_b, d_b = ren_cc.render(0, W, H, K, R, T, NEAR, FAR)
        same_mask = (d_a > 0) & (d_b > 0)
        # silhouettes may differ by a few boundary pixels
        assert (same_mask.sum() / max((d_a > 0).sum(), 1)) > 0.995
        np.testing.assert_allclose(d_a[same_mask], d_b[same_mask], rtol=1e-5)
        diff = np.abs(bgr_a[same_mask].astype(int) - bgr_b[same_mask].astype(int))
        assert diff.max() <= 2  # rounding differences only

    def _agree(self, mesh, t, near=50.0, shading="vertex"):
        from augmentedautoencoder_tpu.renderer.native import native_available

        if not native_available():
            pytest.skip("no C++ toolchain")
        k = np.array([[280.0, 0, 64], [0, 280, 64], [0, 0, 1.0]])
        ren_np = Renderer([], backend="numpy", meshes=[mesh], shading=shading)
        ren_cc = Renderer([], backend="native", meshes=[mesh], shading=shading)
        R = transform.random_rotation_matrix(np.array([0.3, 0.6, 0.9]))[:3, :3]
        bgr_a, d_a = ren_np.render(0, 128, 128, k, R, t, near, 4000.0)
        bgr_b, d_b = ren_cc.render(0, 128, 128, k, R, t, near, 4000.0)
        both = (d_a > 0) & (d_b > 0)
        union = ((d_a > 0) | (d_b > 0)).sum()
        if union:
            assert both.sum() / union > 0.995
            np.testing.assert_allclose(d_a[both], d_b[both], rtol=1e-5)
            diff = np.abs(bgr_a[both].astype(int) - bgr_b[both].astype(int))
            assert diff.max() <= 2
        return union

    def test_near_plane_slice_agrees(self):
        """When the near plane slices the object, GL (reference: GL_CULL_FACE
        never enabled) shows the interior BACK faces. The native backend's
        backface culling must switch itself off for such renders — it used
        to cull everything while numpy rendered the interior."""
        from augmentedautoencoder_tpu.renderer.procedural import make_textured_asymmetric

        mesh = make_textured_asymmetric()
        for shading in ("vertex", "cad"):
            # radius ~60 at z=80 with near=50: front hemisphere clipped
            union = self._agree(mesh, np.array([0, 0, 80.0]), shading=shading)
            assert union > 1000, "near-slice view should be non-empty"

    def test_degenerate_faces_agree(self, sphere_mesh):
        """Zero-area (duplicate-vertex) triangles must be skipped identically
        by both backends."""
        from augmentedautoencoder_tpu.renderer.mesh import Mesh

        f = sphere_mesh.faces
        deg = np.stack([f[:, 0], f[:, 0], f[:, 1]], 1)[:16]
        mesh = Mesh(
            vertices=sphere_mesh.vertices,
            normals=sphere_mesh.normals,
            faces=np.concatenate([f, deg]),
            colors=sphere_mesh.colors,
        )
        union = self._agree(mesh, np.array([0, 0, 600.0]))
        assert union > 500

    def test_offscreen_and_behind_camera_empty_in_both(self, sphere_mesh):
        """Fully off-screen / behind-camera objects render empty frames in
        both backends (no crash, no stray fragments)."""
        assert self._agree(sphere_mesh, np.array([5000.0, 0, 600.0])) == 0
        assert self._agree(sphere_mesh, np.array([0, 0, -300.0])) == 0

    def test_cube_faces_flat_shaded(self):
        cube = make_cube(100.0)
        ren = Renderer([], backend="numpy", meshes=[cube])
        bgr, depth = ren.render(0, 128, 128, np.array([[200.0, 0, 64], [0, 200, 64], [0, 0, 1]]),
                                np.eye(3), np.array([0, 0, 400.0]), NEAR, FAR)
        assert (depth > 0).sum() > 100
        # front face of the cube is at z = 400 - 50
        assert abs(depth[64, 64] - 350.0) < 1e-3


class TestRenderMany:
    def test_two_objects_compose_by_depth(self, sphere_mesh):
        ren = Renderer([], backend="numpy", meshes=[sphere_mesh, sphere_mesh])
        Rs = [np.eye(3), np.eye(3)]
        ts = [np.array([0, 0, 700.0]), np.array([30.0, 0, 800.0])]
        bgr, depth, bbs = ren.render_many([0, 1], W, H, K, Rs, ts, NEAR, FAR, random_light=False)
        assert len(bbs) == 2
        vis = depth[depth > 0]
        assert vis.min() < 650  # front sphere visible
        # occluded region of back sphere keeps front depth
        assert depth[270, 360] < 650


class TestFakeRenderer:
    def test_contract_matches_real(self):
        fake = FakeRenderer(object_radius=60.0)
        R = transform.random_rotation_matrix(np.array([0.2, 0.4, 0.6]))[:3, :3]
        bgr, depth = fake.render(0, W, H, K, R, T, NEAR, FAR)
        assert bgr.dtype == np.uint8 and depth.dtype == np.float32
        vis = depth[depth > 0]
        assert abs(vis.min() - 640.0) < 1.0
        assert (bgr[depth == 0] == 0).all()

    def test_orientation_coded(self):
        fake = FakeRenderer()
        R1, R2 = np.eye(3), transform.rotation_matrix(0.8, [1, 1, 0])[:3, :3]
        b1, _ = fake.render(0, W, H, K, R1, T, NEAR, FAR)
        b2, _ = fake.render(0, W, H, K, R2, T, NEAR, FAR)
        assert np.abs(b1.astype(int) - b2.astype(int)).mean() > 1.0


class TestMeshIO:
    def test_ply_roundtrip(self, tmp_path, sphere_mesh):
        p = str(tmp_path / "m.ply")
        save_ply(sphere_mesh, p)
        loaded = load_ply(p)
        assert len(loaded.vertices) == len(sphere_mesh.vertices)
        assert len(loaded.faces) == len(sphere_mesh.faces)
        np.testing.assert_allclose(loaded.vertices, sphere_mesh.vertices, atol=1e-4)
        np.testing.assert_allclose(loaded.colors, np.floor(sphere_mesh.colors), atol=1.0)

    def test_mesh_cache(self, tmp_path, sphere_mesh):
        from augmentedautoencoder_tpu.renderer.mesh import load_mesh

        p = str(tmp_path / "m.ply")
        save_ply(sphere_mesh, p)
        m1 = load_mesh(p, vertex_scale=2.0, cache_dir=str(tmp_path))
        m2 = load_mesh(p, vertex_scale=2.0, cache_dir=str(tmp_path))  # from cache
        np.testing.assert_array_equal(m1.vertices, m2.vertices)
        assert abs(m1.vertices.max() - 2.0 * sphere_mesh.vertices.max()) < 1e-3
