"""Geometry unit tests: sampler counts/ordering invariants, transform algebra."""

import math

import numpy as np
import pytest

from augmentedautoencoder_tpu.geometry import transform, view_sampler


class TestHinterSampling:
    def test_refinement_counts(self):
        # icosahedron refinement: 12 -> 42 -> 162 -> 642 -> 2562
        for min_n, expect in ((12, 12), (13, 42), (162, 162), (163, 642), (2562, 2562)):
            pts, levels = view_sampler.hinter_sampling(min_n)
            assert pts.shape == (expect, 3)
            assert len(levels) == expect

    def test_points_on_sphere(self):
        pts, _ = view_sampler.hinter_sampling(162, radius=700.0)
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 700.0, rtol=1e-12)

    def test_ordering_starts_at_top_and_descends(self):
        pts, _ = view_sampler.hinter_sampling(162)
        # first point is the topmost (+z)
        assert pts[0, 2] == pts[:, 2].max()
        # breadth-first sweep: the first frontier after the pole has higher z
        # than the last frontier
        assert pts[1:7, 2].mean() > pts[-6:, 2].mean()

    def test_ordering_is_deterministic(self):
        a, _ = view_sampler.hinter_sampling(642)
        b, _ = view_sampler.hinter_sampling(642)
        np.testing.assert_array_equal(a, b)


class TestSampleViews:
    def test_rotations_are_valid(self):
        views, _ = view_sampler.sample_views(42, radius=700.0)
        assert len(views) == 42
        for v in views:
            R, t = v["R"], v["t"]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
            np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)
            # camera at distance `radius` from origin
            np.testing.assert_allclose(np.linalg.norm(R.T @ t), 700.0, rtol=1e-10)

    def test_object_centered(self):
        # the origin should project to the optical axis: R*0 + t = t with
        # t = [0, 0, radius] in camera coords
        views, _ = view_sampler.sample_views(42, radius=1.0)
        for v in views:
            t = v["t"].ravel()
            np.testing.assert_allclose(t[:2], 0.0, atol=1e-10)
            np.testing.assert_allclose(t[2], 1.0, atol=1e-10)

    def test_elev_range_filter(self):
        views_all, _ = view_sampler.sample_views(162)
        views_upper, _ = view_sampler.sample_views(162, elev_range=(0.0, 0.5 * math.pi))
        assert 0 < len(views_upper) < len(views_all)


class TestViewsphereRotations:
    def test_shape_and_cyclo_structure(self):
        Rs = view_sampler.viewsphere_rotations(12, num_cyclo=4)
        assert Rs.shape == (48, 3, 3)
        # row 0 of each view block is the raw view rotation (cyclo=0)
        views, _ = view_sampler.sample_views(12)
        np.testing.assert_allclose(Rs[0], views[0]["R"], atol=1e-12)
        np.testing.assert_allclose(Rs[4], views[1]["R"], atol=1e-12)
        # linspace(0, 2pi, n) endpoint: last cyclo equals the first
        np.testing.assert_allclose(Rs[3], Rs[0], atol=1e-12)


class TestTransforms:
    def test_rotation_matrix_axis_angle(self):
        R = transform.rotation_matrix(math.pi / 2, [0, 0, 1])[:3, :3]
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)

    def test_quaternion_roundtrip(self):
        rng = np.random.RandomState(0)
        for _ in range(50):
            R = transform.random_rotation_matrix(rng.rand(3))[:3, :3]
            q = transform.quaternion_from_matrix(R)
            R2 = transform.quaternion_matrix(q)[:3, :3]
            np.testing.assert_allclose(R, R2, atol=1e-10)

    def test_random_rotation_uniformity_smoke(self):
        rng = np.random.RandomState(1)
        zs = [transform.random_rotation_matrix(rng.rand(3))[:3, 2] for _ in range(2000)]
        mean = np.mean(zs, axis=0)
        assert np.linalg.norm(mean) < 0.05  # uniform -> mean direction ~ 0

    def test_rotation_error(self):
        R1 = np.eye(3)
        R2 = transform.rotation_matrix(0.3, [0, 1, 0])[:3, :3]
        assert abs(transform.rotation_error(R1, R2) - 0.3) < 1e-12


class TestBBox:
    def test_calc_2d_bbox(self):
        xs = np.array([10, 20, 30])
        ys = np.array([5, 15])
        x, y, w, h = view_sampler.calc_2d_bbox(xs, ys, (640, 480))
        assert (x, y, w, h) == (9, 4, 22, 12)

    def test_calc_2d_bbox_clamped(self):
        xs = np.array([0, 639])
        ys = np.array([0, 479])
        x, y, w, h = view_sampler.calc_2d_bbox(xs, ys, (640, 480))
        assert (x, y) == (0, 0)
        assert (x + w, y + h) == (639, 479)
