"""Pose API + ICP tests."""

import numpy as np
import pytest

from augmentedautoencoder_tpu.geometry import transform
from augmentedautoencoder_tpu.pose.icp import (
    best_fit_transform,
    icp,
    icp_refinement,
    nearest_neighbor_jax,
    SynRenderer,
)
from augmentedautoencoder_tpu.pose.interfaces import BoundingBox, PoseEstimate, Roi3D


class TestInterfaces:
    def test_bounding_box(self):
        bb = BoundingBox(0.1, 0.2, 0.5, 0.6, classes={"obj_05": 0.9, "obj_06": 0.3})
        assert bb.best_class == "obj_05"
        assert bb.to_xywh(100, 200) == [10.0, 40.0, 40.0, 80.0]

    def test_bounding_box_validation(self):
        with pytest.raises(AssertionError):
            BoundingBox(-0.1, 0, 1, 1)

    def test_pose_estimate(self):
        p = PoseEstimate(name="x", trafo=np.eye(4))
        assert p.trafo.shape == (4, 4)
        with pytest.raises(AssertionError):
            PoseEstimate(trafo=np.eye(3))

    def test_roi3d(self):
        r = Roi3D(shape="sphere", scale=[1, 2, 3])
        assert r.shape == "sphere"


def random_cloud(n=500, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, 3) * 100.0).astype(np.float32)


class TestBestFit:
    def test_recovers_known_transform(self):
        A = random_cloud()
        R = transform.rotation_matrix(0.4, [1, 2, 3])[:3, :3]
        t = np.array([5.0, -3.0, 10.0])
        B = A @ R.T + t
        T, R_est, t_est = best_fit_transform(A, B)
        np.testing.assert_allclose(R_est, R, atol=1e-4)
        np.testing.assert_allclose(t_est, t, atol=1e-3)

    def test_depth_only(self):
        A = random_cloud()
        B = A + np.array([5.0, 7.0, 20.0])
        T, R_est, t_est = best_fit_transform(A, B, depth_only=True)
        np.testing.assert_allclose(R_est, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(t_est, [0, 0, 20.0], atol=1e-3)

    def test_no_depth_zeroes_tz(self):
        A = random_cloud()
        B = A + np.array([5.0, 7.0, 20.0])
        T, R_est, t_est = best_fit_transform(A, B, no_depth=True)
        assert abs(t_est[2]) < 1e-6
        np.testing.assert_allclose(t_est[:2], [5.0, 7.0], atol=1e-3)

    def test_small_rotation_at_camera_distance(self):
        """Guard for the Newton-polar Kabsch: a 4-degree rotation of a cloud
        sitting at camera working distance (|p| ~ 550 mm) must be recovered
        to ~0.03 degrees. jnp.linalg.svd in f32 on TPU missed it by ~3
        degrees — the exact production ICP regime (pose/icp.py)."""
        rng = np.random.RandomState(0)
        A = (rng.rand(3000, 3) - 0.5) * 60 + np.array([0, 0, 550.0])
        R = transform.rotation_matrix(np.deg2rad(4.0), [0.3, 0.5, 0.8])[:3, :3]
        B = A @ R.T
        _, R_est, _ = best_fit_transform(A, B)
        err = np.rad2deg(transform.rotation_error(R, R_est))
        assert err < 0.05, err

    def test_degenerate_cloud_falls_back_to_identity(self):
        """Ill-conditioned H (collinear cloud: rank-1 covariance) must not
        compose a non-rigid matrix into the pose — the Kabsch iteration's
        orthogonality residual check falls back to identity instead."""
        rng = np.random.RandomState(1)
        line = rng.rand(200, 1).astype(np.float32) * np.array([[1.0, 2.0, 3.0]])
        A = line.astype(np.float32)
        B = (line * np.array([[0.5, 1.0, -2.0]])).astype(np.float32)  # non-rigid map
        _, R_est, _ = best_fit_transform(A, B)
        # whatever R comes back must be a proper rotation
        np.testing.assert_allclose(R_est @ R_est.T, np.eye(3), atol=1e-3)
        assert np.linalg.det(R_est) > 0.9

    def test_wellconditioned_unaffected_by_ortho_guard(self):
        A = random_cloud()
        R = transform.rotation_matrix(1.1, [0.2, -0.7, 0.4])[:3, :3]
        B = (A @ R.T).astype(np.float32)
        _, R_est, _ = best_fit_transform(A, B)
        np.testing.assert_allclose(R_est, R, atol=1e-4)


class TestICP:
    def test_nearest_neighbor(self):
        src = np.array([[0, 0, 0], [10, 0, 0]], np.float32)
        dst = np.array([[9.5, 0, 0], [0.5, 0, 0], [50, 0, 0]], np.float32)
        dist, idx = nearest_neighbor_jax(src, dst)
        np.testing.assert_array_equal(np.asarray(idx), [1, 0])
        np.testing.assert_allclose(np.asarray(dist), [0.5, 0.5], atol=1e-5)

    def test_icp_converges_small_perturbation(self):
        A = random_cloud(800)
        R = transform.rotation_matrix(0.1, [0, 1, 0])[:3, :3]
        t = np.array([2.0, -1.0, 3.0])
        B = A @ R.T + t
        T, err, iters = icp(A, B, tolerance=1e-9)
        np.testing.assert_allclose(T[:3, :3], R, atol=1e-2)
        np.testing.assert_allclose(T[:3, 3], t, atol=0.5)
        assert err < 0.5

    def test_icp_terminates_before_cap_at_camera_distance(self):
        """Fixed-point stopping (round-5): clouds with an exact rigid
        alignment, placed at camera-frame magnitudes (z ~ 700 mm), must
        stop well below the 100-iteration cap. Before the round-5 fix the
        f32 error-delta test never fired and every lane paid the cap (and
        on TPU the bf16 default-precision point transform re-quantized the
        cloud by ~1.4 mm per iteration, PERF.md 'ICP f32 conditioning')."""
        from augmentedautoencoder_tpu.pose.icp import icp_batch

        offset = np.array([40.0, -30.0, 700.0], np.float32)
        As, Bs, Rs, ts_ = [], [], [], []
        for j in range(3):
            A = random_cloud(800, seed=j) + offset
            R = transform.rotation_matrix(0.02 + 0.03 * j, [1, 0, 1])[:3, :3]
            t = np.array([1.5, -1.0, 2.0]) * (j + 1)
            As.append(A.astype(np.float32))
            Bs.append((A @ R.T + t).astype(np.float32))
            Rs.append(R)
            ts_.append(t)
        fits = icp_batch(np.stack(As), np.stack(Bs), tolerance=1e-9)
        for (T, err, iters), R, t in zip(fits, Rs, ts_):
            assert iters < 50, f"lane spun to {iters} iterations"
            np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
            np.testing.assert_allclose(T[:3, 3], t, atol=0.1)


class TestICPRefinement:
    def test_depth_refinement_on_fake_sphere(self):
        from augmentedautoencoder_tpu.renderer import FakeRenderer

        K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
        fake = FakeRenderer(object_radius=60.0)
        syn = SynRenderer(fake)

        # "real" depth: sphere at z=700; estimate starts 60mm too close
        _, depth_gt = fake.render(0, 160, 120, K, np.eye(3), np.array([0, 0, 700.0]), 10, 10000)
        # crop centered on principal point, like eval's depth crops
        K_centered = K.copy()
        R0 = np.eye(3)
        t0 = np.array([0.0, 0.0, 640.0])
        R1, t1 = icp_refinement(
            depth_gt, syn, R0, t0, K, (160, 120), depth_only=True,
            rng=np.random.RandomState(0),
        )
        assert abs(t1[2] - 700.0) < abs(t0[2] - 700.0)  # moved toward truth
        np.testing.assert_allclose(R1, R0, atol=1e-6)  # depth_only keeps R

    def test_static_subsample_shape_no_recompile(self):
        """Varying visible-point counts must NOT grow the jit cache: the
        refinement always draws N_SUB samples with replacement (the
        reference's own sampling process, icp_utils.py:269-270), so icp_jax
        sees one shape per flag combination."""
        from augmentedautoencoder_tpu.pose import icp as icp_mod
        from augmentedautoencoder_tpu.renderer import FakeRenderer

        K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
        fake = FakeRenderer(object_radius=60.0)
        syn = SynRenderer(fake)
        rng = np.random.RandomState(0)
        before = icp_mod.icp_jax._cache_size()
        for z in (640.0, 700.0, 760.0):  # different z => different # visible px
            _, depth = fake.render(0, 160, 120, K, np.eye(3), np.array([0, 0, z]), 10, 10000)
            icp_refinement(
                depth, syn, np.eye(3), np.array([0.0, 0.0, z]), K, (160, 120),
                depth_only=True, rng=rng,
            )
        grown = icp_mod.icp_jax._cache_size() - before
        assert grown <= 1, f"icp_jax recompiled {grown} times for varying cloud sizes"

    def test_icp_batch_lanes_match_sequential(self):
        """icp_jax_batch lane i must track icp_jax on (A_i, B_i): the
        batched while_loop freezes converged lanes while slower lanes keep
        iterating, so every lane follows the same iteration path as its
        sequential run (iteration counts equal) and lands on the same
        transform up to f32 roundoff (the batched program fuses reductions
        differently than the per-lane one, so bit-equality is not a
        guarantee XLA makes)."""
        from augmentedautoencoder_tpu.pose.icp import icp, icp_batch

        rng = np.random.RandomState(3)
        As, Bs, seq = [], [], []
        for j in range(3):
            A = random_cloud(500)
            R = transform.rotation_matrix(0.02 + 0.05 * j, [0, 1, 0])[:3, :3]
            t = np.array([1.0, -2.0, 3.0]) * (j + 1)
            B = (A @ R.T + t).astype(np.float32)
            As.append(A.astype(np.float32))
            Bs.append(B)
        for A, B in zip(As, Bs):
            seq.append(icp(A, B, tolerance=1e-7))
        got = icp_batch(np.stack(As), np.stack(Bs), tolerance=1e-7)
        for (T_b, err_b, it_b), (T_s, err_s, it_s) in zip(got, seq):
            np.testing.assert_allclose(T_b, T_s, atol=1e-4)
            np.testing.assert_allclose(err_b, err_s, atol=1e-3)
            assert it_b == it_s

    def test_refine_batch_matches_refine_single(self):
        """n=1 refine_batch draws the same subsamples as refine when seeded
        identically, so results must match exactly."""
        from augmentedautoencoder_tpu.pose.icp import ICP
        from augmentedautoencoder_tpu.renderer import FakeRenderer

        K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
        fake = FakeRenderer(object_radius=60.0)
        handle = ICP({"obj": SynRenderer(fake)})
        _, depth_gt = fake.render(0, 160, 120, K, np.eye(3), np.array([0, 0, 700.0]), 10, 10000)
        R0, t0 = np.eye(3), np.array([0.0, 0.0, 640.0])

        # refine() without codebook == two icp_refinement stages
        import augmentedautoencoder_tpu.pose.icp as icp_mod

        rng_a = np.random.RandomState(7)
        R_a, t_a = icp_mod.icp_refinement(
            depth_gt, handle.renderers["obj"], R0, t0, K, (160, 120),
            depth_only=True, rng=rng_a,
        )
        R_a, t_a = icp_mod.icp_refinement(
            depth_gt, handle.renderers["obj"], R_a, t_a, K, (160, 120),
            no_depth=True, rng=rng_a,
        )
        rng_b = np.random.RandomState(7)
        Rs_b, ts_b = handle.refine_batch(
            [depth_gt], [R0], [t0], K, (160, 120), rng=rng_b,
        )
        np.testing.assert_allclose(Rs_b[0], R_a, atol=1e-6)
        np.testing.assert_allclose(ts_b[0], t_a, atol=1e-4)

    def test_refine_batch_passthrough_when_gated(self):
        """Estimates whose depth crop is empty must pass through unchanged
        while live estimates in the same batch still refine."""
        from augmentedautoencoder_tpu.pose.icp import ICP
        from augmentedautoencoder_tpu.renderer import FakeRenderer

        K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
        fake = FakeRenderer(object_radius=60.0)
        handle = ICP({"obj": SynRenderer(fake)})
        _, depth_gt = fake.render(0, 160, 120, K, np.eye(3), np.array([0, 0, 700.0]), 10, 10000)
        empty = np.zeros((120, 160), np.float32)
        R0, t0 = np.eye(3), np.array([0.0, 0.0, 640.0])
        Rs, ts = handle.refine_batch(
            [empty, depth_gt], [R0, R0], [t0, t0], K, (160, 120),
            rng=np.random.RandomState(1),
        )
        np.testing.assert_array_equal(Rs[0], R0)   # gated: unchanged
        np.testing.assert_array_equal(ts[0], t0)
        assert abs(ts[1][2] - 700.0) < abs(t0[2] - 700.0)  # live: refined

    def test_rejects_when_object_invisible(self):
        from augmentedautoencoder_tpu.renderer import FakeRenderer

        K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
        fake = FakeRenderer(object_radius=60.0)
        syn = SynRenderer(fake)
        empty_depth = np.zeros((120, 160), np.float32)
        R0, t0 = np.eye(3), np.array([0.0, 0.0, 700.0])
        R1, t1 = icp_refinement(empty_depth, syn, R0, t0, K, (160, 120))
        np.testing.assert_array_equal(R1, R0)
        np.testing.assert_array_equal(t1, t0)
