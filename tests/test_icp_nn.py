"""Fused batched-NN kernel (ops/icp_nn.py) parity vs the XLA path.

The kernel serves the ICP correspondence step (pose/icp.py
icp_jax_batch(nn_impl='pallas')): per iteration, for every lane's src
point, the index of the closest dst point. These tests run the kernel in
Pallas interpret mode on CPU against `batched_nn_xla` (the exact
per-lane distance-matrix math the production XLA path uses); the on-chip
twin lives in tests/test_tpu_kernels.py (-m tpu).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from augmentedautoencoder_tpu.ops.icp_nn import batched_nn_pallas, batched_nn_xla


def clouds(n, N, seed=0, scale=60.0, z=700.0):
    """Object-radius-scale clouds at camera distance, like real ICP input."""
    rng = np.random.RandomState(seed)
    src = rng.randn(n, N, 3).astype(np.float32) * scale
    dst = rng.randn(n, N, 3).astype(np.float32) * scale
    src[..., 2] += z
    dst[..., 2] += z
    return jnp.asarray(src), jnp.asarray(dst)


class TestBatchedNNPallas:
    def _check(self, src, dst):
        dist_x, idx_x = batched_nn_xla(src, dst)
        for scores in ("sweep", "vpu", "mxu"):  # both in-kernel score formulations
            dist_p, idx_p = batched_nn_pallas(
                src, dst, interpret=True, scores=scores
            )
            np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
            # distances only feed the convergence mean; the kernel's fused
            # |d|^2 - 2 s.d dot cancels differently than XLA's separate
            # terms, so near-zero distances carry a few-micron absolute
            # wobble
            np.testing.assert_allclose(
                np.asarray(dist_p), np.asarray(dist_x), rtol=1e-2, atol=5e-3
            )

    def test_matches_xla_at_production_shape(self):
        # N=3000 (the reference's subsample, icp_utils.py:14) pads to 3072:
        # exercises the padded-dst masking and the multi-tile running min
        self._check(*clouds(3, 3000, seed=1))

    def test_matches_xla_small_cloud_single_tile(self):
        self._check(*clouds(2, 100, seed=2))

    def test_matches_xla_single_lane(self):
        self._check(*clouds(1, 1500, seed=3))

    def test_tie_resolves_to_lowest_dst_index(self):
        # dst has an exact duplicate point; argmin must pick the first,
        # matching jnp.argmin over the full row
        src = np.zeros((1, 8, 3), np.float32)
        dst = np.ones((1, 8, 3), np.float32) * 5.0
        dst[0, 2] = [1.0, 0.0, 0.0]
        dst[0, 6] = [1.0, 0.0, 0.0]  # same distance as index 2
        dist_p, idx_p = batched_nn_pallas(
            jnp.asarray(src), jnp.asarray(dst), interpret=True
        )
        assert np.all(np.asarray(idx_p) == 2)
        np.testing.assert_allclose(np.asarray(dist_p), 1.0, atol=1e-5)

    def test_padded_dst_never_wins(self):
        # N=1025 pads 1023 dst columns; every real dst far, but padding must
        # still never be selected (its score is pinned at 1e30)
        rng = np.random.RandomState(4)
        src = rng.randn(2, 1025, 3).astype(np.float32) * 1000.0
        dst = rng.randn(2, 1025, 3).astype(np.float32) * 1000.0
        dist_p, idx_p = batched_nn_pallas(
            jnp.asarray(src), jnp.asarray(dst), interpret=True
        )
        assert np.asarray(idx_p).max() < 1025
        _, idx_x = batched_nn_xla(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))


class TestBatchedLoopNNSwap:
    def test_icp_batch_pallas_impl_matches_xla_impl(self):
        """The full batched ICP loop with the kernel correspondence step
        must land on the same fits as the XLA step (interpret mode)."""
        import functools
        from unittest import mock
        from augmentedautoencoder_tpu.pose import icp as icp_mod
        from augmentedautoencoder_tpu.pose.icp import icp_jax_batch

        rng = np.random.RandomState(5)
        A = rng.randn(2, 400, 3).astype(np.float32) * 50.0
        ang = 0.04
        R = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ],
            np.float32,
        )
        B = A @ R.T + np.array([2.0, -1.0, 4.0], np.float32)

        ref = np.asarray(
            icp_jax_batch(jnp.asarray(A), jnp.asarray(B), nn_impl="xla")
        )
        try:
            # icp_jax_batch resolves `batched_nn_pallas` from its module
            # globals at trace time; swap in the interpret-mode variant
            # (the kernel passes interpret= explicitly, so mocking
            # pl.pallas_call would be overridden)
            with mock.patch.object(
                icp_mod,
                "batched_nn_pallas",
                functools.partial(batched_nn_pallas, interpret=True),
            ):
                got = np.asarray(
                    icp_jax_batch(jnp.asarray(A), jnp.asarray(B), nn_impl="pallas")
                )
        finally:
            # the interpret-mode trace is cached under nn_impl='pallas';
            # drop it so later callers in this process re-trace for real
            icp_jax_batch.clear_cache()
        # transforms agree tightly; iteration COUNTS may differ between the
        # impls (the 1e-6 convergence check sits below the fused dot's
        # roundoff wobble, so the stopping iteration shifts while the fixed
        # point does not) — assert the fit, not the path length
        np.testing.assert_allclose(got[:, :16], ref[:, :16], atol=1e-3)
        assert np.all(got[:, 17] < 100) and np.all(ref[:, 17] < 100)
