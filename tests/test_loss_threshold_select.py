"""Pin the threshold-select bootstrapped loss to explicit top-k semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from augmentedautoencoder_tpu.models.losses import bootstrapped_reconstruction_loss


def explicit_topk_mean(r, t, ratio):
    b = r.shape[0]
    err = ((r.reshape(b, -1) - t.reshape(b, -1)) ** 2)
    k = err.shape[1] // ratio
    topk, _ = jax.lax.top_k(err, k)
    return float(topk.mean())


def test_matches_explicit_topk():
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    t = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    got = float(bootstrapped_reconstruction_loss(r, t, bootstrap_ratio=4))
    np.testing.assert_allclose(got, explicit_topk_mean(r, t, 4), rtol=1e-6)


def test_tied_zeros_do_not_change_value():
    # reconstruction == target on most pixels: the k-th value is 0 and many
    # elements tie at the threshold; tied ZEROS add nothing to the sum so
    # the loss still equals the top-k mean
    r = jnp.zeros((1, 8, 8, 1))
    t = jnp.zeros((1, 8, 8, 1)).at[0, 0, :4, 0].set(1.0)  # 4 errors of 1.0
    got = float(bootstrapped_reconstruction_loss(r, t, bootstrap_ratio=4))
    # k = 16, top-16 errors = [1,1,1,1, 0 x 12] -> mean 4/16
    np.testing.assert_allclose(got, 4.0 / 16.0, rtol=1e-6)


def test_gradient_flows_only_to_selected():
    rng = np.random.RandomState(1)
    r = jnp.asarray(rng.rand(1, 4, 4, 1).astype(np.float32))
    t = jnp.zeros_like(r)

    g = jax.grad(
        lambda r: bootstrapped_reconstruction_loss(r, t, bootstrap_ratio=4)
    )(r).reshape(-1)
    err = np.asarray(r).reshape(-1) ** 2
    k = err.size // 4
    selected = np.argsort(-err)[:k]
    nonzero = np.nonzero(np.asarray(g))[0]
    assert set(nonzero) == set(selected)


class TestKthLargestBitsearch:
    """ops/kth_value.kth_largest must be bit-identical to lax.top_k's kth."""

    def _check(self, err, k):
        from augmentedautoencoder_tpu.ops.kth_value import kth_largest

        got = np.asarray(kth_largest(jnp.asarray(err), k))
        want = np.asarray(jax.lax.top_k(jnp.asarray(err), k)[0][:, -1:])
        np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))

    def test_random(self):
        rng = np.random.RandomState(0)
        err = (rng.rand(8, 513) ** 2).astype(np.float32)
        for k in (1, 2, 128, 512, 513):
            self._check(err, k)

    def test_ties_and_zeros(self):
        err = np.zeros((3, 64), np.float32)
        err[0, :7] = 1.0                      # ties at 1.0 and at 0.0
        err[1, :] = 0.5                       # all equal
        err[2, ::2] = np.float32(3.14159)     # duplicated value
        for k in (1, 7, 16, 64):
            self._check(err, k)

    def test_denormals_and_extremes(self):
        err = np.array(
            [[0.0, np.float32(1e-42), np.float32(1e-38), 1.0, np.float32(3e38), 2.0]],
            np.float32,
        )
        for k in (1, 3, 6):
            self._check(err, k)

    def test_rejects_non_f32(self):
        from augmentedautoencoder_tpu.ops.kth_value import kth_largest

        import pytest

        with pytest.raises(TypeError, match="float32"):
            kth_largest(jnp.zeros((2, 8), jnp.bfloat16), 2)

    def test_inf_clamps_to_max_finite(self):
        # +inf would break the bisection bracket; it is clamped to the
        # largest finite f32 (documented divergence from lax.top_k)
        from augmentedautoencoder_tpu.ops.kth_value import kth_largest

        err = np.array([[0.0, 1.0, np.inf, 2.0]], np.float32)
        got = np.asarray(kth_largest(jnp.asarray(err), 1))
        assert got[0, 0] == np.finfo(np.float32).max
        got2 = np.asarray(kth_largest(jnp.asarray(err), 2))
        assert got2[0, 0] == 2.0  # finite entries unaffected

    def test_loss_default_equals_sort_mode(self):
        rng = np.random.RandomState(2)
        r = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
        t = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
        a = float(bootstrapped_reconstruction_loss(r, t, 4, topk_mode="exact"))
        b = float(bootstrapped_reconstruction_loss(r, t, 4, topk_mode="sort"))
        assert a == b
