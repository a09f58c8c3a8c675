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
