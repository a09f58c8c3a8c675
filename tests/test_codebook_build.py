"""Codebook.build_embedding streaming/padding behavior."""

import jax.numpy as jnp
import numpy as np

from augmentedautoencoder_tpu.codebook import Codebook


def test_ragged_tail_and_normalization():
    n_total, batch, latent = 37, 16, 8
    rng = np.random.RandomState(0)
    source = rng.rand(n_total, 4, 4, 3).astype(np.float32)
    calls = []

    def render_batch(a, e):
        calls.append((a, e))
        return source[a:e], rng.randint(0, 50, (e - a, 4))

    def encode(xb):
        # batch shape must be the full padded batch every call (jit-stable)
        assert xb.shape[0] == batch
        return xb.reshape(xb.shape[0], -1)[:, :latent] + 0.1

    emb, bbs = Codebook.build_embedding(encode, render_batch, n_total, batch, progress=False)
    assert emb.shape == (n_total, latent)
    assert bbs.shape == (n_total, 4)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
    # ragged tail covered exactly once
    assert calls == [(0, 16), (16, 32), (32, 37)]
    # row content corresponds to its source image (up to normalization)
    raw = source.reshape(n_total, -1)[:, :latent] + 0.1
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    np.testing.assert_allclose(emb, raw, rtol=1e-5)


def test_empty_embedding_raises_clear_error():
    import pytest

    with pytest.raises(ValueError, match="no view batches"):
        Codebook.build_embedding(
            lambda xb: xb, lambda a, e: (None, None), 0, 16, progress=False
        )


def test_match_poses_n_top():
    from augmentedautoencoder_tpu.evaluation.matching import EstimateErrors, match_poses

    ests = [
        EstimateErrors(0, 0, 1, score=s, errors={0: 0.1, 1: 0.1, 2: 0.1})
        for s in (0.9, 0.8, 0.7)
    ]
    # n_top=2: only the two best-scored estimates are considered
    matches = match_poses(ests, threshold=0.5, n_top=2)
    assert len(matches) == 2
    assert {m[1] for m in matches} == {0, 1}  # two distinct GTs taken
    # n_top=-1: all considered
    assert len(match_poses(ests, threshold=0.5, n_top=-1)) == 3
