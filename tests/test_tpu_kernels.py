"""On-chip Pallas kernel gate (-m tpu): kernels vs their XLA fallbacks on
the REAL TPU.

Interpret-mode tests (test_multi_codebook.py, test_icp_nn.py) prove the
kernel math; they do NOT prove the Mosaic lowering (tiling, memory spaces,
scalar prefetch) — historically where kernel bugs hide. This module runs
each production kernel on the actual chip against the XLA formulation and
is the pre-BENCH gate:

    AAE_TPU_TESTS=1 python -m pytest tests/ -q -m tpu

(AAE_TPU_TESTS=1 stops conftest.py from forcing the virtual-CPU platform;
without a TPU-like backend every test here skips.)
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("AAE_TPU_TESTS", "") != "1"
        or jax.default_backend() != "tpu",
        reason="needs AAE_TPU_TESTS=1 and a real TPU backend",
    ),
]


def _slab(o=3, sizes=(5000, 3000, 4096), d=128, seed=0, dtype=np.float32):
    """Stacked ragged codebooks, rows l2-normalized, padding zero."""
    from augmentedautoencoder_tpu.ops.multi_codebook import stack_codebooks

    rng = np.random.RandomState(seed)
    cbs = []
    for n in sizes:
        cb = rng.randn(n, d).astype(np.float32)
        cb /= np.linalg.norm(cb, axis=1, keepdims=True)
        cbs.append(cb)
    slab, lengths = stack_codebooks(cbs)
    return jnp.asarray(slab.astype(dtype)), lengths


def _expected_topk(z, slab, obj, n_valid, k, stride):
    """The XLA formulation the kernel contracts to match: full masked
    cosine row (same query/slab dtypes) + lax.top_k."""
    from augmentedautoencoder_tpu.ops.nn_query import l2_normalize

    q = l2_normalize(z).astype(slab.dtype)
    cos = jax.lax.dot_general(
        q, slab[obj],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jnp.arange(cos.shape[1], dtype=jnp.int32)[None, :]
    valid = col < n_valid
    if stride > 1:
        valid = jnp.logical_and(valid, col % stride == 0)
    cos = jnp.where(valid, cos, -2.0)
    return jax.lax.top_k(cos, k)


class TestGroupedCodebookOnChip:
    def test_top1_ragged_f32(self):
        from augmentedautoencoder_tpu.ops.multi_codebook import (
            grouped_codebook_top1,
        )

        slab, lengths = _slab()
        rng = np.random.RandomState(1)
        z = jnp.asarray(rng.randn(16, 128).astype(np.float32))
        for obj in range(3):
            v, i = grouped_codebook_top1(
                z, slab, jnp.asarray(obj, jnp.int32),
                jnp.asarray(lengths[obj], jnp.int32),
            )
            ev, ei = _expected_topk(
                z, slab, obj, int(lengths[obj]), k=1, stride=1
            )
            np.testing.assert_array_equal(np.asarray(i), np.asarray(ei[:, 0]))
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(ev[:, 0]), atol=1e-5
            )

    def test_topk8_bf16_stride4_ragged(self):
        """The full serving configuration: k=8, bf16 slab, upright stride,
        ragged lengths — the exact recommended-recipe kernel call."""
        from augmentedautoencoder_tpu.ops.multi_codebook import (
            grouped_codebook_topk,
        )

        slab, lengths = _slab(dtype=jnp.bfloat16)
        rng = np.random.RandomState(2)
        z = jnp.asarray(rng.randn(8, 128).astype(np.float32))
        for obj, stride in ((0, 1), (1, 4), (2, 4)):
            v, i = grouped_codebook_topk(
                z, slab, jnp.asarray(obj, jnp.int32),
                jnp.asarray(lengths[obj], jnp.int32), k=8, stride=stride,
            )
            ev, ei = _expected_topk(
                z, slab, obj, int(lengths[obj]), k=8, stride=stride
            )
            np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))
            np.testing.assert_allclose(np.asarray(v), np.asarray(ev), atol=2e-3)


class TestIcpNNOnChip:
    def test_batched_nn_matches_xla(self):
        from augmentedautoencoder_tpu.ops.icp_nn import (
            batched_nn_pallas,
            batched_nn_xla,
        )

        rng = np.random.RandomState(3)
        src = jnp.asarray(rng.randn(4, 3000, 3).astype(np.float32) * 60.0)
        dst = jnp.asarray(rng.randn(4, 3000, 3).astype(np.float32) * 60.0)
        dist_p, idx_p = batched_nn_pallas(src, dst)
        dist_x, idx_x = batched_nn_xla(src, dst)
        idx_p, idx_x = np.asarray(idx_p), np.asarray(idx_x)
        # the two paths round differently; on random clouds near-ties can
        # flip a correspondence — require >=99.9% agreement and close
        # distances everywhere
        agree = (idx_p == idx_x).mean()
        assert agree >= 0.999, f"correspondence agreement {agree:.4f}"
        np.testing.assert_allclose(
            np.asarray(dist_p), np.asarray(dist_x), rtol=1e-2, atol=5e-3
        )

    def test_icp_batch_pallas_matches_xla_fit(self):
        from augmentedautoencoder_tpu.pose.icp import icp_jax_batch

        rng = np.random.RandomState(4)
        A = rng.randn(3, 1000, 3).astype(np.float32) * 50.0
        ang = 0.05
        R = np.array(
            [
                [np.cos(ang), -np.sin(ang), 0],
                [np.sin(ang), np.cos(ang), 0],
                [0, 0, 1],
            ],
            np.float32,
        )
        B = A @ R.T + np.array([3.0, -2.0, 5.0], np.float32)
        ref = np.asarray(
            icp_jax_batch(jnp.asarray(A), jnp.asarray(B), nn_impl="xla")
        )
        got = np.asarray(
            icp_jax_batch(jnp.asarray(A), jnp.asarray(B), nn_impl="pallas")
        )
        np.testing.assert_allclose(got[:, :16], ref[:, :16], atol=1e-2)

    def test_icp_batch_converges_below_cap_at_camera_distance(self):
        """Round-5 regression: clouds at z ~ 700 mm with an exact rigid
        alignment must converge far below the 100-iteration cap AND
        recover the transform to sub-0.1 mm on the REAL chip. Catches two
        TPU-only failure modes interpret/CPU tests cannot see: the default
        bf16 matmul precision in the per-iteration point transform
        (re-quantizes the cloud by ~1.4 mm at 700 mm -> permanent period-2
        pose oscillation) and the f32 error-delta convergence test that
        never fires (every lane spins to the cap). PERF.md round-5 'ICP
        f32 conditioning'."""
        from augmentedautoencoder_tpu.pose.icp import icp_jax_batch

        rng = np.random.RandomState(5)
        offset = np.array([40.0, -30.0, 700.0], np.float32)
        A = rng.randn(4, 3000, 3).astype(np.float32) * 40.0 + offset
        ang = 0.04
        R = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ],
            np.float32,
        )
        t = np.array([2.0, -1.5, 3.0], np.float32)
        B = A @ R.T + t
        packed = np.asarray(
            icp_jax_batch(jnp.asarray(A), jnp.asarray(B), nn_impl="pallas")
        )
        for lane in packed:
            T = lane[:16].reshape(4, 4)
            iters = int(lane[17])
            assert iters < 50, f"lane spun to {iters} iterations on chip"
            np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
            np.testing.assert_allclose(T[:3, 3], t, atol=0.1)
