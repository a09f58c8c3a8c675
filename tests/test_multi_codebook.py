"""Multi-object codebook serving tests (XLA fallback path; the Pallas
grouped kernel is exercised on real TPU by bench/serving)."""

import jax.numpy as jnp
import numpy as np
import pytest

from augmentedautoencoder_tpu.ops.multi_codebook import (
    multi_codebook_top1,
    multi_codebook_top1_xla,
    stack_codebooks,
)


def make_codebooks(sizes, d=32, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for n in sizes:
        cb = rng.randn(n, d).astype(np.float32)
        cb /= np.linalg.norm(cb, axis=1, keepdims=True)
        out.append(cb)
    return out


class TestStacking:
    def test_pad_and_stack(self):
        cbs = make_codebooks([100, 300, 257])
        slab, lengths = stack_codebooks(cbs, tile_n=128)
        assert slab.shape == (3, 384, 32)
        np.testing.assert_array_equal(lengths, [100, 300, 257])
        np.testing.assert_array_equal(slab[0, 100:], 0.0)
        np.testing.assert_array_equal(slab[1, :300], cbs[1])


class TestMixedQuery:
    def test_matches_per_object_numpy(self):
        cbs = make_codebooks([500, 700, 300])
        slab, lengths = stack_codebooks(cbs, tile_n=256)
        rng = np.random.RandomState(1)
        z = rng.randn(12, 32).astype(np.float32)
        obj_ids = rng.randint(0, 3, 12)
        vals, idcs = multi_codebook_top1(
            jnp.asarray(z), jnp.asarray(slab), jnp.asarray(obj_ids),
            jnp.asarray(lengths),
        )
        zn = z / np.linalg.norm(z, axis=1, keepdims=True)
        for k in range(12):
            expect = int(np.argmax(zn[k] @ cbs[obj_ids[k]].T))
            assert int(np.asarray(idcs)[k]) == expect

    def test_ragged_padded_rows_never_win(self):
        # The adversarial case for zero padding: every true cosine is
        # NEGATIVE (codebook rows are -q directions), so an unmasked zero
        # pad row (cos = 0.0) would beat the true best match and return an
        # out-of-range index. Object 0's codebook (40 rows) is far smaller
        # than the slab (object 1 pads it to 128 with tile_n=64).
        d = 32
        rng = np.random.RandomState(3)
        # queries in the positive orthant, codebook rows in the negative
        # orthant: every true cosine is strictly negative by construction
        q = np.abs(rng.randn(6, d)).astype(np.float32) + 0.1
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        cb0 = -np.abs(rng.randn(40, d)).astype(np.float32) - 0.1
        cb0 /= np.linalg.norm(cb0, axis=1, keepdims=True)
        assert (q @ cb0.T < 0).all()
        cb1 = make_codebooks([128], d=d, seed=4)[0]
        slab, lengths = stack_codebooks([cb0, cb1], tile_n=64)
        assert slab.shape[1] > cb0.shape[0]  # object 0 really is padded

        vals, idcs = multi_codebook_top1(
            jnp.asarray(q), jnp.asarray(slab),
            jnp.zeros(6, jnp.int32), jnp.asarray(lengths),
        )
        expect = np.argmax(q @ cb0.T, axis=1)
        np.testing.assert_array_equal(np.asarray(idcs), expect)
        assert (np.asarray(vals) < 0).all()  # the winning match really is negative

        # same contract on the explicit XLA fallback
        vals2, idcs2 = multi_codebook_top1_xla(
            jnp.asarray(q), jnp.asarray(slab),
            jnp.zeros(6, jnp.int32), jnp.asarray(lengths),
        )
        np.testing.assert_array_equal(np.asarray(idcs2), expect)

    def test_unmasked_fallback_kept_for_full_slabs(self):
        # equal-size codebooks that exactly fill the slab need no lengths
        cbs = make_codebooks([64, 64])
        slab, lengths = stack_codebooks(cbs, tile_n=64)
        assert slab.shape[1] == 64
        z = np.random.RandomState(2).randn(4, 32).astype(np.float32)
        vals, idcs = multi_codebook_top1_xla(
            jnp.asarray(z), jnp.asarray(slab), jnp.asarray([0, 1, 0, 1])
        )
        assert (np.asarray(idcs) < 64).all()


class TestGroupedTopK:
    """Fused grouped top-k kernel (interpret mode) vs the full-matrix
    lax.top_k contract the serving XLA path implements."""

    @staticmethod
    def _run_kernel(z, slab, obj, n_valid, k, stride=1, tile_n=256):
        from functools import partial
        from unittest import mock

        import jax
        from jax.experimental import pallas as pl

        from augmentedautoencoder_tpu.ops.multi_codebook import (
            grouped_codebook_topk,
        )

        orig = pl.pallas_call
        with jax.disable_jit():
            with mock.patch.object(pl, "pallas_call", partial(orig, interpret=True)):
                return grouped_codebook_topk.__wrapped__(
                    jnp.asarray(z),
                    slab,
                    jnp.asarray(obj, jnp.int32),
                    jnp.asarray(n_valid, jnp.int32),
                    k=k,
                    stride=stride,
                    tile_n=tile_n,
                )

    @staticmethod
    def _expect(z, cb, k, stride=1):
        zn = z / np.linalg.norm(z, axis=1, keepdims=True)
        cos = zn @ cb.T
        if stride > 1:
            cos = cos[:, ::stride]
        order = np.argsort(-cos, axis=1, kind="stable")[:, :k]
        vals = np.take_along_axis(cos, order, axis=1)
        return vals, order * stride

    def test_matches_full_topk_across_tiles(self):
        # 3 tiles of 256 with ragged true length — candidates must be
        # collected across tile boundaries and padded rows never rank.
        cbs = make_codebooks([700, 300])
        slab, lengths = stack_codebooks(cbs, tile_n=256)
        rng = np.random.RandomState(7)
        z = rng.randn(5, 32).astype(np.float32)
        for obj in (0, 1):
            vals, idcs = self._run_kernel(
                z, jnp.asarray(slab), obj, lengths[obj], k=8
            )
            evals, eidcs = self._expect(z, cbs[obj], k=8)
            np.testing.assert_array_equal(np.asarray(idcs), eidcs)
            np.testing.assert_allclose(np.asarray(vals), evals, atol=1e-5)
            # sorted best-first, the lax.top_k contract
            assert (np.diff(np.asarray(vals), axis=1) <= 1e-7).all()

    def test_upright_stride_masking(self):
        # stride masking == the XLA path's cos[:, ::stride] candidate set
        # with already-global indices (serving upright semantics).
        cbs = make_codebooks([512], d=32, seed=9)
        slab, lengths = stack_codebooks(cbs, tile_n=128)
        z = np.random.RandomState(11).randn(4, 32).astype(np.float32)
        vals, idcs = self._run_kernel(
            z, jnp.asarray(slab), 0, lengths[0], k=4, stride=8, tile_n=128
        )
        evals, eidcs = self._expect(z, cbs[0], k=4, stride=8)
        np.testing.assert_array_equal(np.asarray(idcs), eidcs)
        np.testing.assert_allclose(np.asarray(vals), evals, atol=1e-5)
        assert (np.asarray(idcs) % 8 == 0).all()

    def test_bf16_slab_f32_ranking(self):
        cbs = make_codebooks([300, 200])
        slab, lengths = stack_codebooks(cbs, tile_n=256)
        z = np.random.RandomState(13).randn(6, 32).astype(np.float32)
        vals, idcs = self._run_kernel(
            z, jnp.asarray(slab, jnp.bfloat16), 0, lengths[0], k=3
        )
        assert vals.dtype == jnp.float32
        _, eidcs = self._expect(z, cbs[0], k=3)
        np.testing.assert_array_equal(np.asarray(idcs), eidcs)

    def test_k_exceeds_single_tile_survivors(self):
        # k at the validated cap (32), larger than any one tile's valid
        # candidate count (tiles of 16): the final merge must pull from
        # multiple tiles (and sentinels never rank while real candidates
        # remain).
        cbs = make_codebooks([104, 64])  # object 0: 104 valid over 7 tiles
        slab, lengths = stack_codebooks(cbs, tile_n=16)
        z = np.random.RandomState(17).randn(3, 32).astype(np.float32)
        vals, idcs = self._run_kernel(
            z, jnp.asarray(slab), 0, lengths[0], k=32, tile_n=16
        )
        evals, eidcs = self._expect(z, cbs[0], k=32)
        np.testing.assert_array_equal(np.asarray(idcs), eidcs)
        assert (np.asarray(vals) > -2.0).all()  # all real candidates

    def test_k_above_cap_raises(self):
        # the kernel's per-tile cost is O(k) VPU passes; k > 32 is
        # unvalidated and must fail loudly, not run slowly
        cbs = make_codebooks([300])
        slab, lengths = stack_codebooks(cbs, tile_n=256)
        z = np.random.RandomState(19).randn(2, 32).astype(np.float32)
        with pytest.raises(ValueError, match="1 <= k <= 32"):
            self._run_kernel(z, jnp.asarray(slab), 0, lengths[0], k=33)


class TestBf16Slab:
    def test_grouped_kernel_interpret_bf16(self):
        """bf16 serving slab through the scalar-prefetch kernel (interpret
        mode): f32 accumulation preserved, ranking matches the f32 slab on
        well-separated rows."""
        from functools import partial
        from unittest import mock

        import jax
        from jax.experimental import pallas as pl

        from augmentedautoencoder_tpu.ops.multi_codebook import (
            grouped_codebook_top1,
            stack_codebooks,
        )

        cbs = make_codebooks([300, 200])
        slab, lengths = stack_codebooks(cbs, tile_n=256)
        rng = np.random.RandomState(5)
        z = rng.randn(6, 32).astype(np.float32)

        orig = pl.pallas_call
        with jax.disable_jit():
            with mock.patch.object(pl, "pallas_call", partial(orig, interpret=True)):
                vals, idcs = grouped_codebook_top1.__wrapped__(
                    jnp.asarray(z),
                    jnp.asarray(slab, jnp.bfloat16),
                    jnp.asarray(0, jnp.int32),
                    jnp.asarray(lengths[0], jnp.int32),
                    tile_n=256,
                )
        assert vals.dtype == jnp.float32
        zn = z / np.linalg.norm(z, axis=1, keepdims=True)
        expect = np.argmax(zn @ cbs[0].T, axis=1)
        np.testing.assert_array_equal(np.asarray(idcs), expect)
