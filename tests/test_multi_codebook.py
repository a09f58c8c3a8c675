"""Multi-object codebook serving tests (XLA fallback path; the Pallas
grouped kernel is exercised on real TPU by bench/serving)."""

import jax.numpy as jnp
import numpy as np

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
