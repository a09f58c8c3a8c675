"""Training tests: fused step convergence, 8-device sharding, checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from augmentedautoencoder_tpu.config import TrainConfig
from augmentedautoencoder_tpu.data import augment_spec as S
from augmentedautoencoder_tpu.data.pipeline import DeviceDataset
from augmentedautoencoder_tpu.models import AAE
from augmentedautoencoder_tpu.parallel import make_mesh
from augmentedautoencoder_tpu.training import (
    CheckpointManager,
    Trainer,
    create_train_state,
    make_train_step,
)

KEY = jax.random.PRNGKey(0)
H = W = 32


def tiny_cfg(**kw):
    cfg = TrainConfig(h=H, w=W, c=3, latent_space_size=8)
    cfg.num_filter = [4, 8]
    cfg.strides = [2, 2]
    cfg.batch_size = 16
    cfg.learning_rate = 1e-3
    cfg.noof_training_imgs = 32
    cfg.code = S.Sequential([S.Sometimes(0.5, S.Multiply(mul=(0.8, 1.2)))])
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def tiny_dataset(cfg):
    rng = np.random.RandomState(0)
    n = cfg.noof_training_imgs
    train_x = rng.randint(0, 255, (n, H, W, 3), dtype=np.uint8)
    train_y = train_x.copy()
    masks = np.zeros((n, H, W), bool)
    bg = rng.randint(0, 255, (4, H, W, 3), dtype=np.uint8)
    return DeviceDataset(cfg, train_x, masks, train_y, bg)


class TestTrainStep:
    def test_loss_decreases(self):
        cfg = tiny_cfg()
        ds = tiny_dataset(cfg)
        model = AAE.from_config(cfg)
        state = create_train_state(KEY, cfg, model)
        step = make_train_step(model, ds, cfg.batch_size)
        first = None
        for _ in range(30):
            state, losses = step(state, KEY)
            if first is None:
                first = float(losses["total_loss"])
        assert float(losses["total_loss"]) < first

    def test_step_deterministic_from_seed(self):
        cfg = tiny_cfg()
        ds = tiny_dataset(cfg)
        model = AAE.from_config(cfg)
        step = make_train_step(model, ds, cfg.batch_size)
        s1 = create_train_state(KEY, cfg, model)
        s2 = create_train_state(KEY, cfg, model)
        s1, l1 = step(s1, KEY)
        s2, l2 = step(s2, KEY)
        assert float(l1["total_loss"]) == float(l2["total_loss"])

    def test_sharded_step_on_8_device_mesh(self):
        assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
        cfg = tiny_cfg()
        ds = tiny_dataset(cfg)
        model = AAE.from_config(cfg)
        mesh = make_mesh()
        assert mesh.devices.size == 8
        state = create_train_state(KEY, cfg, model)
        step = make_train_step(model, ds, cfg.batch_size, mesh=mesh)
        state, losses = step(state, KEY)
        assert np.isfinite(float(losses["total_loss"]))
        # matches the unsharded step bitwise-or-close (same rng path)
        state2 = create_train_state(KEY, cfg, model)
        step2 = make_train_step(model, ds, cfg.batch_size)
        state2, losses2 = step2(state2, KEY)
        np.testing.assert_allclose(
            float(losses["total_loss"]), float(losses2["total_loss"]), rtol=1e-4
        )


class TestShardedEncode:
    def test_encode_over_8_device_mesh_matches_single(self):
        from augmentedautoencoder_tpu.factory import make_encode_fn
        from augmentedautoencoder_tpu.models import AAE

        cfg = tiny_cfg()
        model = AAE.from_config(cfg)
        x = jax.random.uniform(KEY, (16, H, W, 3))
        variables = jax.jit(model.init)(KEY, x, x)
        single = make_encode_fn(model, variables["params"])
        sharded = make_encode_fn(model, variables["params"], mesh=make_mesh())
        np.testing.assert_allclose(
            np.asarray(single(x)), np.asarray(sharded(x)), atol=1e-5
        )


class TestTrainer:
    def test_trainer_runs_and_saves(self, tmp_path):
        cfg = tiny_cfg(num_iter=6, save_interval=3)
        ds = tiny_dataset(cfg)
        saved = []
        trainer = Trainer(cfg, ds, mesh=make_mesh())
        trainer.train(save_hook=lambda step, st: saved.append(step), progress=False)
        assert saved == [3, 6]
        assert int(trainer.state.step) == 6

    def test_gentle_stop(self):
        cfg = tiny_cfg(num_iter=1000, save_interval=1000)
        ds = tiny_dataset(cfg)
        trainer = Trainer(cfg, ds, mesh=None)
        orig_step = trainer.step_fn

        def stopping_step(state, rng):
            trainer.request_stop()
            return orig_step(state, rng)

        trainer.step_fn = stopping_step
        trainer.train(progress=False)
        assert int(trainer.state.step) == 1

    def test_crash_mid_loop_flushes_pending_metrics(self):
        """Deferred metric readback must not lose the scalars closest to a
        crash: an exception inside step_fn still flushes the pending queue
        (ADVICE r2) — those are exactly the metrics that diagnose the crash."""

        class Writer:
            def __init__(self):
                self.rows = []

            def write_scalars(self, step, scalars):
                self.rows.append((step, scalars))

        cfg = tiny_cfg(num_iter=1000, save_interval=1000)
        ds = tiny_dataset(cfg)
        writer = Writer()
        trainer = Trainer(cfg, ds, mesh=None, metric_writer=writer)
        orig_step = trainer.step_fn
        calls = []

        def crashing_step(state, rng):
            if len(calls) >= 25:
                raise RuntimeError("synthetic mid-training crash")
            calls.append(1)
            return orig_step(state, rng)

        trainer.step_fn = crashing_step
        with pytest.raises(RuntimeError, match="synthetic"):
            trainer.train(progress=False, log_every=10)
        # steps 10 and 20 were enqueued but not yet flushed (flush cadence is
        # log_every*50); the finally block must have written them
        assert [s for s, _ in writer.rows] == [10, 20]
        assert all(np.isfinite(list(sc.values())).all() for _, sc in writer.rows)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        cfg = tiny_cfg()
        state = create_train_state(KEY, cfg)
        mgr = CheckpointManager(str(tmp_path / "ckpts"))
        mgr.save_train_state(100, state)
        restored = mgr.restore()
        assert restored is not None
        assert int(restored["step"]) == 100
        tree_a = jax.tree.leaves(state.params)
        tree_b = jax.tree.leaves(restored["params"])
        for a, b in zip(tree_a, tree_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_codebook_in_checkpoint_and_carry_forward(self, tmp_path):
        cfg = tiny_cfg()
        state = create_train_state(KEY, cfg)
        mgr = CheckpointManager(str(tmp_path / "ckpts"))
        mgr.save_train_state(100, state)
        emb = np.random.rand(50, 8).astype(np.float32)
        bbs = np.random.randint(0, 100, (50, 4)).astype(np.int32)
        mgr.add_codebook(emb, bbs)
        restored = mgr.restore()
        np.testing.assert_array_equal(restored["embedding_normalized"], emb)
        np.testing.assert_array_equal(restored["embed_obj_bbs"], bbs)
        # a later train-state save carries the codebook forward
        mgr.save_train_state(200, state)
        r2 = mgr.restore()
        assert int(r2["step"]) == 200
        np.testing.assert_array_equal(r2["embedding_normalized"], emb)

    def test_at_step_resolution(self, tmp_path):
        cfg = tiny_cfg()
        state = create_train_state(KEY, cfg)
        mgr = CheckpointManager(str(tmp_path / "ckpts"))
        for s in (100, 200, 300):
            mgr.save_train_state(s, state)
        assert mgr.latest_step() == 300
        assert mgr.resolve_step(200) == 200
        assert mgr.resolve_step(None) == 300
        assert mgr.resolve_step(99999) is None


class TestNeighborClutter:
    def _mk(self, p):
        from augmentedautoencoder_tpu.data import augment_spec as S

        cfg = tiny_cfg(neighbor_clutter=p)
        cfg.code = S.Sequential([])
        rng = np.random.RandomState(1)
        n = cfg.noof_training_imgs
        # each sample a distinct constant color; object = center square
        train_x = np.zeros((n, H, W, 3), np.uint8)
        for i in range(n):
            train_x[i] = 100 + i
        masks = np.ones((n, H, W), bool)  # True = background
        masks[:, 12:20, 12:20] = False    # object region
        bg = np.zeros((4, H, W, 3), np.uint8)
        return DeviceDataset(cfg, train_x, masks, train_y=train_x.copy(), bg_imgs=bg)

    def test_clutter_pastes_neighbor_pixels(self):
        ds = self._mk(1.0)
        x, _ = ds.sample_batch(KEY, 8)
        x = np.asarray(x)
        bg_region = x[:, :8, :, :]  # far from the center object
        assert (bg_region > 0).any(), "background must contain neighbor pixels"

    def test_off_means_clean_background(self):
        ds = self._mk(0.0)
        x, _ = ds.sample_batch(KEY, 8)
        x = np.asarray(x)
        assert (x[:, :8, :, :] == 0).all()  # zeros bg untouched
        # and the object region carries the sample's own color
        assert (x[:, 12:20, 12:20, :] > 0).all()

    def test_count_knob_default_is_bit_identical(self):
        # explicit defaults must reproduce the single-paste stream exactly
        # (the j=0 paste uses the same 101..104 fold_in key path)
        a = self._mk(0.7)
        b = self._mk(0.7)
        b.cfg.neighbor_clutter_count = 1
        b.cfg.neighbor_clutter_shift = (0.35, 0.9)
        xa, _ = a.sample_batch(KEY, 8)
        xb, _ = b.sample_batch(KEY, 8)
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

    def test_multi_paste_adds_clutter(self):
        one = self._mk(1.0)
        two = self._mk(1.0)
        two.cfg.neighbor_clutter_count = 2
        x1 = np.asarray(one.sample_batch(KEY, 8)[0])
        x2 = np.asarray(two.sample_batch(KEY, 8)[0])
        # count=2 includes the count=1 paste plus an independent second one:
        # strictly more background pixels covered
        n1 = (x1[:, :8, :, :] > 0).sum()
        n2 = (x2[:, :8, :, :] > 0).sum()
        assert n2 > n1

    def test_shift_range_controls_paste_distance(self):
        near = self._mk(1.0)
        # tiny shift keeps the pasted neighbor near the center object, so
        # the far corner stays clean
        near.cfg.neighbor_clutter_shift = (0.05, 0.1)
        x = np.asarray(near.sample_batch(KEY, 8)[0])
        assert (x[:, :4, :4, :] == 0).all()


class TestShardedCodebookQuery:
    def test_row_sharded_top1_matches_replicated(self):
        """HBM-scale-out serving: codebook rows shard across the 8-device
        mesh (parallel.codebook_sharding) and the sharded query returns
        exactly the single-device result; per-device HBM holds N/8 rows."""
        from augmentedautoencoder_tpu.ops.nn_query import (
            cosine_similarity_topk,
            make_cosine_top1_sharded,
        )
        from augmentedautoencoder_tpu.parallel import (
            DATA_AXIS,
            codebook_sharding,
            make_mesh,
        )

        mesh = make_mesh()
        assert mesh.devices.size == 8
        rng = np.random.RandomState(0)
        cb = rng.randn(4096, 32).astype(np.float32)
        cb /= np.linalg.norm(cb, axis=1, keepdims=True)
        z = rng.randn(16, 32).astype(np.float32)

        cb_sharded = jax.device_put(
            cb, codebook_sharding(mesh, shard_rows=True, axis=DATA_AXIS)
        )
        shard_rows = {s.data.shape[0] for s in cb_sharded.addressable_shards}
        assert shard_rows == {4096 // 8}

        query = make_cosine_top1_sharded(mesh, axis=DATA_AXIS)
        vals, idcs = query(jnp.asarray(z), cb_sharded)

        want_vals, want_idcs = cosine_similarity_topk(
            jnp.asarray(z), jnp.asarray(cb), 1
        )
        np.testing.assert_array_equal(np.asarray(idcs), np.asarray(want_idcs)[:, 0])
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(want_vals)[:, 0], rtol=1e-6
        )

    def test_row_sharded_topk_matches_replicated(self):
        """The serving aggregation path at multi-chip scale: row-sharded
        top-k (local per-shard top_k + all_gather of (B,k) candidates +
        re-rank) returns exactly the single-device lax.top_k ranking,
        including candidates that straddle shard boundaries."""
        from augmentedautoencoder_tpu.ops.nn_query import (
            cosine_similarity_topk,
            make_cosine_topk_sharded,
        )
        from augmentedautoencoder_tpu.parallel import (
            DATA_AXIS,
            codebook_sharding,
            make_mesh,
        )

        mesh = make_mesh()
        rng = np.random.RandomState(1)
        cb = rng.randn(4096, 32).astype(np.float32)
        cb /= np.linalg.norm(cb, axis=1, keepdims=True)
        z = rng.randn(16, 32).astype(np.float32)

        cb_sharded = jax.device_put(
            cb, codebook_sharding(mesh, shard_rows=True, axis=DATA_AXIS)
        )
        query = make_cosine_topk_sharded(mesh, k=8, axis=DATA_AXIS)
        vals, idcs = query(jnp.asarray(z), cb_sharded)
        assert vals.shape == (16, 8) and idcs.shape == (16, 8)

        want_vals, want_idcs = cosine_similarity_topk(
            jnp.asarray(z), jnp.asarray(cb), 8
        )
        np.testing.assert_array_equal(np.asarray(idcs), np.asarray(want_idcs))
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(want_vals), rtol=1e-6
        )
        # the top-8 really does straddle shards for at least one query
        # (otherwise the gather/re-rank path isn't being exercised)
        shard = np.asarray(idcs) // (4096 // 8)
        assert (shard.max(axis=1) != shard.min(axis=1)).any()
