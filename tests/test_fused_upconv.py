"""Direct unit tests for ops/fused_upconv (the decoder's hot op).

The fused phase-decomposed form must be EXACTLY equivalent (up to f32
summation order) to the naive `nearest-neighbor 2x upsample -> conv KxK
stride 1 SAME` it replaces (reference decoder.py:36-84 builds the decoder
from that pattern) — forward AND backward, since it runs inside the jitted
train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from augmentedautoencoder_tpu.ops.fused_upconv import upsample2x_conv


def naive_upsample2x_conv(x, w, b=None):
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    K = w.shape[0]
    pad = (K - 1) // 2
    y = jax.lax.conv_general_dilated(
        up, w, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b
    return y


class TestFusedUpconv:
    @pytest.mark.parametrize("K", [3, 5])
    @pytest.mark.parametrize("hw", [(4, 4), (5, 7)])
    def test_forward_matches_naive(self, K, hw):
        rng = np.random.RandomState(K * 100 + hw[0])
        H, W = hw
        x = jnp.asarray(rng.randn(2, H, W, 3), jnp.float32)
        w = jnp.asarray(rng.randn(K, K, 3, 5) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(5) * 0.1, jnp.float32)
        got = upsample2x_conv(x, w, b)
        want = naive_upsample2x_conv(x, w, b)
        assert got.shape == (2, 2 * H, 2 * W, 5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_naive(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
        w = jnp.asarray(rng.randn(5, 5, 2, 3) * 0.1, jnp.float32)
        # a non-uniform cotangent so phase/kernel misplacement can't cancel
        cot = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)

        def loss_fused(x, w):
            return jnp.sum(upsample2x_conv(x, w) * cot)

        def loss_naive(x, w):
            return jnp.sum(naive_upsample2x_conv(x, w) * cot)

        gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
        gx_n, gw_n = jax.grad(loss_naive, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_n),
                                   rtol=1e-4, atol=1e-5)

    def test_jit_and_vmap_compose(self):
        rng = np.random.RandomState(1)
        xs = jnp.asarray(rng.randn(3, 1, 4, 4, 2), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 2, 2) * 0.1, jnp.float32)
        out = jax.jit(jax.vmap(lambda x: upsample2x_conv(x, w)))(xs)
        assert out.shape == (3, 1, 8, 8, 2)
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(out[i]),
                np.asarray(naive_upsample2x_conv(xs[i], w)),
                rtol=1e-5, atol=1e-5,
            )


class TestProfiler:
    def test_stage_timer_accumulates_and_survives_exceptions(self):
        from augmentedautoencoder_tpu.training.profiler import StageTimer

        t = StageTimer()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        with pytest.raises(ValueError):
            with t.stage("b"):
                raise ValueError("boom")
        s = t.summary()
        assert s["a"]["count"] == 2
        assert s["b"]["count"] == 1  # exception path still recorded
        assert s["a"]["total_s"] >= 0.0
        assert t.mean("a") == pytest.approx(s["a"]["total_s"] / 2)
        assert t.mean("missing") == 0.0

    def test_trace_writes_profile(self, tmp_path):
        from augmentedautoencoder_tpu.training.profiler import trace

        with trace(str(tmp_path)):
            np.asarray(jnp.arange(8) * 2)
        files = [str(p) for p in tmp_path.rglob("*") if p.is_file()]
        assert files, "jax.profiler trace produced no output"
