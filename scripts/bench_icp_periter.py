"""Scan-isolated per-iteration cost of ICP body candidates (PERF.md
two-scan-length protocol: time S iterations of a jitted lax.scan at two
lengths; the slope is the per-iteration device cost, dispatch cancels).

    python scripts/bench_icp_periter.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, LANES = 3000, 3, 24


def nn_matmul(s, d):
    mu = d.mean(0)
    s = s - mu
    d = d - mu
    cross = jnp.matmul(s, d.T, precision=jax.lax.Precision.HIGHEST)
    d2 = (s * s).sum(1, keepdims=True) - 2.0 * cross + (d * d).sum(1)[None]
    idx = jnp.argmin(d2, axis=1)
    dist = jnp.sqrt(jnp.maximum(
        jnp.take_along_axis(d2, idx[:, None], 1)[:, 0], 0.0))
    return dist, idx


def nn_diffsq(s, d):
    d2 = ((s[:, None, :] - d[None, :, :]) ** 2).sum(-1)
    idx = jnp.argmin(d2, axis=1)
    dist = jnp.sqrt(jnp.take_along_axis(d2, idx[:, None], 1)[:, 0])
    return dist, idx


def nn_chunked(s, d, chunk=500):
    n_chunks = d.shape[0] // chunk
    d_chunks = d.reshape(n_chunks, chunk, D)

    def body(carry, dc_i):
        best_d2, best_idx = carry
        dc, i0 = dc_i
        d2 = ((s[:, None, :] - dc[None, :, :]) ** 2).sum(-1)
        loc = jnp.argmin(d2, axis=1)
        locd = jnp.take_along_axis(d2, loc[:, None], 1)[:, 0]
        upd = locd < best_d2
        return (jnp.where(upd, locd, best_d2),
                jnp.where(upd, i0 + loc, best_idx)), None

    i0s = jnp.arange(n_chunks) * chunk
    (bd, bi), _ = jax.lax.scan(
        body, (jnp.full(s.shape[0], jnp.inf), jnp.zeros(s.shape[0], jnp.int32)),
        (d_chunks, i0s))
    return jnp.sqrt(bd), bi


def make_scan(nn_fn, with_fit=True):
    from augmentedautoencoder_tpu.pose.icp import best_fit_transform_jax

    @functools.partial(jax.jit, static_argnames=("S",))
    def run(src, dst, S):
        def one_lane(s0, d):
            def body(s, _):
                dist, idx = nn_fn(s, d)
                if with_fit:
                    T = best_fit_transform_jax(s, d[idx])
                    s = s @ T[:3, :3].T + T[:3, 3]
                    return s, dist.mean()
                return s + 1e-7 * dist.mean(), dist.mean()
            s_fin, errs = jax.lax.scan(body, s0, None, length=S)
            return errs[-1]
        return jax.vmap(one_lane)(src, dst)
    return run


def slope_ms(run, src, dst, s_lo=10, s_hi=60, rounds=4):
    for S in (s_lo, s_hi):
        np.asarray(run(src, dst, S))  # compile
    t = {}
    for S in (s_lo, s_hi):
        best = 1e18
        for _ in range(rounds):
            t0 = time.perf_counter()
            np.asarray(run(src, dst, S))
            best = min(best, time.perf_counter() - t0)
        t[S] = best
    return (t[s_hi] - t[s_lo]) / (s_hi - s_lo) * 1e3


def main() -> None:
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(LANES, N, D).astype(np.float32) * 50)
    dst = jnp.asarray(rng.randn(LANES, N, D).astype(np.float32) * 50 + 1.0)

    res = {}
    for name, fn in [("matmul", nn_matmul), ("diffsq", nn_diffsq),
                     ("chunked", nn_chunked)]:
        res[name + "_nn_only_ms_per_iter"] = round(
            slope_ms(make_scan(fn, with_fit=False), src, dst), 3)
        res[name + "_full_body_ms_per_iter"] = round(
            slope_ms(make_scan(fn, with_fit=True), src, dst), 3)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
