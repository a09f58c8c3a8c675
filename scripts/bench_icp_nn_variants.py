"""A/B candidate kernels for the batched ICP nearest-neighbor step.

The ICP while_loop's body is dominated by the NN correspondence search:
(n=24 lanes, N=3000 src x 3000 dst, D=3). The shipped implementation
computes the cross term with a HIGHEST-precision matmul and argmins over
the materialized (n, N, N) distance tensor — ~864 MB of HBM traffic per
iteration. Variants measured here (honest protocol: device-resident
inputs, value materialization, interleaved min-of-rounds):

  matmul   — shipped: |s|^2 - 2 s.d + |d|^2 via dot(HIGHEST), argmin
  diffsq   — broadcast (s-d)^2 sum, argmin (fusable elementwise, no
             cancellation so no HIGHEST needed)
  chunked  — diffsq over dst chunks with a running min (lax.scan), never
             materializes the full (N, N) plane
  whileloop— the shipped full ICP loop (100 iters) for context

    python scripts/bench_icp_nn_variants.py
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


N, D, LANES = 3000, 3, 24


@jax.jit
def nn_matmul(src, dst):
    def one(s, d):
        mu = d.mean(0)
        s = s - mu
        d = d - mu
        cross = jnp.matmul(s, d.T, precision=jax.lax.Precision.HIGHEST)
        d2 = (s * s).sum(1, keepdims=True) - 2.0 * cross + (d * d).sum(1)[None]
        idx = jnp.argmin(d2, axis=1)
        dist = jnp.sqrt(jnp.maximum(
            jnp.take_along_axis(d2, idx[:, None], 1)[:, 0], 0.0))
        return dist, idx
    return jax.vmap(one)(src, dst)


@jax.jit
def nn_diffsq(src, dst):
    def one(s, d):
        d2 = ((s[:, None, :] - d[None, :, :]) ** 2).sum(-1)
        idx = jnp.argmin(d2, axis=1)
        dist = jnp.sqrt(jnp.take_along_axis(d2, idx[:, None], 1)[:, 0])
        return dist, idx
    return jax.vmap(one)(src, dst)


@functools.partial(jax.jit, static_argnames=("chunk",))
def nn_chunked(src, dst, chunk=500):
    def one(s, d):
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
    return jax.vmap(one)(src, dst)


def timeit(fn, *args, rounds=12):
    best = 1e18
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0][:2, :2] if isinstance(out, tuple) else out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main() -> None:
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(LANES, N, D).astype(np.float32) * 50)
    dst = jnp.asarray(rng.randn(LANES, N, D).astype(np.float32) * 50 + 1.0)

    # agreement check (matmul-HIGHEST is the accuracy anchor)
    d0, i0 = [np.asarray(x) for x in nn_matmul(src, dst)]
    res = {}
    for name, fn in [("matmul", nn_matmul), ("diffsq", nn_diffsq),
                     ("chunked", nn_chunked)]:
        d, i = [np.asarray(x) for x in fn(src, dst)]
        agree = float((i == i0).mean())
        derr = float(np.abs(d - d0).max())
        res[name] = {"ms": round(timeit(fn, src, dst), 2),
                     "idx_agree": round(agree, 5),
                     "max_dist_err": round(derr, 5)}

    from augmentedautoencoder_tpu.pose.icp import icp_jax_batch
    A = np.asarray(src)
    B = np.asarray(dst)
    t0 = time.perf_counter()
    icp_jax_batch(jnp.asarray(A), jnp.asarray(B), tolerance=1e-6, no_depth=True)
    res["icp_compile_s"] = round(time.perf_counter() - t0, 1)
    best = 1e18
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(icp_jax_batch(jnp.asarray(A), jnp.asarray(B),
                                 tolerance=1e-6, no_depth=True))
        best = min(best, time.perf_counter() - t0)
    res["icp_full_loop_ms"] = round(best * 1e3, 1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
