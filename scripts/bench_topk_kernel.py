"""A/B: serving top-k query — fused grouped Pallas kernel vs the XLA path.

The round-4 aggregation recipe (`topk_aggregate 8`, PERF.md) originally
queried via a per-class slab slice + full (B, N) cosine matmul + XLA
lax.top_k. The fused `grouped_codebook_topk` keeps the grouped top-1
kernel's shape: one dispatch, scalar-prefetched object id, per-tile top-k
in VMEM, tiny (B, num_tiles*k) re-rank — the (B, N) matrix never exists
in HBM.

Three arms, interleaved within each round (the only protocol that
survives this VM's clock drift, PERF.md):

  slice_xla  — what serving did before the plane cache: slab[oi] slice
               dispatch + masked matmul + lax.top_k per class
  plane_xla  — cached plane + masked matmul + lax.top_k (the r4 fix
               without the kernel)
  kernel     — fused grouped_codebook_topk

Also times the estimator-path readback fix: full (B, N) host fetch +
argpartition vs the device cosine_topk (B, k) fetch.

    python scripts/bench_topk_kernel.py [--present 3] [--dets 8] [--k 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--classes", type=int, default=30)
    parser.add_argument("--present", type=int, default=3)
    parser.add_argument("--dets", type=int, default=8)
    parser.add_argument("--k", type=int, default=8)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from augmentedautoencoder_tpu.ops.multi_codebook import grouped_codebook_topk
    from augmentedautoencoder_tpu.ops.nn_query import cosine_topk

    assert jax.default_backend() == "tpu", "measure on the chip"
    O, B, N, D, K = args.classes, args.dets, 92232, 128, args.k
    N_pad = -(-N // 2048) * 2048
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = jax.random.PRNGKey(0)
    slab = jax.random.normal(rng, (O, N_pad, D), jnp.float32)
    slab = (slab / jnp.linalg.norm(slab, axis=-1, keepdims=True)).astype(dt)
    z = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32)
    present = list(np.linspace(0, O - 1, args.present).astype(int))
    obj_dev = {o: jnp.asarray(o, jnp.int32) for o in present}
    nval = jnp.asarray(N, jnp.int32)
    planes = {o: slab[o] for o in present}
    jax.block_until_ready((slab, z, list(planes.values())))

    k_static = K

    @jax.jit
    def xla_topk(zq, cb2d, n_valid):
        zn = zq / jnp.maximum(jnp.linalg.norm(zq, axis=-1, keepdims=True), 1e-12)
        cos = jnp.matmul(zn.astype(cb2d.dtype), cb2d.T,
                         preferred_element_type=jnp.float32)
        col = jnp.arange(cos.shape[-1], dtype=jnp.int32)
        cos = jnp.where(col[None, :] < n_valid, cos, -2.0)
        vals, idcs = jax.lax.top_k(cos, k_static)
        return vals, idcs.astype(jnp.int32)

    def frame_slice_xla():
        return [xla_topk(z, slab[o], nval) for o in present]

    def frame_plane_xla():
        return [xla_topk(z, planes[o], nval) for o in present]

    def frame_kernel():
        return [grouped_codebook_topk(z, slab, obj_dev[o], nval, k=K)
                for o in present]

    # estimator-path arms: what reaches the host per query batch
    def est_full_fetch():
        zn = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        cos = np.asarray(jnp.matmul(zn.astype(slab.dtype), planes[present[0]].T,
                                    preferred_element_type=jnp.float32))
        part = np.argpartition(-cos, K - 1, axis=1)[:, :K]
        sims = np.take_along_axis(cos, part, axis=1)
        order = np.argsort(-sims, axis=1)
        return np.take_along_axis(part, order, axis=1)

    def est_device_topk():
        _, idcs = cosine_topk(z, planes[present[0]], k=K)
        return np.asarray(idcs)

    # warm every arm (compiles), then verify agreement once
    ref = [np.asarray(v[1]) for v in frame_plane_xla()]
    for name, fn in (("slice_xla", frame_slice_xla), ("kernel", frame_kernel)):
        got = [np.asarray(v[1]) for v in fn()]
        for a, b in zip(ref, got):
            assert np.array_equal(a, b), f"{name} disagrees with plane_xla"
    assert np.array_equal(est_full_fetch(), est_device_topk())

    arms = {
        "slice_xla": frame_slice_xla,
        "plane_xla": frame_plane_xla,
        "kernel": frame_kernel,
        "est_full_fetch": est_full_fetch,
        "est_device_topk": est_device_topk,
    }
    best = {name: 1e9 for name in arms}
    for _ in range(args.rounds):
        for name, fn in arms.items():  # interleaved within the round
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn()
            for leaf in jax.tree.leaves(r):
                np.asarray(leaf)
            best[name] = min(
                best[name], (time.perf_counter() - t0) / args.iters * 1e3
            )

    out = {
        "classes": O, "present": args.present, "dets": B, "k": K,
        "slab_dtype": args.dtype, "codebook_rows": N,
        "ms_per_frame": {n: round(v, 3) for n, v in best.items()
                         if not n.startswith("est_")},
        "est_ms_per_batch": {n: round(v, 3) for n, v in best.items()
                             if n.startswith("est_")},
        "kernel_speedup_vs_slice": round(best["slice_xla"] / best["kernel"], 2),
        "kernel_speedup_vs_plane": round(best["plane_xla"] / best["kernel"], 2),
        "est_fetch_speedup": round(
            best["est_full_fetch"] / best["est_device_topk"], 2
        ),
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__),
                           "bench_topk_kernel.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
