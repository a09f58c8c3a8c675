"""A/B: all-stacked vmap serving step vs present-class dispatch (PoseServer).

The round-2 PoseServer stacked every configured class's params and vmapped
the encode + slab einsum — O(configured classes) FLOPs and HBM per frame.
The round-3 design keeps per-class params resident and dispatches one
shared compiled encode + one scalar-prefetch Pallas slab query per class
PRESENT in the frame — O(present classes).

This script measures both at the production scale (30 configured classes,
3 present, 8-det crop batches, 92,232-row codebooks). Results materialize
on the host (the honest tunnel protocol, PERF.md).

    python scripts/bench_serving_present.py [--classes 30] [--present 3]
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
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from augmentedautoencoder_tpu.config import TrainConfig
    from augmentedautoencoder_tpu.models import AAE
    from augmentedautoencoder_tpu.ops.multi_codebook import grouped_codebook_top1

    assert jax.default_backend() == "tpu", "measure on the chip"
    O, B, N, D = args.classes, args.dets, 92232, 128
    N_pad = -(-N // 2048) * 2048

    model = AAE.from_config(TrainConfig())
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B, 128, 128, 3), jnp.float32)
    p0 = jax.jit(model.init)(rng, x0, x0)["params"]
    # distinct per-class param VALUES are irrelevant to timing; distinct
    # BUFFERS matter only for the stacked variant's memory, modeled by the
    # stacked copy below
    present = list(np.linspace(0, O - 1, args.present).astype(int))
    params_by_class = {int(o): p0 for o in present}
    stacked = jax.tree.map(lambda x: jnp.stack([x] * O), p0)
    slab = jax.random.normal(rng, (O, N_pad, D), jnp.float32)
    slab = slab / jnp.linalg.norm(slab, axis=-1, keepdims=True)
    lengths = jnp.full((O,), N, jnp.int32)
    crops_full = jnp.zeros((O, B, 128, 128, 3), jnp.float32)
    crops_b = jnp.zeros((B, 128, 128, 3), jnp.float32)
    jax.block_until_ready((stacked, slab, crops_full))

    @jax.jit
    def step_stacked(sp, crops, slab, lengths):
        def enc(p, x):
            return model.apply({"params": p}, x, method=model.encode)

        z = jax.vmap(enc)(sp, crops)
        zn = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        cos = jnp.einsum("obd,ond->obn", zn, slab)
        col = jnp.arange(cos.shape[-1], dtype=jnp.int32)
        cos = jnp.where(col[None, None, :] < lengths[:, None, None], cos, -2.0)
        idcs = jnp.argmax(cos, axis=-1)
        return idcs.astype(jnp.int32)

    @jax.jit
    def encode(p, x):
        return model.apply({"params": p}, x, method=model.encode)

    obj_dev = {int(o): jnp.asarray(o, jnp.int32) for o in present}
    nval = jnp.asarray(N, jnp.int32)

    def step_present():
        outs = []
        for o in present:
            z = encode(params_by_class[int(o)], crops_b)
            outs.append(grouped_codebook_top1(z, slab, obj_dev[int(o)], nval)[1])
        return outs

    np.asarray(step_stacked(stacked, crops_full, slab, lengths))
    [np.asarray(i) for i in step_present()]

    def timeit(fn):
        best = 1e9
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn()
            for leaf in jax.tree.leaves(r):
                np.asarray(leaf)
            best = min(best, (time.perf_counter() - t0) / args.iters * 1e3)
        return best

    t_stacked = timeit(lambda: step_stacked(stacked, crops_full, slab, lengths))
    t_present = timeit(step_present)
    print(json.dumps({
        "classes": O, "present": args.present, "dets_per_class": B,
        "stacked_ms_per_frame": round(t_stacked, 2),
        "present_ms_per_frame": round(t_present, 2),
        "speedup": round(t_stacked / t_present, 2),
    }))


if __name__ == "__main__":
    main()
