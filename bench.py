"""Headline benchmark: crops/sec/chip for encode + codebook nearest-neighbor.

The BASELINE.json north-star metric: a 128x128x3 crop through the full-size
AAE encoder (filters [128,256,512,512]) into the fused l2-normalize ->
92,232x128 codebook matmul -> argmax, per chip. The whole query path is one
jit dispatch per batch (the reference runs one TF session.run per crop,
auto_pose/ae/codebook.py:55-75).

`vs_baseline` is measured against an estimated 500 crops/s for the reference
TF1-GPU path (4-conv encoder + 92k matmul + host argmax per crop on a 2018
consumer GPU; the repo commits no figure — BASELINE.md). The rebuild target
is >= 10x that on one v5e chip, i.e. vs_baseline >= 10.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_CROPS_PER_SEC = 500.0  # estimated TF1-GPU reference throughput
BATCH = 64
N_VIEWS = 92232
LATENT = 128


def main() -> None:
    import jax
    import jax.numpy as jnp

    from augmentedautoencoder_tpu.config import TrainConfig
    from augmentedautoencoder_tpu.models import AAE
    from augmentedautoencoder_tpu.ops import cosine_top1_pallas
    from augmentedautoencoder_tpu.ops.nn_query import cosine_similarity_topk

    cfg = TrainConfig()
    model = AAE.from_config(cfg)

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, x, x)
    params = variables["params"]

    npr = np.random.RandomState(0)
    codebook = npr.randn(N_VIEWS, LATENT).astype(np.float32)
    codebook /= np.linalg.norm(codebook, axis=1, keepdims=True)
    codebook = jax.device_put(codebook)

    on_tpu = jax.default_backend() == "tpu"

    @jax.jit
    def encode_and_query(params, x, codebook):
        z = model.apply({"params": params}, x, method=model.encode)
        if on_tpu:
            return cosine_top1_pallas(z, codebook)
        vals, idcs = cosine_similarity_topk(z, codebook, 1)
        return vals[:, 0], idcs[:, 0]

    # warmup / compile
    vals, idcs = encode_and_query(params, x, codebook)
    jax.block_until_ready((vals, idcs))

    n_iters = 50 if on_tpu else 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        vals, idcs = encode_and_query(params, x, codebook)
    jax.block_until_ready((vals, idcs))
    dt = time.perf_counter() - t0

    crops_per_sec = BATCH * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "encode+codebook-NN crops/sec/chip",
                "value": round(crops_per_sec, 1),
                "unit": "crops/s",
                "vs_baseline": round(crops_per_sec / BASELINE_CROPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
