"""Codebook-embed pipeline benchmark: render + crop + transfer + encode
throughput (views/s) for the 92k-view build, isolating the offline stage
from training.

Uses an untrained full-size encoder (embed cost does not depend on weight
values) and the textured asymmetric quality mesh. Knobs mirror the
production path: --lod applies MAX_RENDER_FACES-style decimation, --views
picks the sphere resolution.

Usage: python scripts/bench_embed.py [--views 2562] [--cyclo 36]
         [--lod 0] [--batch 256] [--max_batches 40]
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
    parser.add_argument("--views", type=int, default=2562)
    parser.add_argument("--cyclo", type=int, default=36)
    parser.add_argument("--lod", type=int, default=0)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument(
        "--max_batches", type=int, default=40,
        help="time this many batches (0 = the full sphere)",
    )
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from augmentedautoencoder_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from augmentedautoencoder_tpu.codebook import Codebook
    from augmentedautoencoder_tpu.config import TrainConfig
    from augmentedautoencoder_tpu.data.dataset import Dataset
    from augmentedautoencoder_tpu.factory import make_encode_fn
    from augmentedautoencoder_tpu.models import AAE
    from augmentedautoencoder_tpu.renderer import Renderer
    from augmentedautoencoder_tpu.renderer.procedural import make_textured_asymmetric

    cfg = TrainConfig()
    cfg.min_n_views = args.views
    cfg.num_cyclo = args.cyclo
    cfg.render_dims = (360, 270)
    cfg.k = (540.0, 0, 180, 0, 540.0, 135, 0, 0, 1)
    cfg.radius = 550.0
    cfg.max_render_faces = args.lod

    mesh = make_textured_asymmetric(subdivisions=5, radius=60.0)
    renderer = Renderer(
        [], backend="auto", meshes=[mesh], max_faces=args.lod or None
    )
    dataset = Dataset(".", cfg, renderer=renderer)

    model = AAE.from_config(cfg)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    x0 = jnp.zeros((args.batch, 128, 128, 3), jnp.uint8)
    variables = jax.jit(model.init)(rng, x0.astype(jnp.float32), x0.astype(jnp.float32))
    encode = make_encode_fn(model, variables["params"])

    n_total = dataset.embedding_size
    n = min(n_total, args.max_batches * args.batch) if args.max_batches else n_total
    print(
        f"backend={jax.default_backend()} renderer={renderer.backend} "
        f"faces={len(renderer._meshes[0].faces)} views={n}/{n_total}",
        flush=True,
    )

    # warmup (compile + caches)
    Codebook.build_embedding(
        encode, dataset.render_embedding_image_batch, args.batch,
        batch_size=args.batch, progress=False,
    )

    t0 = time.time()
    emb, bbs = Codebook.build_embedding(
        encode, dataset.render_embedding_image_batch, n,
        batch_size=args.batch, progress=False,
    )
    dt = time.time() - t0
    assert emb.shape[0] == n and np.isfinite(emb).all()

    result = {
        "views_timed": n,
        "faces": len(renderer._meshes[0].faces),
        "lod": args.lod,
        "ms_per_view": round(dt / n * 1000.0, 3),
        "views_per_s": round(n / dt, 1),
        "full_92k_minutes": round(92232 * (dt / n) / 60.0, 2),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
