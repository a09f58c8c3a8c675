"""Reproducible train-step benchmark: ms/step and samples/s across batch
sizes and precisions on the current device.

Synthetic on-device data (no rendering) — this measures exactly the fused
jitted step (sample+augment+fwd+loss+bwd+adam), the same executable
`Trainer.train` dispatches (reference cadence: auto_pose/ae/ae_train.py:126-140).

Honest timing through the tunnel: steps chain on donated state, so fetching
a loss value from the LAST step (np.asarray) bounds the whole chain;
per-step block_until_ready is a lie through the async tunnel (see PERF.md).

Usage: python scripts/bench_train_step.py [--batches 64,128,256]
       [--precisions float32,bfloat16] [--steps 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_one(batch: int, precision: str, steps: int, warmup: int = 10) -> dict:
    import jax

    from augmentedautoencoder_tpu.config import TrainConfig
    from augmentedautoencoder_tpu.config.safe_eval import safe_eval
    from augmentedautoencoder_tpu.data.augment_spec import DSL_CONSTRUCTORS
    from augmentedautoencoder_tpu.data.pipeline import DeviceDataset
    from augmentedautoencoder_tpu.training import Trainer

    cfg = TrainConfig()
    cfg.batch_size = batch
    cfg.precision = precision
    cfg.noof_training_imgs = 1000
    cfg.noof_bg_imgs = 500
    import configparser

    template = configparser.ConfigParser(inline_comment_prefixes=("#",))
    template.read_string(
        open(
            os.path.join(
                os.path.dirname(__file__), "..",
                "augmentedautoencoder_tpu", "cfg_templates", "train_template.cfg",
            )
        ).read()
    )
    cfg.code = safe_eval(template.get("Augmentation", "CODE"), callables=DSL_CONSTRUCTORS)

    rng = np.random.RandomState(0)
    n = cfg.noof_training_imgs
    train_x = rng.randint(0, 255, (n, 128, 128, 3), dtype=np.uint8)
    mask_x = rng.rand(n, 128, 128) > 0.5
    train_y = rng.randint(0, 255, (n, 128, 128, 3), dtype=np.uint8)
    bg = rng.randint(0, 255, (cfg.noof_bg_imgs, 128, 128, 3), dtype=np.uint8)
    ds = DeviceDataset(cfg, train_x, mask_x, train_y, bg)

    trainer = Trainer(cfg, ds, seed=0, mesh=None)
    state = trainer.state
    for _ in range(warmup):
        state, losses = trainer.step_fn(state, trainer.rng)
    np.asarray(losses["total_loss"])  # drain the warmup chain

    t0 = time.time()
    for _ in range(steps):
        state, losses = trainer.step_fn(state, trainer.rng)
    np.asarray(losses["total_loss"])  # bounds the whole dependent chain
    dt = time.time() - t0

    ms = dt / steps * 1000.0
    return {
        "batch": batch,
        "precision": precision,
        "ms_per_step": round(ms, 2),
        "samples_per_s": round(batch / (ms / 1000.0), 1),
        "it_per_s": round(1000.0 / ms, 1),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="64,128,256")
    parser.add_argument("--precisions", default="float32,bfloat16")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from augmentedautoencoder_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    results = []
    for precision in args.precisions.split(","):
        for batch in (int(b) for b in args.batches.split(",")):
            r = bench_one(batch, precision, args.steps)
            print(json.dumps(r), flush=True)
            results.append(r)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
