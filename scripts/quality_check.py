"""End-to-end quality check on real hardware: train an AAE on a procedural
object, build its codebook, and measure rotation recovery on HELD-OUT
renders (random rotations never seen in training or in the codebook, with
random light + random backgrounds + augmentation-free crops).

Reports median/mean geodesic rotation error and the fraction under 20 deg
(the nominal codebook resolution bound for the chosen view count).

Usage: python scripts/quality_check.py [--iters 3000] [--views 642]
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
    parser.add_argument("--iters", type=int, default=3000)
    parser.add_argument("--views", type=int, default=642)
    parser.add_argument("--cyclo", type=int, default=12)
    parser.add_argument("--train_imgs", type=int, default=2000)
    parser.add_argument("--eval_crops", type=int, default=200)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument(
        "--object", default="bumpy", choices=["bumpy", "asym"],
        help="bumpy: near-symmetric perturbed sphere (round-1 object); "
        "asym: textured asymmetric object (the paper's accuracy regime)",
    )
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from augmentedautoencoder_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import configparser

    import jax

    from augmentedautoencoder_tpu.codebook import Codebook
    from augmentedautoencoder_tpu.config import TrainConfig
    from augmentedautoencoder_tpu.config.safe_eval import safe_eval
    from augmentedautoencoder_tpu.data.augment_spec import DSL_CONSTRUCTORS
    from augmentedautoencoder_tpu.data.dataset import Dataset
    from augmentedautoencoder_tpu.data.pipeline import DeviceDataset
    from augmentedautoencoder_tpu.factory import make_encode_fn
    from augmentedautoencoder_tpu.geometry import transform
    from augmentedautoencoder_tpu.renderer import Renderer
    from augmentedautoencoder_tpu.renderer.procedural import make_icosphere
    from augmentedautoencoder_tpu.training import Trainer

    print(f"backend: {jax.default_backend()}", flush=True)

    # ---- config: full 128x128 network, smaller view sphere for speed
    cfg = TrainConfig()
    cfg.min_n_views = args.views
    cfg.num_cyclo = args.cyclo
    cfg.noof_training_imgs = args.train_imgs
    cfg.noof_bg_imgs = 500
    cfg.num_iter = args.iters
    cfg.batch_size = args.batch
    cfg.render_dims = (360, 270)
    cfg.k = (540.0, 0, 180, 0, 540.0, 135, 0, 0, 1)
    cfg.radius = 550.0
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

    rng_np = np.random.RandomState(7)
    if args.object == "asym":
        from augmentedautoencoder_tpu.renderer.procedural import (
            make_textured_asymmetric,
        )

        mesh = make_textured_asymmetric(subdivisions=5, radius=60.0)
    else:
        # round-1 object: near-symmetric bumpy sphere (encoder-limited)
        mesh = make_icosphere(3, 60.0)
        mesh.vertices *= (1.0 + 0.25 * rng_np.rand(len(mesh.vertices), 1))
    renderer = Renderer([], backend="auto", meshes=[mesh])
    print(f"renderer backend: {renderer.backend}", flush=True)

    dataset = Dataset(".", cfg, renderer=renderer)

    # ---- render training data
    t0 = time.time()
    dataset.render_training_images(progress=False)
    print(f"rendered {args.train_imgs} training pairs in {time.time()-t0:.0f}s", flush=True)
    dataset.noof_obj_pixels = np.count_nonzero(dataset.mask_x == 0, axis=(1, 2))
    bg = rng_np.randint(0, 255, (cfg.noof_bg_imgs, 128, 128, 3), dtype=np.uint8)

    device_ds = DeviceDataset(
        cfg, dataset.train_x, dataset.mask_x, dataset.train_y, bg,
        dataset.noof_obj_pixels,
    )

    # ---- train
    trainer = Trainer(cfg, device_ds, seed=0, mesh=None)
    t0 = time.time()
    state = trainer.train(progress=True, log_every=100)
    train_time = time.time() - t0
    print(f"trained {args.iters} iters in {train_time/60:.1f} min", flush=True)

    # ---- embed
    encode = make_encode_fn(trainer.model, state.params, state.batch_stats)
    t0 = time.time()
    embedding, obj_bbs = Codebook.build_embedding(
        encode, dataset.render_embedding_image_batch, dataset.embedding_size,
        batch_size=256, progress=False,
    )
    print(f"embedded {dataset.embedding_size} views in {time.time()-t0:.0f}s", flush=True)
    codebook = Codebook(
        encode, dataset.viewsphere_for_embedding, embedding, obj_bbs,
        num_cyclo=cfg.num_cyclo,
    )

    # ---- held-out evaluation: random rotations, random light, bg composited
    errors = []
    eval_rng = np.random.RandomState(123)
    crops = []
    Rs_gt = []
    for i in range(args.eval_crops):
        R = transform.random_rotation_matrix(eval_rng.rand(3))[:3, :3]
        bgr, depth = renderer.render(
            0, cfg.render_dims[0], cfg.render_dims[1], cfg.K, R,
            np.array([0, 0, cfg.radius]), cfg.clip_near, cfg.clip_far,
            random_light=True,
        )
        from augmentedautoencoder_tpu.data.dataset import extract_square_patch
        from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox

        ys, xs = np.nonzero(depth > 0)
        bb = calc_2d_bbox(xs, ys, cfg.render_dims)
        crop = extract_square_patch(bgr, bb, cfg.pad_factor, resize=(128, 128))
        mask = extract_square_patch(depth, bb, cfg.pad_factor, resize=(128, 128)) == 0
        bg_img = bg[eval_rng.randint(len(bg))]
        crop = np.where(mask[..., None], bg_img, crop)
        crops.append(crop)
        Rs_gt.append(R)

    Rs_est = codebook.nearest_rotation_batch(np.stack(crops).astype(np.float32) / 255.0)
    for R_gt, R_est in zip(Rs_gt, Rs_est):
        errors.append(np.rad2deg(transform.rotation_error(R_gt, R_est)))
    errors = np.asarray(errors)

    result = {
        "object": args.object,
        "iters": args.iters,
        "codebook_size": int(dataset.embedding_size),
        "train_minutes": round(train_time / 60, 1),
        "median_rot_err_deg": round(float(np.median(errors)), 2),
        "mean_rot_err_deg": round(float(errors.mean()), 2),
        "frac_under_20deg": round(float((errors < 20).mean()), 3),
        "frac_under_40deg": round(float((errors < 40).mean()), 3),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
