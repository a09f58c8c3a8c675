"""Production-scale quality run through the REAL CLI surface:

  ae_init_workspace -> ae_train (30k iters) -> ae_embed (92k codebook)
  -> synthetic BOP test scenes at held-out rotations -> ae_eval
  (vsd/re/te/add + recall scoring + plots + sixd17 per-view ymls)

on the textured asymmetric object (the paper's accuracy regime). This is
the round-2 BASELINE.json quality artifact: unlike quality_check.py (which
drives the library API), every stage here goes through the workspace CLIs
the reference user would run (reference flow: ae_train.py -> ae_embed.py ->
eval/ae_eval.py).

Usage: python scripts/quality_eval_vsd.py [--iters 30000] [--views 2562]
         [--cyclo 36] [--test_imgs 50] [--workspace DIR] [--skip_train]
         [--out scripts/quality_vsd_asym.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_CFG = """
[Paths]
MODEL_PATH: {model_path}
BACKGROUND_IMAGES_GLOB: {bg_glob}

[Dataset]
MODEL: reconst
H: 128
W: 128
C: 3
RADIUS: 550
RENDER_DIMS: (360, 270)
K: [540, 0, 180, 0, 540, 135, 0, 0, 1]
VERTEX_SCALE: 1
ANTIALIASING: 1
PAD_FACTOR: 1.2
CLIP_NEAR: 10
CLIP_FAR: 10000
NOOF_TRAINING_IMGS: {train_imgs}
NOOF_BG_IMGS: 500

[Augmentation]
REALISTIC_OCCLUSION: {realistic_occlusion}
SQUARE_OCCLUSION: {square_occlusion}
NEIGHBOR_CLUTTER: {neighbor_clutter}
NEIGHBOR_CLUTTER_COUNT: {neighbor_clutter_count}
MAX_REL_OFFSET: 0.2
CODE: Sequential([
    Sometimes(0.5, Add((-25, 25), per_channel=0.3)),
    Sometimes(0.4, GaussianBlur(np.random.rand())),
    Sometimes(0.5, Multiply((0.6, 1.4), per_channel=0.5)),
    Sometimes(0.5, Multiply((0.6, 1.4))),
    Sometimes(0.5, ContrastNormalization((0.5, 2.2), per_channel=0.3))
    ], random_order=False)

[Embedding]
EMBED_BB: True
MIN_N_VIEWS: {views}
NUM_CYCLO: {cyclo}

[Network]
BATCH_NORMALIZATION: {batch_norm}
AUXILIARY_MASK: {aux_mask}
VARIATIONAL: {variational}
LOSS: L2
BOOTSTRAP_RATIO: 4
NORM_REGULARIZE: 0
LATENT_SPACE_SIZE: 128
NUM_FILTER: [128, 256, 512, 512]
STRIDES: [2, 2, 2, 2]
KERNEL_SIZE_ENCODER: 5
KERNEL_SIZE_DECODER: 5

[Training]
OPTIMIZER: Adam
NUM_ITER: {iters}
BATCH_SIZE: 64
LEARNING_RATE: 2e-4
SAVE_INTERVAL: 10000
PRECISION: {precision}

[Queue]
NUM_THREADS: 10
QUEUE_SIZE: 50
"""

EVAL_CFG = """
[METHOD]
METHOD: aae

[DATA]
DATASET: asym_synth
DATASET_PATH: {dataset_path}
OBJ_ID: 1
SCENES: [1]
CAM_TYPE:

[BBOXES]
ESTIMATE_BBS: False
SINGLE_INSTANCE: {single_instance}
GT_MASKS: {gt_masks}
ICP: {icp}
TOPK_AGGREGATE: {topk_aggregate}
TTA_CROPS: {tta_crops}
TOPK_RESCORE: {topk_rescore}
ICP_FRAME_ACCURATE: {icp_frame}

[EVALUATION]
COMPUTE_ERRORS: True
EVALUATE_ERRORS: True

[METRIC]
ERROR_TYPES: ['vsd', 're', 'te', 'add']
VSD_DELTA: 15
VSD_TAU: 20
VSD_COST: step
ERROR_THRESH: 0.3
ERROR_THRESH_DEG: 15
ERROR_THRESH_MM: 100
TOP_N_EVAL: {top_n_eval}
TOP_N: 1

[PLOT]
COMPUTE_PLOTS: True
"""

W, H = 360, 270
K = np.array([[540.0, 0, 180], [0, 540.0, 135], [0, 0, 1]])
RADIUS = 550.0


def run_cli(module, argv) -> None:
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        module.main()
    finally:
        sys.argv = old


def make_scenes(
    dataset_root: str, model_path: str, n: int, seed: int = 123, instances: int = 1
) -> None:
    """Render held-out random rotations into a BOP-format scene dir.

    instances > 1 places several copies at lateral offsets and composites
    them by z-buffer — the multi-instance regime the batched ICP/estimator
    path is built for."""
    import cv2

    from augmentedautoencoder_tpu.geometry import transform
    from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox
    from augmentedautoencoder_tpu.renderer import Renderer
    from augmentedautoencoder_tpu.renderer.mesh import load_mesh

    mesh = load_mesh(model_path)
    renderer = Renderer([], backend="auto", meshes=[mesh])
    scene_dir = os.path.join(dataset_root, "test", "000001")
    os.makedirs(os.path.join(scene_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "depth"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "mask_visib"), exist_ok=True)
    rng = np.random.RandomState(seed)
    # The renderer's random_light path draws from the GLOBAL np.random
    # (facade._sample_light, matching the reference's meshrenderer); seed it
    # here so the scene set is bit-reproducible — /tmp wipes between sessions
    # destroyed the shared A/B scene set twice (rounds 3→4).
    np.random.seed(seed)
    # lateral placements that keep every instance fully in frame
    offsets = np.linspace(-115.0, 115.0, instances) if instances > 1 else [0.0]
    gt, cam, gt_info = {}, {}, {}
    for i in range(n):
        bgr = np.zeros((H, W, 3), np.uint8)
        depth = np.zeros((H, W), np.float32)
        entries = []
        inst_depths = []
        for m, tx in enumerate(offsets):
            R = transform.random_rotation_matrix(rng.rand(3))[:3, :3]
            ty = float(rng.uniform(-25.0, 25.0)) if instances > 1 else 0.0
            t = np.array([float(tx), ty, RADIUS])
            bgr_m, depth_m = renderer.render(
                0, W, H, K, R, t, 10, 10000, random_light=True
            )
            # z-buffer composite
            vis = (depth_m > 0) & ((depth == 0) | (depth_m < depth))
            bgr[vis] = bgr_m[vis]
            depth[vis] = depth_m[vis]
            inst_depths.append(depth_m)
            entries.append(
                {"obj_id": 1, "cam_R_m2c": R.ravel().tolist(), "cam_t_m2c": t.tolist()}
            )
        # BOP mask_visib + scene_gt_info: instance m's visible pixels are
        # those it owns in the final z-buffer (values copied verbatim, so
        # equality is exact); visib_fract/bboxes derive from the same masks
        infos = []
        for m, depth_m in enumerate(inst_depths):
            vis_m = (depth_m > 0) & (depth == depth_m)
            cv2.imwrite(
                os.path.join(scene_dir, "mask_visib", f"{i:06d}_{m:06d}.png"),
                vis_m.astype(np.uint8) * 255,
            )
            info = {"visib_fract": float(vis_m.sum() / max((depth_m > 0).sum(), 1))}
            for key, mask_m in (("bbox_obj", depth_m > 0), ("bbox_visib", vis_m)):
                ys, xs = np.nonzero(mask_m)
                info[key] = (
                    [int(xs.min()), int(ys.min()),
                     int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)]
                    if len(xs) else None
                )
            infos.append(info)
        gt_info[str(i)] = infos
        cv2.imwrite(os.path.join(scene_dir, "rgb", f"{i:06d}.png"), bgr)
        cv2.imwrite(
            os.path.join(scene_dir, "depth", f"{i:06d}.png"),
            np.round(depth).astype(np.uint16),
        )
        gt[str(i)] = entries
        cam[str(i)] = {"cam_K": K.ravel().tolist(), "depth_scale": 1.0}
    with open(os.path.join(scene_dir, "scene_gt.json"), "w") as fh:
        json.dump(gt, fh)
    with open(os.path.join(scene_dir, "scene_camera.json"), "w") as fh:
        json.dump(cam, fh)
    with open(os.path.join(scene_dir, "scene_gt_info.json"), "w") as fh:
        json.dump(gt_info, fh)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=30000)
    parser.add_argument("--views", type=int, default=2562)
    parser.add_argument("--cyclo", type=int, default=36)
    parser.add_argument("--train_imgs", type=int, default=2000)
    parser.add_argument("--test_imgs", type=int, default=50)
    parser.add_argument("--workspace", default="/tmp/aae_vsd_ws")
    parser.add_argument("--skip_train", action="store_true",
                        help="reuse an existing trained+embedded workspace")
    parser.add_argument("--icp", action="store_true")
    parser.add_argument("--precision", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--clutter", type=float, default=0.0,
                        help="NEIGHBOR_CLUTTER probability: paste other "
                             "samples' renders into training backgrounds")
    parser.add_argument("--clutter_count", type=int, default=1,
                        help="NEIGHBOR_CLUTTER_COUNT: independent pastes "
                             "per image (sweep for crowded-scene training)")
    parser.add_argument("--occlusion", action="store_true",
                        help="train with SQUARE_OCCLUSION (the reference's "
                             "clutter/occlusion robustness recipe)")
    parser.add_argument("--realistic_occlusion", type=float, default=0.0,
                        help="REALISTIC_OCCLUSION max-occlusion fraction "
                             "(mask-bank pastes; synthesized bank when no "
                             ".bin ships)")
    parser.add_argument("--aux_mask", action="store_true",
                        help="AUXILIARY_MASK: train the decoder's 1-channel "
                             "mask head alongside the reconstruction "
                             "(reference decoder.py:68-75,134-142)")
    parser.add_argument("--variational", type=float, default=0.0,
                        help="VARIATIONAL: KL weight for the VAE head "
                             "(reference encoder.py:70-94); 0 disables")
    parser.add_argument("--batch_norm", action="store_true",
                        help="BATCH_NORMALIZATION in encoder/decoder convs "
                             "(reference encoder.py:45-56)")
    parser.add_argument("--instances", type=int, default=1,
                        help="object instances per image (multi-instance "
                             "regime: batched per-frame estimation + ICP)")
    parser.add_argument("--topk_aggregate", type=int, default=1,
                        help="blend the top-k codebook matches (quaternion "
                             "+ rendered-bbox averaging); 1 = plain argmax")
    parser.add_argument("--tta_crops", type=int, default=1,
                        help="average cosine votes over n jittered crops "
                             "per detection; 1 = single crop")
    parser.add_argument("--icp_frame", action="store_true",
                        help="frame-accurate ICP cloud geometry (render the "
                             "synthetic depth at the estimated lateral "
                             "position; the reference renders centered)")
    parser.add_argument("--topk_rescore", type=int, default=1,
                        help="depth re-scoring: expand the top-k codebook "
                             "matches into 6D hypotheses, keep the one whose "
                             "rendered depth best matches the observed depth "
                             "(pose/rescore.py); 1 = plain argmax")
    parser.add_argument("--gt_masks", action="store_true",
                        help="zero the background with each instance's "
                             "mask_visib before cropping (the reference "
                             "BOP driver's estimation regime)")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from augmentedautoencoder_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import cv2

    from augmentedautoencoder_tpu.cli import ae_embed, ae_eval, ae_init_workspace, ae_train
    from augmentedautoencoder_tpu.renderer.procedural import (
        make_textured_asymmetric,
        save_ply,
    )

    ws = os.path.abspath(args.workspace)
    os.environ["AE_WORKSPACE_PATH"] = ws
    os.makedirs(ws, exist_ok=True)
    model_path = os.path.join(ws, "asym.ply")
    bg_dir = os.path.join(ws, "bg")

    timings = {}
    if not args.skip_train:
        run_cli(ae_init_workspace, [])
        save_ply(make_textured_asymmetric(subdivisions=5, radius=60.0), model_path)
        os.makedirs(bg_dir, exist_ok=True)
        rng = np.random.RandomState(0)
        for i in range(500):
            cv2.imwrite(
                os.path.join(bg_dir, f"bg_{i:03d}.jpg"),
                rng.randint(0, 255, (128, 128, 3), np.uint8),
            )
        with open(os.path.join(ws, "cfg", "asym_obj.cfg"), "w") as fh:
            fh.write(
                TRAIN_CFG.format(
                    model_path=model_path,
                    bg_glob=os.path.join(bg_dir, "*.jpg"),
                    train_imgs=args.train_imgs,
                    views=args.views,
                    cyclo=args.cyclo,
                    iters=args.iters, precision=args.precision,
                    square_occlusion=args.occlusion,
                    realistic_occlusion=args.realistic_occlusion,
                    neighbor_clutter=args.clutter,
                    neighbor_clutter_count=args.clutter_count,
                    aux_mask=args.aux_mask,
                    variational=args.variational,
                    batch_norm=args.batch_norm,
                )
            )
        t0 = time.time()
        run_cli(ae_train, ["asym_obj"])
        timings["train_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        run_cli(ae_embed, ["asym_obj"])
        timings["embed_s"] = round(time.time() - t0, 1)

    dataset_root = os.path.join(
        ws, "bopdata" if args.instances == 1 else f"bopdata_inst{args.instances}"
    )
    if not os.path.exists(os.path.join(dataset_root, "test", "000001", "scene_gt.json")):
        t0 = time.time()
        make_scenes(dataset_root, model_path, args.test_imgs,
                    instances=args.instances)
        timings["scene_render_s"] = round(time.time() - t0, 1)

    eval_name = "vsd_eval_icp" if args.icp else "vsd_eval"
    if args.instances > 1:
        eval_name += f"_inst{args.instances}"
    if args.gt_masks:
        eval_name += "_masked"
    if args.topk_aggregate > 1:
        eval_name += f"_agg{args.topk_aggregate}"
    if args.tta_crops > 1:
        eval_name += f"_tta{args.tta_crops}"
    if args.topk_rescore > 1:
        eval_name += f"_rs{args.topk_rescore}"
    if args.icp_frame:
        eval_name += "_frame"
    with open(os.path.join(ws, "cfg_eval", "eval.cfg"), "w") as fh:
        fh.write(EVAL_CFG.format(dataset_path=dataset_root, icp=args.icp, top_n_eval=(-1 if args.instances > 1 else 1), single_instance=(args.instances == 1), gt_masks=args.gt_masks, topk_aggregate=args.topk_aggregate, tta_crops=args.tta_crops, topk_rescore=args.topk_rescore, icp_frame=args.icp_frame))
    t0 = time.time()
    run_cli(ae_eval, ["asym_obj", eval_name])
    timings["eval_s"] = round(time.time() - t0, 1)

    eval_dir = os.path.join(
        ws, "experiments", "asym_obj", "eval", eval_name, "asym_synth"
    )
    with open(os.path.join(eval_dir, "scores.json")) as fh:
        scores = json.load(fh)
    with open(os.path.join(eval_dir, "results.json")) as fh:
        results = json.load(fh)
    re_errs = np.array([r["errors"]["re"] for r in results])
    te_errs = np.array([r["errors"]["te"] for r in results])
    vsd_errs = np.array([r["errors"]["vsd"] for r in results])

    # Train-time knobs come from the workspace's ACTUAL cfg, not the CLI
    # args: under --skip_train the args default, and earlier artifacts
    # recorded e.g. neighbor_clutter=0.0 for a clutter-trained workspace.
    from augmentedautoencoder_tpu.config import load_train_config

    tc = load_train_config(os.path.join(ws, "cfg", "asym_obj.cfg"))
    summary = {
        "object": "asym_textured",
        "pipeline": "ae_train -> ae_embed -> ae_eval (CLI)",
        "icp": bool(args.icp),
        "precision": tc.precision,
        "instances": args.instances,
        "gt_masks": bool(args.gt_masks),
        "topk_aggregate": args.topk_aggregate,
        "tta_crops": args.tta_crops,
        "topk_rescore": args.topk_rescore,
        "icp_frame_accurate": bool(args.icp_frame),
        "square_occlusion": bool(tc.square_occlusion),
        "realistic_occlusion": tc.realistic_occlusion,
        "neighbor_clutter": tc.neighbor_clutter,
        "neighbor_clutter_count": tc.neighbor_clutter_count,
        "auxiliary_mask": bool(tc.auxiliary_mask),
        "variational": tc.variational,
        "batch_norm": bool(tc.batch_normalization),
        "iters": tc.num_iter,
        "codebook_size": tc.embedding_size,
        "test_imgs": len(results),
        "median_est_time_s": round(float(np.median([r["time"] for r in results])), 3),
        "vsd_recall@0.3": scores["vsd"]["recall"],
        "re_recall@15deg": scores["re"]["recall"],
        "te_recall@100mm": scores["te"]["recall"],
        "add_recall@0.1d": scores.get("add", {}).get("recall"),
        "median_re_deg": round(float(np.median(re_errs)), 2),
        "median_te_mm": round(float(np.median(te_errs)), 2),
        "median_vsd": round(float(np.median(vsd_errs)), 4),
        "timings_s": timings,
    }
    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)


if __name__ == "__main__":
    main()
