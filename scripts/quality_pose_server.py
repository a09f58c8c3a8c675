"""Multi-object PoseServer quality run on REAL trained models.

Two distinct procedural objects trained through the full CLI stack share
one PoseServer (present-class serving, codebook slab); test frames contain
BOTH objects side by side (z-buffer composite, occlusion-aware GT boxes)
and per-class pose accuracy is scored. This is the quality-level
validation of the multi-class serving path — the unit/e2e tests use
10-iteration fixture models.

Reuses the asym_obj experiment from scripts/quality_eval_vsd.py's
workspace when present; trains the second object (an anisotropically
stretched variant of the asymmetric mesh) if missing.

    python scripts/quality_pose_server.py [--workspace /tmp/aae_vsd_r3]
        [--frames 30] [--iters 30000] [--out scripts/quality_pose_server.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_cli(module, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        module.main()
    finally:
        sys.argv = old


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workspace", default="/tmp/aae_vsd_r3")
    parser.add_argument("--frames", type=int, default=30)
    parser.add_argument("--iters", type=int, default=30000)
    parser.add_argument("--precision", default="bfloat16")
    parser.add_argument("--icp", action="store_true",
                        help="serve with depth: batched 3-stage ICP "
                             "refinement through PoseServer.process")
    parser.add_argument("--icp_frame", action="store_true",
                        help="ICP_FRAME_ACCURATE serving: crop-window "
                             "synthetic renders in the true camera frame "
                             "(the recommended accuracy stack)")
    parser.add_argument("--topk_aggregate", type=int, default=1,
                        help="serve with top-k candidate blending "
                             "(recommended stack: 8)")
    parser.add_argument("--serving_precision", default="float32",
                        choices=["float32", "bfloat16"],
                        help="encode+query precision of the SERVER "
                             "(independent of the training precision)")
    parser.add_argument("--out", default="scripts/quality_pose_server.json")
    args = parser.parse_args()

    from augmentedautoencoder_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import cv2

    import quality_eval_vsd as qv
    from augmentedautoencoder_tpu.cli import ae_embed, ae_train
    from augmentedautoencoder_tpu.geometry.transform import (
        random_rotation_matrix,
        rotation_error,
    )
    from augmentedautoencoder_tpu.geometry.view_sampler import calc_2d_bbox
    from augmentedautoencoder_tpu.pose import BoundingBox
    from augmentedautoencoder_tpu.renderer import Renderer
    from augmentedautoencoder_tpu.renderer.mesh import load_mesh
    from augmentedautoencoder_tpu.renderer.procedural import (
        make_textured_asymmetric,
        save_ply,
    )
    from augmentedautoencoder_tpu.serving import PoseServer

    ws = os.path.abspath(args.workspace)
    os.environ["AE_WORKSPACE_PATH"] = ws
    assert os.path.exists(os.path.join(ws, "experiments", "asym_obj")), (
        "run scripts/quality_eval_vsd.py first (trains asym_obj)"
    )
    model1 = os.path.join(ws, "asym.ply")
    model2 = os.path.join(ws, "asym_stretch.ply")
    bg_glob = os.path.join(ws, "bg", "*.jpg")

    timings = {}
    if not os.path.exists(os.path.join(ws, "experiments", "obj2")):
        mesh2 = make_textured_asymmetric(subdivisions=5, radius=60.0)
        mesh2.vertices = mesh2.vertices * np.array([0.8, 1.0, 1.3])
        save_ply(mesh2, model2)
        with open(os.path.join(ws, "cfg", "obj2.cfg"), "w") as fh:
            fh.write(
                qv.TRAIN_CFG.format(
                    model_path=model2, bg_glob=bg_glob, train_imgs=2000,
                    views=2562, cyclo=36, iters=args.iters,
                    precision=args.precision, square_occlusion=False,
                    realistic_occlusion=0.0,
                    neighbor_clutter=0.5, neighbor_clutter_count=1,
                    aux_mask=False, variational=0.0, batch_norm=False,
                )
            )
        t0 = time.time()
        run_cli(ae_train, ["obj2"])
        timings["train2_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        run_cli(ae_embed, ["obj2"])
        timings["embed2_s"] = round(time.time() - t0, 1)

    # ---- two-object test frames (held-out rotations, side-by-side, one
    # z-buffer composite; GT boxes from each object's VISIBLE pixels)
    W, H = 360, 270
    K = np.array([[540.0, 0, 180.0], [0, 540.0, 135.0], [0, 0, 1]])
    radius = 550.0
    m1 = load_mesh(model1)
    m2 = load_mesh(model2)
    ren = Renderer([], backend="auto", meshes=[m1, m2])
    rng = np.random.RandomState(12345)  # disjoint from training seeds

    cfg_path = os.path.join(ws, "m3_two_obj.cfg")
    with open(cfg_path, "w") as fh:
        fh.write(
            "[auto_pose]\n"
            "camPose = False\nupright = False\ntopk = 1\n"
            "color_format = bgr\ncolor_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            f"serving_precision = {args.serving_precision}\n"
            f"topk_aggregate = {args.topk_aggregate}\n"
            f"use_icp = {args.icp}\n"
            f"icp_frame_accurate = {args.icp_frame}\n"
            "class_2_encoder = {'asym': 'asym_obj', 'stretch': 'obj2'}\n"
        )
    server = PoseServer(cfg_path, max_dets_per_class=4)

    errs = {"asym": {"re": [], "te": []}, "stretch": {"re": [], "te": []}}
    t_serve = 0.0
    for _ in range(args.frames):
        R1 = random_rotation_matrix(rng.rand(3))[:3, :3]
        R2 = random_rotation_matrix(rng.rand(3))[:3, :3]
        t1 = np.array([-75.0, 0.0, radius])
        t2 = np.array([75.0, 0.0, radius])
        b1, d1 = ren.render(0, W, H, K, R1, t1, 10, 10000, random_light=False)
        b2, d2 = ren.render(1, W, H, K, R2, t2, 10, 10000, random_light=False)
        # z composite
        take2 = (d2 > 0) & ((d1 == 0) | (d2 < d1))
        frame = b1.copy()
        frame[take2] = b2[take2]
        depth = d1.copy()
        depth[take2] = d2[take2]
        boxes, gts = [], []
        for cls, dmine, R_gt, t_gt in (
            ("asym", d1, R1, t1), ("stretch", d2, R2, t2),
        ):
            vis = (dmine > 0) & (depth == dmine)
            ys, xs = np.nonzero(vis)
            if len(xs) < 50:
                continue
            x, y, w, h = calc_2d_bbox(xs, ys, (W, H))
            boxes.append(BoundingBox(
                xmin=x / W, ymin=y / H, xmax=(x + w) / W, ymax=(y + h) / H,
                classes={cls: 1.0},
            ))
            gts.append((cls, R_gt, t_gt))
        t0 = time.time()
        poses = server.process(
            boxes, frame, K, mm=True,
            depth_img=depth if args.icp else None,
        )
        t_serve += time.time() - t0
        for p in poses:
            cls = p.name
            for g_cls, R_gt, t_gt in gts:
                if g_cls == cls:
                    errs[cls]["re"].append(
                        float(np.rad2deg(rotation_error(R_gt, p.trafo[:3, :3])))
                    )
                    errs[cls]["te"].append(
                        float(np.linalg.norm(p.trafo[:3, 3] - t_gt))
                    )

    out = {
        "pipeline": "2x(ae_train+ae_embed) -> PoseServer.process (present-class serving)",
        "frames": args.frames,
        "precision_trained": args.precision,
        "serving_precision": args.serving_precision,
        "icp": bool(args.icp),
        "icp_frame_accurate": bool(args.icp_frame),
        "topk_aggregate": args.topk_aggregate,
        "per_class": {
            # a never-scored class yields n=0 with null stats (np.median([])
            # is NaN, which json.dump would emit as invalid JSON)
            cls: {
                "n": len(v["re"]),
                "median_re_deg": round(float(np.median(v["re"])), 2) if v["re"] else None,
                "re_recall@15deg": round(float(np.mean(np.array(v["re"]) < 15)), 3) if v["re"] else None,
                "median_te_mm": round(float(np.median(v["te"])), 2) if v["te"] else None,
            }
            for cls, v in errs.items()
        },
        "serve_s_per_frame": round(t_serve / max(args.frames, 1), 3),
        "timings_s": timings,
    }
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
