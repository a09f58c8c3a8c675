"""PoseServer frame-latency breakdown on REAL trained checkpoints.

Splits the end-to-end serving path into its host/device stages —
crop-extract (Python/cv2 per detection in submit), dispatch (jitted encode
+ slab query enqueue), readback (device->host materialization in retrieve),
pose math (numpy 6D recovery) — at the production shape: 3 present classes
x 8 detections per frame. The reference pays one full session.run PER CROP
(ae_pose_estimator.py:133-232) so it has no comparable split; the TPU build
should be host-bound nowhere (VERDICT round-3 weak item #4).

Also reports end-to-end latency two ways: synchronous process() (sum of
stages, no overlap) and pipelined process_stream(depth=2) (submit/retrieve
overlap — the production pattern), min-of-rounds.

Requires a trained asym_obj workspace (scripts/quality_eval_vsd.py).

    python scripts/bench_serving_breakdown.py [--workspace /tmp/aae_vsd_ws2]
        [--present 3] [--dets 8] [--frames 40] [--precision bfloat16]
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


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workspace", default="/tmp/aae_vsd_ws2")
    parser.add_argument("--present", type=int, default=3)
    parser.add_argument("--dets", type=int, default=8,
                        help="detections per present class per frame")
    parser.add_argument("--frames", type=int, default=40)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--precision", default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--topk_aggregate", type=int, default=1,
                        help="serve with top-k blending (lax.top_k query "
                             "path) to measure the aggregation knob's "
                             "frame-latency cost")
    parser.add_argument("--icp", default="off",
                        choices=["off", "legacy", "frame"],
                        help="feed a rendered depth frame and refine every "
                             "detection with the batched 3-stage ICP "
                             "('legacy' = reference centered-cloud geometry, "
                             "'frame' = ICP_FRAME_ACCURATE) — measures the "
                             "recommended accuracy stack's serving cost; "
                             "adds an 'icp' stage to the breakdown")
    parser.add_argument("--out", default="scripts/bench_serving_breakdown.json")
    args = parser.parse_args()
    if args.icp != "off" and args.frames > 12:
        # ICP adds ~100 ms/instance of host+device refinement per frame;
        # keep the wall-clock of a breakdown run bounded
        args.frames = 12

    from augmentedautoencoder_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from augmentedautoencoder_tpu.pose import BoundingBox
    from augmentedautoencoder_tpu.renderer import Renderer
    from augmentedautoencoder_tpu.renderer.mesh import load_mesh
    from augmentedautoencoder_tpu.serving import PoseServer

    ws = os.path.abspath(args.workspace)
    os.environ["AE_WORKSPACE_PATH"] = ws
    assert os.path.exists(os.path.join(ws, "experiments", "asym_obj")), (
        "run scripts/quality_eval_vsd.py first (trains asym_obj)"
    )

    # N "classes" sharing the asym_obj experiment: per-class dispatch cost
    # is identical to N genuinely distinct models (same compiled encode,
    # same slab layout) and it isolates the serving-path timing from
    # training N models
    classes = [f"obj{i}" for i in range(args.present)]
    mapping = ", ".join(f"'{c}': 'asym_obj'" for c in classes)
    cfg_path = os.path.join(ws, "m3_breakdown.cfg")
    with open(cfg_path, "w") as fh:
        fh.write(
            "[auto_pose]\n"
            "camPose = False\nupright = False\ntopk = 1\n"
            "color_format = bgr\ncolor_data_type = np.float32\n"
            "depth_data_type = np.float32\n"
            f"serving_precision = {args.precision}\n"
            f"topk_aggregate = {args.topk_aggregate}\n"
            f"use_icp = {args.icp != 'off'}\n"
            f"icp_frame_accurate = {args.icp == 'frame'}\n"
            f"class_2_encoder = {{{mapping}}}\n"
        )

    # one real rendered frame (VGA) reused every iteration — crop cost
    # depends on image content only through cv2's cache behaviour
    W, H = 640, 480
    K = np.array([[1075.65, 0, W / 2], [0, 1073.90, H / 2], [0, 0, 1]])
    mesh = load_mesh(os.path.join(ws, "asym.ply"))
    ren = Renderer([], backend="auto", meshes=[mesh])
    frame, depth = ren.render(
        0, W, H, K, np.eye(3), np.array([0.0, 0.0, 700.0]), 10, 10000
    )

    rng = np.random.RandomState(0)
    boxes = []
    if args.icp != "off":
        # detections must cover the rendered object so the ICP refines a
        # real cloud (random background boxes would measure the degenerate
        # empty-crop early-out, not production ICP cost): jitter real
        # detections around the object's true pixel bbox
        ys, xs = np.nonzero(depth > 0)
        x0o, x1o = xs.min() / W, (xs.max() + 1) / W
        y0o, y1o = ys.min() / H, (ys.max() + 1) / H
        bw, bh = x1o - x0o, y1o - y0o
        for c in classes:
            for _ in range(args.dets):
                jx = rng.uniform(-0.1, 0.1) * bw
                jy = rng.uniform(-0.1, 0.1) * bh
                js = rng.uniform(0.95, 1.1)
                boxes.append(
                    BoundingBox(
                        xmin=max(x0o + jx, 0.0),
                        ymin=max(y0o + jy, 0.0),
                        xmax=min(x0o + jx + bw * js, 1.0),
                        ymax=min(y0o + jy + bh * js, 1.0),
                        classes={c: 1.0},
                    )
                )
    else:
        for c in classes:
            for _ in range(args.dets):
                x0 = rng.uniform(0.05, 0.7)
                y0 = rng.uniform(0.05, 0.6)
                w = rng.uniform(0.08, 0.2)
                boxes.append(
                    BoundingBox(
                        xmin=x0, ymin=y0,
                        xmax=min(x0 + w, 1.0), ymax=min(y0 + w * 0.9, 1.0),
                        classes={c: 1.0},
                    )
                )
    depth_img = depth.astype(np.float32) if args.icp != "off" else None

    server = PoseServer(cfg_path, max_dets_per_class=args.dets, profile=True)
    # warm up compiles + caches
    for _ in range(3):
        server.process(boxes, frame, K, depth_img=depth_img)
    server.profile_times.clear()
    server.profile_frames = 0

    # stage split over synchronous frames (no pipelining: stage sums are
    # the true end-to-end decomposition)
    t0 = time.perf_counter()
    for _ in range(args.frames):
        server.process(boxes, frame, K, depth_img=depth_img)
    sync_ms = (time.perf_counter() - t0) / args.frames * 1e3
    stages = {k: round(v, 3) for k, v in server.profile_summary().items()}

    # pipelined end-to-end (the production pattern), min over rounds
    def stream():
        t0 = time.perf_counter()
        n = 0
        for _ in server.process_stream(
            ({"bboxes": boxes, "color_img": frame, "camK": K,
              "depth_img": depth_img}
             for _ in range(args.frames)),
            depth=2,
        ):
            n += 1
        return (time.perf_counter() - t0) / n * 1e3

    pipe_ms = min(stream() for _ in range(args.rounds))

    n_dets = len(boxes)
    out = {
        "present_classes": args.present,
        "dets_per_class": args.dets,
        "dets_per_frame": n_dets,
        "precision": args.precision,
        "topk_aggregate": args.topk_aggregate,
        "icp": args.icp,
        "frames": args.frames,
        "stage_ms_per_frame": stages,
        "stage_sum_ms": round(sum(stages.values()), 3),
        "sync_ms_per_frame": round(sync_ms, 3),
        "pipelined_ms_per_frame": round(pipe_ms, 3),
        "crop_extract_us_per_det": round(
            1e3 * stages.get("crop_extract", 0.0) / n_dets, 1
        ),
        "host_bound": stages.get("crop_extract", 0.0)
        > max(stages.get("dispatch", 0.0), stages.get("readback", 0.0)),
    }
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
