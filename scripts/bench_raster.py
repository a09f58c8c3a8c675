"""Render-only microbench for the native rasterizer (no TPU needed).

Times aae_render over a sweep of codebook-style views on a given mesh at the
training camera resolution. Used to measure rasterizer optimizations in
isolation from the embed pipeline (scripts/bench_embed.py measures
end-to-end).

    python scripts/bench_raster.py [--mesh PLY] [--n 500] [--w 720 --h 540]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh", default="/tmp/aae_vsd_ws/asym.ply")
    parser.add_argument("--n", type=int, default=500)
    parser.add_argument("--w", type=int, default=720)
    parser.add_argument("--h", type=int, default=540)
    parser.add_argument("--lod", type=int, default=0)
    args = parser.parse_args()

    from augmentedautoencoder_tpu.geometry.view_sampler import sample_views
    from augmentedautoencoder_tpu.renderer.mesh import decimate_mesh, load_mesh
    from augmentedautoencoder_tpu.renderer.native.binding import NativeRasterizer

    mesh = load_mesh(args.mesh)
    if args.lod:
        mesh = decimate_mesh(mesh, args.lod)
    print(f"mesh: {len(mesh.vertices)} verts, {len(mesh.faces)} faces")
    rast = NativeRasterizer(mesh)

    K = np.array([[1075.65, 0, args.w / 2], [0, 1073.9, args.h / 2], [0, 0, 1]])
    views, _ = sample_views(600, radius=700.0)
    views = views[: args.n]
    light = np.array([0.0, 0.0, 0.0])

    # warmup
    for view in views[:10]:
        rast.render(args.w, args.h, K, view["R"], view["t"], 10, 10000, light,
                    0.4, 0.8, 0.3, return_px_bbox=True)

    t0 = time.perf_counter()
    npx = 0
    for view in views:
        _, _, bb = rast.render(args.w, args.h, K, view["R"], view["t"], 10,
                               10000, light, 0.4, 0.8, 0.3, return_px_bbox=True)
        if bb is not None:
            npx += int(bb[2] - bb[0]) * int(bb[3] - bb[1])
    dt = time.perf_counter() - t0

    out = {
        "n_views": len(views),
        "faces": len(mesh.faces),
        "res": [args.w, args.h],
        "ms_per_view": round(dt / len(views) * 1e3, 3),
        "mean_bbox_px": int(npx / len(views)),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
