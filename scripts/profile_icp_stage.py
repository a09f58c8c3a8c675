"""Split the batched-ICP refinement stage into its host/device terms.

PERF.md round 4 measured the ICP stage at ~1.65 s/frame (24 dets) — ~97%
of the recommended accuracy stack's serving time. This script attributes
that cost at the same shape: per-detection host prep (synthetic render,
re-projection, gating, subsample) vs the single batched device fit
(`icp_batch`), so the optimization lands on the real term.

    python scripts/profile_icp_stage.py [--dets 24] [--rounds 3]
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
    from augmentedautoencoder_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()  # icp_batch first-compiles in minutes on the tunnel
    p = argparse.ArgumentParser()
    p.add_argument("--workspace", default="/tmp/aae_vsd_ws2")
    p.add_argument("--dets", type=int, default=24)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--frame_accurate", action="store_true")
    p.add_argument("--out", default="")
    args = p.parse_args()

    from augmentedautoencoder_tpu.renderer.facade import Renderer
    from augmentedautoencoder_tpu.renderer.mesh import load_mesh
    from augmentedautoencoder_tpu.pose import icp as icp_mod

    W, H = 640, 480
    K = np.array([[1075.65, 0, W / 2], [0, 1073.90, H / 2], [0, 0, 1]])
    mesh = load_mesh(os.path.join(args.workspace, "asym.ply"))
    ren = Renderer([], backend="auto", meshes=[mesh])
    syn = icp_mod.SynRenderer(ren)

    # one real scene: object at a lateral offset, like the breakdown bench
    rng = np.random.RandomState(0)
    t_gt = np.array([40.0, -30.0, 700.0])
    R_gt = np.linalg.qr(rng.randn(3, 3))[0]
    if np.linalg.det(R_gt) < 0:
        R_gt[:, 0] *= -1
    _, depth_frame = ren.render(0, W, H, K, R_gt, t_gt, 10, 10000,
                                random_light=False)
    ys, xs = np.nonzero(depth_frame > 0)
    top, left = int(ys.min()) - 8, int(xs.min()) - 8
    bot, right = int(ys.max()) + 8, int(xs.max()) + 8
    depth_crop = depth_frame[top:bot, left:right]

    # n jittered initial estimates (what stage 1 sees after the encoder)
    n = args.dets
    Rs, ts, crops, offs = [], [], [], []
    for i in range(n):
        dR = icp_mod.icp_jax  # noop ref to keep flake quiet
        ang = rng.uniform(-0.05, 0.05, 3)
        cx, cy, cz = np.cos(ang)
        sx, sy, sz = np.sin(ang)
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        Rs.append(Rz @ Ry @ Rx @ R_gt)
        ts.append(t_gt + rng.uniform(-15, 15, 3))
        crops.append(depth_crop)
        offs.append((left, top))

    co = offs if args.frame_accurate else None
    prng = np.random.RandomState(1)

    # warm the jitted icp_batch
    preps = [
        icp_mod._refinement_clouds(
            crops[i], syn, Rs[i], ts[i], K, (W, H), rng=prng,
            crop_offset=co[i] if co else None)
        for i in range(n)
    ]
    As = np.stack([pp[0] for pp in preps if pp is not None])
    Bs = np.stack([pp[1] for pp in preps if pp is not None])
    icp_mod.icp_batch(As, Bs, tolerance=1e-6, depth_only=True)
    icp_mod.icp_batch(As, Bs, tolerance=1e-6, no_depth=True)

    res = {}
    for _ in range(args.rounds):
        # host prep, split into render vs rest
        t0 = time.perf_counter()
        for i in range(n):
            if co:
                syn.render_trafo(K, Rs[i], ts[i], (W, H), obj_id=0)
            else:
                syn.generate_synthetic_depth(K, Rs[i], ts[i], (W, H), obj_id=0)
        t_render = time.perf_counter() - t0

        t0 = time.perf_counter()
        preps = [
            icp_mod._refinement_clouds(
                crops[i], syn, Rs[i], ts[i], K, (W, H), rng=prng,
                crop_offset=co[i] if co else None)
            for i in range(n)
        ]
        t_prep_total = time.perf_counter() - t0

        As = np.stack([pp[0] for pp in preps if pp is not None])
        Bs = np.stack([pp[1] for pp in preps if pp is not None])

        t0 = time.perf_counter()
        fits = icp_mod.icp_batch(As, Bs, tolerance=1e-6, depth_only=True)
        t_dev_d = time.perf_counter() - t0
        t0 = time.perf_counter()
        fits2 = icp_mod.icp_batch(As, Bs, tolerance=1e-6, no_depth=True)
        t_dev_r = time.perf_counter() - t0
        iters_d = [f[2] for f in fits]
        iters_r = [f[2] for f in fits2]

        for k, v in [
            ("render_ms", t_render * 1e3),
            ("prep_total_ms", t_prep_total * 1e3),
            ("device_depth_only_ms", t_dev_d * 1e3),
            ("device_no_depth_ms", t_dev_r * 1e3),
        ]:
            res[k] = min(res.get(k, 1e18), v)
    res.update(
        n_dets=n, live=len(As), frame_accurate=bool(co),
        iters_depth_only=[int(i) for i in iters_d],
        iters_no_depth=[int(i) for i in iters_r],
        prep_minus_render_ms=round(res["prep_total_ms"] - res["render_ms"], 1),
        crop_shape=list(depth_crop.shape),
    )
    res = {k: (round(v, 1) if isinstance(v, float) else v) for k, v in res.items()}
    print(json.dumps(res, indent=1))
    if args.out:
        json.dump(res, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
