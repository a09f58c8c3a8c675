"""Analytic fake renderer — hermetic test backend (no mesh, no rasterizer).

Renders a sphere with an orientation-coded surface: each surface point's
color encodes its normal in OBJECT coordinates, so different object rotations
produce genuinely different images and the codebook nearest-neighbor pipeline
is exercisable end-to-end without any 3D asset. Output contract matches
`Renderer.render`: (bgr uint8, eye-space depth float32, background zero).

Fills the fake-backend role called for by the rebuild's test strategy
(no equivalent exists in the reference, SURVEY.md section 4).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..geometry.view_sampler import calc_2d_bbox
from .facade import DEFAULT_PHONG


class FakeRenderer:
    """Drop-in Renderer substitute rendering analytic spheres."""

    def __init__(self, object_radius: float = 60.0, n_objects: int = 1):
        self.object_radius = float(object_radius)
        self.n_objects = n_objects

    def render(
        self,
        obj_id: int,
        W: int,
        H: int,
        K: np.ndarray,
        R: np.ndarray,
        t: np.ndarray,
        near: float,
        far: float,
        random_light: bool = False,
        phong: Dict[str, float] = DEFAULT_PHONG,
    ) -> Tuple[np.ndarray, np.ndarray]:
        W, H = int(W), int(H)
        K = np.asarray(K, dtype=np.float64)
        R = np.asarray(R, dtype=np.float64)
        t = np.asarray(t, dtype=np.float64).reshape(3)
        r = self.object_radius * (1.0 + 0.15 * obj_id)  # objects differ in size

        # ray through each pixel: d = K^-1 (u, v, 1)
        us, vs = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
        dx = (us - K[0, 2]) / K[0, 0]
        dy = (vs - K[1, 2]) / K[1, 1]
        dz = np.ones_like(dx)
        d_norm2 = dx**2 + dy**2 + dz**2

        # |o + s*d - t|^2 = r^2 with o = 0
        b = -(dx * t[0] + dy * t[1] + dz * t[2])
        c = float(t @ t - r * r)
        disc = b * b - d_norm2 * c
        hit = disc > 0
        s = (-b - np.sqrt(np.where(hit, disc, 0.0))) / d_norm2
        hit &= s > 0

        z = np.where(hit, s * dz, 0.0)
        hit &= (z >= near) & (z <= far)
        z = np.where(hit, z, 0.0)

        # surface point, camera-frame normal, object-frame normal
        px, py, pz = s * dx, s * dy, s * dz
        n_cam = np.stack([px - t[0], py - t[1], pz - t[2]], axis=-1) / r
        n_obj = n_cam @ R  # R^T n, row-vector form

        base = 0.5 * (n_obj + 1.0)  # orientation-coded RGB in [0,1]

        if random_light:
            light = 1000.0 * np.random.random(3)
            diffuse_w = phong["diffuse"] + 0.1 * (2 * np.random.rand() - 1)
        else:
            light = np.array([400.0, 400.0, 400.0])
            diffuse_w = phong["diffuse"]
        # light position interpreted in GL-eye coords like the real renderer
        light_cv = np.array([light[0], light[1], -light[2]])
        p = np.stack([px, py, pz], axis=-1)
        L = light_cv - p
        L /= np.maximum(np.linalg.norm(L, axis=-1, keepdims=True), 1e-9)
        lambert = np.maximum((n_cam * L).sum(-1), 0.0)

        rgb = np.clip(
            base * (phong["ambient"] + diffuse_w * lambert[..., None]), 0.0, 1.0
        )
        bgr = np.round(rgb[..., ::-1] * 255.0).astype(np.uint8)
        bgr[~hit] = 0
        return bgr, z.astype(np.float32)

    def render_many(
        self,
        obj_ids: Sequence[int],
        W: int,
        H: int,
        K: np.ndarray,
        Rs: Sequence[np.ndarray],
        ts: Sequence[np.ndarray],
        near: float,
        far: float,
        random_light: bool = True,
        phong: Dict[str, float] = DEFAULT_PHONG,
    ) -> Tuple[np.ndarray, np.ndarray, List[List[float]]]:
        scene_bgr = np.zeros((H, W, 3), dtype=np.uint8)
        scene_depth = np.zeros((H, W), dtype=np.float32)
        bbs = []
        for obj_id, R, t in zip(obj_ids, Rs, ts):
            bgr, depth = self.render(
                obj_id, W, H, K, R, t, near, far, random_light, phong
            )
            ys, xs = np.nonzero(depth > 0)
            bbs.append(calc_2d_bbox(xs, ys, (W, H)))
            closer = (depth > 0) & ((scene_depth == 0) | (depth < scene_depth))
            scene_depth[closer] = depth[closer]
            scene_bgr[closer] = bgr[closer]
        return scene_bgr, scene_depth, bbs

    def close(self) -> None:
        pass
