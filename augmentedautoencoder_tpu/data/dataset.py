"""Host-side dataset: synthetic view rendering + md5-keyed caches.

Mirrors auto_pose/ae/dataset.py behaviors:
  * SO(3)-uniform training pairs: per sample a random rotation is rendered
    twice (random light -> x, fixed light -> y), bbox-offset square crop on x,
    tight crop on y, nearest-neighbor resize (dataset.py:219-306)
  * embedding view batches for the codebook build (dataset.py:308-352)
  * md5(cfg-section) keyed .npz/.npy caches (dataset.py:82-95,146-174)
  * extract_square_patch crop geometry (dataset.py:354-373)

Rendering is the offline CPU stage; batches are assembled on-device by
pipeline.DeviceDataset.
"""

from __future__ import annotations

import glob
import os
from typing import Tuple

import numpy as np

from ..config import TrainConfig
from ..geometry import transform, view_sampler
from ..utils import lazy_property, md5_of


def extract_square_patch(
    scene_img: np.ndarray,
    bb_xywh,
    pad_factor: float,
    resize=(128, 128),
    interpolation: str = "nearest",
    black_borders: bool = False,
) -> np.ndarray:
    """Padded square crop around a bbox, resized (reference dataset.py:354-373).

    Exact integer geometry preserved: size = int(max(h,w)*pad_factor), crop
    window centered at bbox center clamped to the image, then cv2 resize.
    """
    import cv2

    x, y, w, h = np.array(bb_xywh).astype(np.int32)
    size = int(np.maximum(h, w) * pad_factor)

    left = int(np.maximum(x + w / 2 - size / 2, 0))
    right = int(np.minimum(x + w / 2 + size / 2, scene_img.shape[1]))
    top = int(np.maximum(y + h / 2 - size / 2, 0))
    bottom = int(np.minimum(y + h / 2 + size / 2, scene_img.shape[0]))

    scene_crop = scene_img[top:bottom, left:right].copy()

    if black_borders:
        scene_crop[: (y - top), :] = 0
        scene_crop[(y + h - top):, :] = 0
        scene_crop[:, : (x - left)] = 0
        scene_crop[:, (x + w - left):] = 0

    interp = cv2.INTER_NEAREST if interpolation == "nearest" else cv2.INTER_LINEAR
    return cv2.resize(scene_crop, resize, interpolation=interp)


class Dataset:
    """Rendered training data + embedding view sphere for one object.

    `render_workers` > 1 parallelizes offline rendering with threads — the
    native rasterizer releases the GIL, so this scales with host cores
    (the reference renders strictly serially through one GL context).
    """

    def __init__(self, dataset_path: str, cfg: TrainConfig, renderer=None,
                 render_workers: int = 0):
        import os as _os

        self.render_workers = render_workers or min(8, _os.cpu_count() or 1)
        self.cfg = cfg
        self.shape = cfg.shape
        self.dataset_path = dataset_path
        self.noof_training_imgs = cfg.noof_training_imgs
        self._renderer = renderer

        self.bg_img_paths = sorted(glob.glob(cfg.background_images_glob))
        self.noof_bg_imgs = min(cfg.noof_bg_imgs, len(self.bg_img_paths))

        self.train_x = np.empty((self.noof_training_imgs,) + self.shape, dtype=np.uint8)
        self.mask_x = np.empty((self.noof_training_imgs,) + self.shape[:2], dtype=bool)
        self.train_y = np.empty((self.noof_training_imgs,) + self.shape, dtype=np.uint8)
        self.bg_imgs = np.empty((self.noof_bg_imgs,) + self.shape, dtype=np.uint8)
        self.noof_obj_pixels = np.empty((self.noof_training_imgs,), dtype=np.int64)

    # ------------------------------------------------------------- renderer
    @property
    def renderer(self):
        if self._renderer is None:
            from ..renderer import Renderer

            # cfg MODEL selects the shading path like the reference picks
            # meshrenderer vs meshrenderer_phong (dataset.py:60-80)
            self._renderer = Renderer(
                [self.cfg.model_path],
                samples=self.cfg.antialiasing,
                vertex_tmp_store_folder=self.dataset_path,
                vertex_scale=self.cfg.vertex_scale,
                shading="cad" if self.cfg.model == "cad" else "vertex",
                max_faces=self.cfg.max_render_faces or None,
            )
        return self._renderer

    # ------------------------------------------------------------- geometry
    @lazy_property
    def viewsphere_for_embedding(self) -> np.ndarray:
        return view_sampler.viewsphere_rotations(
            self.cfg.min_n_views, self.cfg.num_cyclo, self.cfg.radius
        )

    @property
    def embedding_size(self) -> int:
        return len(self.viewsphere_for_embedding)

    # ------------------------------------------------------------- caches
    def get_training_images(self, dataset_path: str, progress: bool = True) -> None:
        cache_hash = md5_of(self.cfg.dataset_cache_items())
        cache_file = os.path.join(dataset_path, cache_hash + ".npz")

        if os.path.exists(cache_file):
            data = np.load(cache_file)
            self.train_x = data["train_x"].astype(np.uint8)
            self.mask_x = data["mask_x"]
            self.train_y = data["train_y"].astype(np.uint8)
        else:
            self.render_training_images(progress=progress)
            os.makedirs(dataset_path, exist_ok=True)
            np.savez(
                cache_file,
                train_x=self.train_x,
                mask_x=self.mask_x,
                train_y=self.train_y,
            )
        # mask_x is True on BACKGROUND pixels (depth == 0); object pixel count
        # is therefore the count of zeros (reference dataset.py:94)
        self.noof_obj_pixels = np.count_nonzero(self.mask_x == 0, axis=(1, 2))

    def load_bg_images(self, dataset_path: str) -> None:
        import cv2

        cache_hash = md5_of(
            str(self.shape), str(self.noof_bg_imgs), self.cfg.background_images_glob
        )
        cache_file = os.path.join(dataset_path, cache_hash + ".npy")
        if os.path.exists(cache_file):
            self.bg_imgs = np.load(cache_file)
            return
        file_list = list(self.bg_img_paths[: self.noof_bg_imgs])
        np.random.shuffle(file_list)
        for j, fname in enumerate(file_list):
            bgr = cv2.imread(fname)
            H, W = bgr.shape[:2]
            if H <= self.shape[0] or W <= self.shape[1]:
                bgr = cv2.resize(bgr, (max(W, self.shape[1] + 1), max(H, self.shape[0] + 1)))
                H, W = bgr.shape[:2]
            y0 = int(np.random.rand() * (H - self.shape[0]))
            x0 = int(np.random.rand() * (W - self.shape[1]))
            bgr = bgr[y0 : y0 + self.shape[0], x0 : x0 + self.shape[1], :]
            if self.shape[2] == 1:
                bgr = cv2.cvtColor(np.uint8(bgr), cv2.COLOR_BGR2GRAY)[:, :, None]
            self.bg_imgs[j] = bgr
        os.makedirs(dataset_path, exist_ok=True)
        np.save(cache_file, self.bg_imgs)

    # ------------------------------------------------------------- rendering
    def _render_pair(self, R: np.ndarray):
        """Render one training pair (bgr_x random light, bgr_y fixed light)."""
        cfg = self.cfg
        W_r, H_r = cfg.render_dims
        t = np.array([0.0, 0.0, cfg.radius])
        if hasattr(self.renderer, "render_with_bbox"):
            bgr_x, depth_x, bb_x = self.renderer.render_with_bbox(
                0, W_r, H_r, cfg.K.copy(), R, t, cfg.clip_near, cfg.clip_far,
                random_light=True,
            )
            bgr_y, depth_y, bb_y = self.renderer.render_with_bbox(
                0, W_r, H_r, cfg.K.copy(), R, t, cfg.clip_near, cfg.clip_far,
                random_light=False,
            )
            return bgr_x, depth_x, bgr_y, depth_y, bb_x, bb_y
        bgr_x, depth_x = self.renderer.render(
            0, W_r, H_r, cfg.K.copy(), R, t, cfg.clip_near, cfg.clip_far,
            random_light=True,
        )
        bgr_y, depth_y = self.renderer.render(
            0, W_r, H_r, cfg.K.copy(), R, t, cfg.clip_near, cfg.clip_far,
            random_light=False,
        )

        def bb_of(depth):
            ys, xs = np.nonzero(depth > 0)
            if len(xs) == 0:
                return None
            return view_sampler.calc_2d_bbox(xs, ys, (W_r, H_r))

        return bgr_x, depth_x, bgr_y, depth_y, bb_of(depth_x), bb_of(depth_y)

    def render_training_images(self, progress: bool = True) -> None:
        cfg = self.cfg
        H, W = cfg.h, cfg.w
        render_dims = cfg.render_dims

        # rotations drawn sequentially (reproducible), renders threaded
        Rs = [
            transform.random_rotation_matrix()[:3, :3]
            for _ in range(self.noof_training_imgs)
        ]

        def process(i):
            if progress and i % 500 == 0:
                print(f"rendering training images {i}/{self.noof_training_imgs}")
            bgr_x, depth_x, bgr_y, depth_y, obj_bb, obj_bb_y = self._render_pair(Rs[i])

            if obj_bb is None:
                raise RuntimeError(
                    "Object not visible in rendering. Have you scaled the "
                    "vertices to mm (VERTEX_SCALE)?"
                )
            x, y, w, h = obj_bb

            rand_trans_x = np.random.uniform(-cfg.max_rel_offset, cfg.max_rel_offset) * w
            rand_trans_y = np.random.uniform(-cfg.max_rel_offset, cfg.max_rel_offset) * h
            obj_bb_off = obj_bb + np.array([rand_trans_x, rand_trans_y, 0, 0])

            crop_x = extract_square_patch(bgr_x, obj_bb_off, cfg.pad_factor, resize=(W, H))
            crop_dx = extract_square_patch(depth_x, obj_bb_off, cfg.pad_factor, resize=(W, H))
            mask_x = crop_dx == 0.0

            crop_y = extract_square_patch(bgr_y, obj_bb_y, cfg.pad_factor, resize=(W, H))

            if self.shape[2] == 1:
                import cv2

                crop_x = cv2.cvtColor(np.uint8(crop_x), cv2.COLOR_BGR2GRAY)[:, :, None]
                crop_y = cv2.cvtColor(np.uint8(crop_y), cv2.COLOR_BGR2GRAY)[:, :, None]

            self.train_x[i] = crop_x.astype(np.uint8)
            self.mask_x[i] = mask_x
            self.train_y[i] = crop_y.astype(np.uint8)

        if self.render_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(self.render_workers) as pool:
                list(pool.map(process, range(self.noof_training_imgs)))
        else:
            for i in range(self.noof_training_imgs):
                process(i)

    def render_embedding_image_batch(self, start: int, end: int) -> Tuple[np.ndarray, np.ndarray]:
        """Render + crop embedding views [start, end); returns
        (batch uint8, obj_bbs int) — reference dataset.py:308-352.

        uint8 deliberately: the encoder normalizes on-device
        (factory.make_encode_fn), so the host->HBM transfer of the 92k-view
        stream is 4x smaller than float32 — the transfer is the embed
        bottleneck on tunneled hosts (PERF.md)."""
        cfg = self.cfg
        t = np.array([0.0, 0.0, cfg.radius])
        batch = np.empty((end - start,) + self.shape, dtype=np.uint8)
        obj_bbs = np.empty((end - start, 4))

        def render_one(R):
            if hasattr(self.renderer, "render_with_bbox"):
                bgr_y, depth_y, obj_bb = self.renderer.render_with_bbox(
                    0, cfg.render_dims[0], cfg.render_dims[1], cfg.K.copy(),
                    R, t, cfg.clip_near, cfg.clip_far, random_light=False,
                )
            else:
                bgr_y, depth_y = self.renderer.render(
                    0, cfg.render_dims[0], cfg.render_dims[1], cfg.K.copy(),
                    R, t, cfg.clip_near, cfg.clip_far, random_light=False,
                )
                ys, xs = np.nonzero(depth_y > 0)
                obj_bb = view_sampler.calc_2d_bbox(xs, ys, cfg.render_dims)
            crop = extract_square_patch(bgr_y, obj_bb, cfg.pad_factor, resize=self.shape[:2])
            if self.shape[2] == 1:
                import cv2

                crop = cv2.cvtColor(crop, cv2.COLOR_BGR2GRAY)[:, :, None]
            return crop, obj_bb

        views = self.viewsphere_for_embedding[start:end]
        if self.render_workers > 1:
            # threads scale: the native rasterizer releases the GIL
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(self.render_workers) as pool:
                results = list(pool.map(render_one, views))
        else:
            results = [render_one(R) for R in views]
        for i, (crop, obj_bb) in enumerate(results):
            batch[i] = crop
            obj_bbs[i] = obj_bb
        return batch, obj_bbs

    def render_rot(self, R: np.ndarray, downSample: int = 1) -> np.ndarray:
        """Render a single fixed-light view of rotation R for visualization
        (reference dataset.py:177-216)."""
        cfg = self.cfg
        K = cfg.K.copy()
        K[:2, :] = K[:2, :] / downSample
        W_r = cfg.render_dims[0] // downSample
        H_r = cfg.render_dims[1] // downSample
        t = np.array([0.0, 0.0, cfg.radius])

        bgr_y, depth_y = self.renderer.render(
            0, W_r, H_r, K, R, t, cfg.clip_near, cfg.clip_far, random_light=False
        )
        ys, xs = np.nonzero(depth_y > 0)
        obj_bb = view_sampler.calc_2d_bbox(xs, ys, (W_r, H_r))
        return extract_square_patch(bgr_y, obj_bb, cfg.pad_factor, resize=self.shape[:2])
