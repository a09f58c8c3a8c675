"""Shipped concrete `BoundingBoxDetector` implementations.

The reference wires specific neural detectors into its demos (RetinaNet in
test/aae_retina_webcam_pose.py, an SSD frozen graph in
test/aae_googledet_webcam_multi.py); this rebuild's demo CLI instead takes
ANY `BoundingBoxDetector` by dotted path (`detector_webcam_pose
--detector pkg.module:Class[:json_kwargs]`). This module provides the
dependency-free implementation that works out of the box:

  * `ForegroundContourDetector` — classical connected-components detection
    on a foreground mask (fixed dark background, a reference background
    frame, or a depth image). The right tool for tabletop / turntable /
    synthetic-scene demos where the reference user would otherwise have to
    train a detector first; a neural detector drops into the same
    interface when available.

Example:
    detector_webcam_pose m3.cfg --detector \
        augmentedautoencoder_tpu.pose.detectors:ForegroundContourDetector:'{"class_name": "obj1"}'
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .interfaces import BoundingBox, BoundingBoxDetector


class ForegroundContourDetector(BoundingBoxDetector):
    """Connected-component boxes from a foreground mask.

    Foreground = pixels brighter than `thresh` (after optional background
    subtraction via `set_background`), or depth > 0 when `process_raw`
    receives a single-channel float/uint16 image. Components smaller than
    `min_area` pixels are dropped; every box carries `{class_name: score}`
    with score = the component's fill ratio inside its box (a weak but
    monotonic confidence — solid blobs score higher than speckle).
    """

    def __init__(
        self,
        class_name: str = "obj",
        thresh: float = 15.0,
        min_area: int = 64,
        max_detections: int = 16,
        pad: float = 0.0,
    ):
        super().__init__()
        self.class_name = str(class_name)
        self.thresh = float(thresh)
        self.min_area = int(min_area)
        self.max_detections = int(max_detections)
        self.pad = float(pad)  # relative box padding on each side
        self._background: Optional[np.ndarray] = None

    # -- BoundingBoxDetector contract -------------------------------------
    def preprocess_image(self, image, color_format_in="bgr", type_in=np.uint8):
        """The classical pipeline is colorspace-agnostic; pass through."""
        return np.asarray(image)

    def set_background(self, background: np.ndarray) -> None:
        """Reference frame for background subtraction (e.g. the empty
        scene); without one, foreground = brightness > thresh."""
        self._background = np.asarray(background).astype(np.int16)

    def _foreground_mask(self, image: np.ndarray) -> np.ndarray:
        img = np.asarray(image)
        if img.ndim == 2 and img.dtype != np.uint8:
            return img > 0  # depth image: valid depth is foreground
        if img.ndim == 3:
            gray = img.astype(np.int16).max(axis=2)
        else:
            gray = img.astype(np.int16)
        if self._background is not None:
            bg = self._background
            bg = bg.max(axis=2) if bg.ndim == 3 else bg
            return np.abs(gray - bg) > self.thresh
        return gray > self.thresh

    def process_raw(self, image) -> List[BoundingBox]:
        import cv2

        mask = self._foreground_mask(image).astype(np.uint8)
        H, W = mask.shape[:2]
        # open small speckle before labelling (3x3, one iteration)
        mask = cv2.morphologyEx(
            mask, cv2.MORPH_OPEN, np.ones((3, 3), np.uint8)
        )
        n, labels, stats, _ = cv2.connectedComponentsWithStats(mask, 8)
        boxes = []
        for lbl in range(1, n):  # 0 is background
            x, y, w, h, area = stats[lbl]
            if area < self.min_area:
                continue
            px, py = self.pad * w, self.pad * h
            xmin = max(0.0, (x - px) / W)
            ymin = max(0.0, (y - py) / H)
            xmax = min(1.0, (x + w + px) / W)
            ymax = min(1.0, (y + h + py) / H)
            boxes.append(
                BoundingBox(
                    xmin=xmin, ymin=ymin, xmax=xmax, ymax=ymax,
                    classes={self.class_name: float(area) / float(w * h)},
                )
            )
        boxes.sort(key=lambda b: b.classes[self.class_name], reverse=True)
        return boxes[: self.max_detections]
