"""Generic helpers: batching, memoization, cache keys, image tiling.

Reference behaviors mirrored:
  * batch_iteration_indices — auto_pose/ae/utils.py:20-26
  * tiles image grid        — auto_pose/ae/utils.py:93-118
  * md5 config cache keys   — auto_pose/ae/dataset.py:83-84
"""

from __future__ import annotations

import functools
import hashlib
from typing import Iterator, Tuple

import numpy as np


def lazy_property(function):
    """Memoize a property on first access."""
    attribute = "_cache_" + function.__name__

    @property
    @functools.wraps(function)
    def wrapper(self):
        if not hasattr(self, attribute):
            setattr(self, attribute, function(self))
        return getattr(self, attribute)

    return wrapper


def batch_iteration_indices(n: int, batch_size: int) -> Iterator[Tuple[int, int]]:
    """Yield (start, end) index pairs covering [0, n) in batch_size chunks."""
    num = int(np.ceil(float(n) / float(batch_size)))
    for i in range(num):
        start = i * batch_size
        end = min(start + batch_size, n)
        yield (start, end)


def md5_of(*parts: object) -> str:
    """Stable md5 hex digest of the stringified parts (dataset cache keys)."""
    h = hashlib.md5()
    for p in parts:
        h.update(str(p).encode("utf-8"))
    return h.hexdigest()


def tiles(
    batch: np.ndarray,
    rows: int,
    cols: int,
    spacing_x: int = 0,
    spacing_y: int = 0,
    scale: float = 1.0,
) -> np.ndarray:
    """Arrange a batch of images into a rows x cols grid image.

    Accepts (N,H,W,C) or (N,H,W); returns float grid with ones background.
    Uses nearest-neighbor resize when scale != 1 (no cv2 dependency).
    """
    if batch.ndim == 4:
        n, h, w, c = batch.shape
    elif batch.ndim == 3:
        n, h, w = batch.shape
        c = 1
        batch = batch[..., None]
    else:
        raise ValueError(f"Invalid batch shape: {batch.shape}")

    th, tw = int(h * scale), int(w * scale)
    grid = np.ones(
        (rows * th + (rows - 1) * spacing_y, cols * tw + (cols - 1) * spacing_x, c),
        dtype=np.float64,
    )
    i = 0
    for row in range(rows):
        for col in range(cols):
            if i < n:
                img = batch[i]
                if (th, tw) != (h, w):
                    yi = (np.arange(th) * h // th).astype(np.int64)
                    xi = (np.arange(tw) * w // tw).astype(np.int64)
                    img = img[yi][:, xi]
                y0, x0 = row * (th + spacing_y), col * (tw + spacing_x)
                grid[y0 : y0 + th, x0 : x0 + tw, :] = img
            i += 1
    return grid


def tiles4(
    batch: np.ndarray,
    rows: int,
    cols: int,
    spacing_x: int = 0,
    spacing_y: int = 0,
    scale: float = 1.0,
) -> np.ndarray:
    """RGBD grid: each cell shows RGB with its depth channel tiled directly
    below (reference meshrenderer/gl_utils/tiles.py:32-53 `tiles4`).

    batch: (N, H, W, 4) — channels 0:3 color, 3 depth. Returns a float grid
    of 2*rows x cols cells with ones background.
    """
    if batch.ndim != 4 or batch.shape[3] != 4:
        raise ValueError(f"tiles4 needs (N, H, W, 4), got {batch.shape}")
    n = batch.shape[0]
    rgb = batch[..., :3]
    depth = np.repeat(batch[..., 3:4], 3, axis=3)
    # interleave rgb-row / depth-row pairs, then reuse the plain grid layout
    cells = np.ones((2 * rows * cols,) + rgb.shape[1:], dtype=np.float64)
    for i in range(min(n, rows * cols)):
        r, c = divmod(i, cols)
        cells[(2 * r) * cols + c] = rgb[i]
        cells[(2 * r + 1) * cols + c] = depth[i]
    return tiles(cells, 2 * rows, cols, spacing_x, spacing_y, scale)
