"""Metric writing: TensorBoard summaries + JSONL fallback.

The reference writes TF summaries every 10 iterations (scalar losses +
latent histograms, auto_pose/ae/ae.py:19,45-52, ae_train.py:117-131). Here:
TensorBoard event files when the `tensorboard` package is importable, and an
always-on metrics.jsonl in the same directory (greppable, no reader needed).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from flax.metrics import tensorboard

                self._tb = tensorboard.SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def write_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.scalar(k, float(v), step)

    def write_histogram(self, step: int, name: str, values: np.ndarray) -> None:
        if self._tb is not None:
            self._tb.histogram(name, np.asarray(values), step)

    def write_image(self, step: int, name: str, image: np.ndarray) -> None:
        """image: (H, W, C) float in [0,1] or uint8."""
        if self._tb is not None:
            img = np.asarray(image)
            if img.dtype == np.uint8:
                img = img.astype(np.float32) / 255.0
            self._tb.image(name, img, step)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
