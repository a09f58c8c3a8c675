"""`aae_image <group>/<experiment> -f <file_or_dir>` — single-crop demo.

Estimates the nearest codebook rotation for image crop(s) and writes the
input beside the re-rendered estimated view (reference test/aae_image.py).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from .. import factory
from . import split_experiment_name


def main() -> None:
    from ..utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment_name")
    parser.add_argument("-f", "--file_str", required=True,
                        help="image file or folder of images")
    parser.add_argument("-o", "--out_dir", default=None)
    parser.add_argument("--at_step", type=int, default=None)
    args = parser.parse_args()

    import cv2

    experiment_name, experiment_group = split_experiment_name(args.experiment_name)
    codebook, dataset = factory.build_codebook_from_name(
        experiment_name, experiment_group, return_dataset=True, at_step=args.at_step
    )

    if os.path.isdir(args.file_str):
        files = sorted(
            glob.glob(os.path.join(args.file_str, "*.png"))
            + glob.glob(os.path.join(args.file_str, "*.jpg"))
        )
    else:
        files = [args.file_str]

    out_dir = args.out_dir or os.getcwd()
    os.makedirs(out_dir, exist_ok=True)

    h, w = dataset.shape[:2]
    for fname in files:
        im = cv2.imread(fname)
        im = cv2.resize(im, (w, h))
        R = codebook.nearest_rotation(im)
        pred_view = dataset.render_rot(R)
        print(f"{os.path.basename(fname)}\nR_est:\n{R}")
        out = np.concatenate([im, pred_view.astype(np.uint8)], axis=1)
        out_path = os.path.join(
            out_dir, os.path.splitext(os.path.basename(fname))[0] + "_estimate.png"
        )
        cv2.imwrite(out_path, out)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
