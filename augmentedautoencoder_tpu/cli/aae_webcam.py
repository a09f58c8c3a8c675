"""`aae_webcam <group>/<experiment>` — live rotation estimation demo
(reference auto_pose/test/aae_webcam.py).

Reads webcam frames (threaded grabber), center-crops, estimates the nearest
codebook rotation, and shows the input beside the re-rendered estimate.
"""

from __future__ import annotations

import argparse

import numpy as np

from .. import factory
from ..pose.webcam_video_stream import WebcamVideoStream
from . import split_experiment_name


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment_name")
    parser.add_argument("--src", type=int, default=0)
    parser.add_argument("--down", type=int, default=1, help="render downsample")
    args = parser.parse_args()

    import cv2

    experiment_name, experiment_group = split_experiment_name(args.experiment_name)
    codebook, dataset = factory.build_codebook_from_name(
        experiment_name, experiment_group, return_dataset=True
    )
    h, w = dataset.shape[:2]

    videoStream = WebcamVideoStream(args.src, 720, 540).start()
    try:
        while True:
            frame = videoStream.read()
            if frame is None:
                continue
            H, W = frame.shape[:2]
            side = min(H, W)
            crop = frame[
                (H - side) // 2 : (H + side) // 2, (W - side) // 2 : (W + side) // 2
            ]
            crop = cv2.resize(crop, (w, h))
            R = codebook.nearest_rotation(crop)
            pred_view = dataset.render_rot(R, downSample=args.down)
            cv2.imshow("resized webcam input", crop)
            cv2.imshow("estimated rendered view", pred_view.astype(np.uint8))
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
    finally:
        videoStream.stop()


if __name__ == "__main__":
    main()
