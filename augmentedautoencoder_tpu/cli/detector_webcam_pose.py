"""`detector_webcam_pose <m3_cfg> --detector pkg.module:Class` — live 6D demo.

TPU-native generalization of the reference's detector demos
(test/aae_retina_webcam_pose.py, test/aae_googledet_webcam_multi.py): any
`BoundingBoxDetector` implementation, loaded by dotted path, feeds the
multi-codebook AePoseEstimator; results overlay via PoseVisualizer.

The reference's GPU/CPU split-graph pipelining hack
(aae_googledet_webcam_multi.py:61-100) becomes a plain two-stage thread
pipeline: the detector runs one frame ahead of the pose stage.
"""

from __future__ import annotations

import argparse
import importlib
import queue
import threading
import time

import numpy as np

from ..pose import AePoseEstimator
from ..pose.webcam_video_stream import WebcamVideoStream


def load_detector(spec: str):
    """'package.module:ClassName[:json_kwargs]' -> instance."""
    module_name, _, rest = spec.partition(":")
    class_name, _, kwargs_json = rest.partition(":")
    cls = getattr(importlib.import_module(module_name), class_name)
    kwargs = {}
    if kwargs_json:
        import json

        kwargs = json.loads(kwargs_json)
    return cls(**kwargs)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("test_config")
    parser.add_argument("--detector", required=True,
                        help="dotted path pkg.module:Class of a BoundingBoxDetector")
    parser.add_argument("--src", type=int, default=0)
    parser.add_argument("--camK", default=None,
                        help="9 comma-separated intrinsics; defaults to a "
                             "focal ~ width pinhole")
    parser.add_argument("--label_map", default=None,
                        help=".pbtxt label map mapping integer detector class "
                             "ids to the estimator's class names")
    args = parser.parse_args()

    import cv2

    detector = load_detector(args.detector)
    estimator = AePoseEstimator(args.test_config)
    category_index = None
    if args.label_map:
        from ..pose.label_map import create_category_index_from_labelmap, remap_box_classes

        category_index = create_category_index_from_labelmap(args.label_map)

    stream = WebcamVideoStream(args.src, 720, 540).start()
    det_queue: "queue.Queue" = queue.Queue(maxsize=2)
    stop = threading.Event()

    def detect_loop():
        while not stop.is_set():
            frame = stream.read()
            if frame is None:
                time.sleep(0.01)
                continue
            boxes = detector.process(frame)
            if category_index is not None:
                remap_box_classes(boxes, category_index)
            try:
                det_queue.put((frame, boxes), timeout=0.5)
            except queue.Full:
                pass

    threading.Thread(target=detect_loop, daemon=True).start()

    vis = None
    try:
        while True:
            frame, boxes = det_queue.get()
            H, W = frame.shape[:2]
            if args.camK:
                camK = np.array([float(v) for v in args.camK.split(",")]).reshape(3, 3)
            else:
                camK = np.array([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1.0]])
            poses = estimator.process(bboxes=boxes, color_img=frame, camK=camK)

            out = frame.copy()
            for box in boxes:
                x0, y0 = int(box.xmin * W), int(box.ymin * H)
                x1, y1 = int(box.xmax * W), int(box.ymax * H)
                cv2.rectangle(out, (x0, y0), (x1, y1), (0, 255, 0), 2)
            for pose in poses:
                t = pose.trafo[:3, 3]
                cv2.putText(
                    out, f"{pose.name} z={t[2]:.2f}m", (10, 20),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 255, 0), 2,
                )
            cv2.imshow("6D pose", out)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
    finally:
        stop.set()
        stream.stop()


if __name__ == "__main__":
    main()
