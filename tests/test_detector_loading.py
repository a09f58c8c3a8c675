"""detector_webcam_pose helper: detector loading by dotted path."""

import sys
import types

import numpy as np

from augmentedautoencoder_tpu.cli.detector_webcam_pose import load_detector
from augmentedautoencoder_tpu.pose.interfaces import BoundingBox, BoundingBoxDetector


class DummyDetector(BoundingBoxDetector):
    def __init__(self, thresh=0.5):
        super().__init__()
        self.thresh = thresh

    def process_raw(self, image):
        return [BoundingBox(0.1, 0.1, 0.4, 0.4, classes={"obj": 0.9})]

    def preprocess_image(self, image, color_format_in, type_in):
        return image


def test_load_detector_by_dotted_path():
    det = load_detector("tests.test_detector_loading:DummyDetector")
    # NB pytest may import this module under a different name; compare by
    # class identity string rather than isinstance
    assert type(det).__name__ == "DummyDetector"
    boxes = det.process(np.zeros((10, 10, 3), np.uint8))
    assert len(boxes) == 1 and boxes[0].best_class == "obj"


def test_load_detector_with_kwargs():
    det = load_detector('tests.test_detector_loading:DummyDetector:{"thresh": 0.7}')
    assert det.thresh == 0.7


def test_clip_bb():
    det = load_detector("tests.test_detector_loading:DummyDetector")
    det._clip_bb = {"xmin": 0.25, "xmax": 0.75, "ymin": 0.25, "ymax": 0.75}
    seen = {}

    orig = det.process_raw

    def spy(image):
        seen["shape"] = image.shape
        return orig(image)

    det.process_raw = spy
    det.process(np.zeros((100, 100, 3), np.uint8))
    assert seen["shape"] == (50, 50, 3)
