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


class TestShippedM3Configs:
    """The filled per-dataset m3 deployment configs
    (cfg_templates/cfg_m3vision/, mirroring reference cfg_m3vision/) must
    parse through the estimator's own config machinery."""

    # reference object coverage per dataset (cfg_m3vision/m3_config_*.cfg)
    EXPECTED = {
        "tless": 30, "ycbv": 21, "lmo": 8, "hb": 16,
        "icbin": 2, "itodd": 28, "tudl": 3,
    }

    def test_all_datasets_parse(self):
        import glob
        import os

        import augmentedautoencoder_tpu as pkg
        from augmentedautoencoder_tpu.config.safe_eval import safe_eval
        from augmentedautoencoder_tpu.pose.estimator import AePoseEstimator

        cfg_dir = os.path.join(
            os.path.dirname(pkg.__file__), "cfg_templates", "cfg_m3vision"
        )
        paths = sorted(glob.glob(os.path.join(cfg_dir, "m3_config_*.cfg")))
        assert len(paths) == len(self.EXPECTED)
        for path in paths:
            ds = os.path.basename(path)[len("m3_config_"):-len(".cfg")]
            args = AePoseEstimator.get_params(path)
            mapping = safe_eval(args.get("auto_pose", "class_2_encoder"))
            assert len(mapping) == self.EXPECTED[ds], (ds, len(mapping))
            for obj_id, exp in mapping.items():
                assert isinstance(obj_id, int)
                assert exp == f"bop_{ds}/obj_{obj_id:06d}"
            assert args.getint("auto_pose", "topk") == 1
            assert args.getboolean("auto_pose", "camPose") is False
            assert args.getboolean("auto_pose", "upright") is False
            assert args.getfloat("external", "inference_time") == 0.15
            # the optional knobs stay commented out in the shipped files
            assert args.get(
                "auto_pose", "serving_precision", fallback="float32"
            ) == "float32"


class TestWebcamVideoStream:
    """Threaded grabber semantics (reference test/webcam_video_stream.py:5-57):
    consumers always read the LATEST frame; stop() joins and releases."""

    class _FakeCapture:
        def __init__(self, *a):
            self.n = 0
            self.released = False
            self.props = {}

        def set(self, prop, val):
            self.props[prop] = val

        def read(self):
            import numpy as np

            self.n += 1
            # int64 frames: the counter must not wrap (the daemon thread can
            # grab thousands of frames between test reads, so a uint8 counter
            # mod 256 makes the monotonicity assertion flaky).
            return True, np.full((4, 4, 3), self.n, dtype=np.int64)

        def release(self):
            self.released = True

    def test_reads_latest_and_stops(self, monkeypatch):
        import time

        import cv2

        from augmentedautoencoder_tpu.pose.webcam_video_stream import (
            WebcamVideoStream,
        )

        fake = {}

        def make(src):
            fake["cap"] = self._FakeCapture(src)
            return fake["cap"]

        monkeypatch.setattr(cv2, "VideoCapture", make)
        vs = WebcamVideoStream(0, 720, 540).start()
        try:
            # frame width/height requested on the capture
            assert cv2.CAP_PROP_FRAME_WIDTH in fake["cap"].props
            f1 = vs.read()
            assert f1 is not None and f1.shape == (4, 4, 3)
            time.sleep(0.05)
            f2 = vs.read()
            # the daemon thread kept grabbing: later read sees a newer frame
            assert int(f2[0, 0, 0]) >= int(f1[0, 0, 0])
        finally:
            vs.stop()
        assert vs.stopped and fake["cap"].released
        # no more grabs after stop
        n = fake["cap"].n
        time.sleep(0.03)
        assert fake["cap"].n == n
