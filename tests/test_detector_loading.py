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


class TestForegroundContourDetector:
    """Shipped classical detector (pose/detectors.py): the out-of-the-box
    --detector for demos, replacing the reference's trained RetinaNet/SSD
    wiring for foreground-separable scenes."""

    def _det(self, **kw):
        from augmentedautoencoder_tpu.pose.detectors import ForegroundContourDetector

        return ForegroundContourDetector(class_name="obj", min_area=20, **kw)

    def test_two_blobs_boxes_and_scores(self):
        img = np.zeros((100, 200, 3), np.uint8)
        img[10:30, 20:60] = 200          # solid 20x40 blob, fill ratio 1.0
        img[60:80, 120:160] = 200        # blob with a hole: fill ratio 0.75
        img[65:75, 130:150] = 0
        det = self._det()
        boxes = det.process_raw(img)
        assert len(boxes) == 2
        solid = boxes[0]                 # sorted by fill-ratio score
        assert solid.classes["obj"] > boxes[1].classes["obj"]
        assert abs(solid.xmin * 200 - 20) <= 1 and abs(solid.xmax * 200 - 60) <= 1
        assert abs(solid.ymin * 100 - 10) <= 1 and abs(solid.ymax * 100 - 30) <= 1

    def test_min_area_and_speckle_rejected(self):
        img = np.zeros((50, 50, 3), np.uint8)
        img[5, 5] = 255                   # single-pixel speckle
        img[20:23, 20:23] = 255           # 9 px < min_area
        assert self._det().process_raw(img) == []

    def test_depth_image_mode(self):
        depth = np.zeros((60, 60), np.float32)
        depth[10:40, 15:45] = 700.0
        boxes = self._det().process_raw(depth)
        assert len(boxes) == 1
        b = boxes[0]
        assert abs(b.xmin * 60 - 15) <= 1 and abs(b.ymax * 60 - 40) <= 1

    def test_background_subtraction(self):
        bg = np.full((40, 40, 3), 90, np.uint8)
        det = self._det()
        det.set_background(bg)
        img = bg.copy()
        img[10:30, 10:30] = 160           # brighter than bg by > thresh
        boxes = det.process_raw(img)
        assert len(boxes) == 1
        # the whole frame is brighter than thresh vs BLACK — without the
        # background reference this would be one full-frame box
        det2 = self._det()
        full = det2.process_raw(img)
        assert len(full) == 1 and full[0].xmax - full[0].xmin > 0.9

    def test_loadable_by_dotted_path_and_matches_renderer_bbox(self):
        from augmentedautoencoder_tpu.geometry.view_sampler import (
            calc_2d_bbox,
            viewsphere_rotations,
        )
        from augmentedautoencoder_tpu.renderer import Renderer
        from augmentedautoencoder_tpu.renderer.procedural import (
            make_textured_asymmetric,
        )

        det = load_detector(
            "augmentedautoencoder_tpu.pose.detectors:"
            'ForegroundContourDetector:{"class_name": "sphere", "thresh": 5}'
        )
        mesh = make_textured_asymmetric(subdivisions=2, radius=60.0)
        renderer = Renderer([], backend="numpy", meshes=[mesh])
        K = np.array([[300.0, 0, 64], [0, 300.0, 48], [0, 0, 1]])
        R = viewsphere_rotations(12, 4, 300.0)[3]
        bgr, depth = renderer.render(
            0, 128, 96, K, R, np.array([0.0, 0.0, 300.0]), 10, 10000,
            random_light=False,
        )
        boxes = det.process(bgr)
        assert len(boxes) == 1 and boxes[0].best_class == "sphere"
        ys, xs = np.nonzero(depth > 0)
        x, y, w, h = calc_2d_bbox(xs, ys, (128, 96))
        got = boxes[0].to_xywh(128, 96)
        np.testing.assert_allclose(got, [x, y, w, h], atol=3)
