"""Scene renderer, VOC XML, and pose visualizer tests."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from augmentedautoencoder_tpu.renderer import Renderer
from augmentedautoencoder_tpu.renderer.procedural import make_icosphere
from augmentedautoencoder_tpu.renderer.scenerenderer import SceneRenderer
from augmentedautoencoder_tpu.renderer.write_xml import write_voc_xml

K = np.array([[200.0, 0, 90], [0, 200.0, 68], [0, 0, 1.0]])


@pytest.fixture(scope="module")
def bg_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("voc")
    rng = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(str(d / f"bg{i}.jpg"), rng.randint(0, 255, (100, 120, 3), np.uint8))
    return str(d)


class TestSceneRenderer:
    def test_scene_contract(self, bg_dir):
        np.random.seed(0)
        meshes = [make_icosphere(2, 40.0), make_icosphere(2, 60.0)]
        sr = SceneRenderer(
            [], ".", 1.0, 180, 136, K, None, bg_dir,
            min_num_objects_per_scene=2, max_num_objects_per_scene=4,
            min_n_views=12, radius=500.0, obj_ids=[7, 9],
            renderer=Renderer([], backend="numpy", meshes=meshes),
            meshes=meshes,
        )
        bgr, obj_info = sr.render()
        assert bgr.shape == (136, 180, 3) and bgr.dtype == np.uint8
        assert 2 <= len(obj_info) <= 4
        for info in obj_info:
            assert info["id"] in (7, 9)
            x0, y0, x1, y1 = info["bb"]
            assert 0 <= x0 <= x1 <= 180 and 0 <= y0 <= y1 <= 136
        # background is composited (scene is not all black outside objects)
        assert bgr.sum() > 0

    def test_augmenter_hook(self, bg_dir):
        np.random.seed(1)
        meshes = [make_icosphere(1, 40.0)]
        called = {}

        def aug(img):
            called["yes"] = True
            return img // 2

        sr = SceneRenderer(
            [], ".", 1.0, 90, 68, K / 2, aug, bg_dir,
            min_num_objects_per_scene=1, max_num_objects_per_scene=1,
            min_n_views=12, radius=500.0,
            renderer=Renderer([], backend="numpy", meshes=meshes),
            meshes=meshes,
        )
        bgr, _ = sr.render()
        assert called.get("yes") and bgr.max() <= 127


class TestVocXml:
    def test_write_and_parse(self, tmp_path):
        path = write_voc_xml(
            str(tmp_path / "a.xml"), "a.png", 640, 480,
            [{"id": 5, "bb": [10, 20, 110, 220]}],
        )
        root = ET.parse(path).getroot()
        assert root.find("size/width").text == "640"
        obj = root.find("object")
        assert obj.find("name").text == "5"
        assert obj.find("bndbox/xmax").text == "110"


class TestPoseVisualizer:
    def test_overlay(self):
        from augmentedautoencoder_tpu.pose.interfaces import BoundingBox, PoseEstimate
        from augmentedautoencoder_tpu.visualization import PoseVisualizer

        mesh = make_icosphere(2, 60.0)
        ren = Renderer([], backend="numpy", meshes=[mesh])
        vis = PoseVisualizer(ren, {"obj": 0})
        img = np.full((136, 180, 3), 50, np.uint8)
        trafo = np.eye(4)
        trafo[:3, 3] = [0, 0, 0.5]  # meters
        est = PoseEstimate(name="obj", trafo=trafo)
        box = BoundingBox(0.3, 0.3, 0.7, 0.7, classes={"obj": 1.0})
        out = vis.render_poses(img, K, [est], [box])
        assert out.shape == img.shape
        changed = (out != img).any(axis=2)
        assert changed.sum() > 50  # overlay + box drawn
        # green channel boosted in the overlay region (interior, not box edge)
        ys, xs = np.nonzero(changed)
        cy, cx = int(ys.mean()), int(xs.mean())
        assert out[cy, cx, 1] >= img[cy, cx, 1]

    def test_draw_box3d_for_mesh(self):
        from augmentedautoencoder_tpu.visualization.box3d import draw_box3d_for_mesh

        mesh = make_icosphere(2, 60.0)
        img = np.zeros((136, 180, 3), np.uint8)
        R = np.eye(3)
        t = np.array([0.0, 0.0, 400.0])
        out = draw_box3d_for_mesh(img.copy(), mesh, K, R, t)
        assert (out > 0).any()
        # projected box must contain the sphere's projected center
        ys, xs = np.nonzero(out.any(axis=2))
        cx, cy = K[0, 2], K[1, 2]
        assert xs.min() < cx < xs.max() and ys.min() < cy < ys.max()


@pytest.mark.e2e
class TestDetectorDataGenCLIs:
    """Drive the two detector-training-data CLIs end-to-end on tiny
    fixtures (reference detection_utils/generate_syn_det_train.py and
    generate_sixd_train.py)."""

    def test_generate_syn_det_train(self, tmp_path, monkeypatch):
        import sys

        import cv2

        from augmentedautoencoder_tpu.cli import generate_syn_det_train
        from augmentedautoencoder_tpu.renderer.procedural import (
            make_icosphere,
            save_ply,
        )
        from augmentedautoencoder_tpu.renderer.write_xml import parse_voc_xml

        model = tmp_path / "obj.ply"
        save_ply(make_icosphere(subdivisions=1, radius=60.0), str(model))
        voc = tmp_path / "voc"
        voc.mkdir()
        rng = np.random.RandomState(0)
        for i in range(3):
            cv2.imwrite(str(voc / f"bg{i}.jpg"),
                        rng.randint(0, 255, (60, 80, 3), np.uint8))
        out = tmp_path / "out"
        monkeypatch.setattr(sys, "argv", [
            "prog", "--output_path", str(out), "--model_paths", str(model),
            "--vocdevkit_path", str(voc), "--num_scenes", "3",
            "--width", "160", "--height", "120",
            "--K", "[140, 0, 80, 0, 140, 60, 0, 0, 1]",
            "--min_objects", "1", "--max_objects", "2", "--radius", "400",
        ])
        generate_syn_det_train.main()
        imgs = sorted((out / "images").glob("*.png"))
        anns = sorted((out / "annotations").glob("*.xml"))
        assert len(imgs) == len(anns) == 3
        parsed = parse_voc_xml(str(anns[0]))
        assert len(parsed) >= 1
        for obj in parsed:
            x0, y0, x1, y1 = obj["bb"]
            assert 0 <= x0 < x1 <= 160 and 0 <= y0 < y1 <= 120

    def test_generate_sixd_train(self, tmp_path, monkeypatch):
        import json
        import sys

        import cv2

        from augmentedautoencoder_tpu.cli import generate_sixd_train
        from augmentedautoencoder_tpu.renderer.write_xml import parse_voc_xml

        # tiny BOP-layout scene: 2 images with GT bboxes + depth masks
        scene = tmp_path / "bop" / "test" / "000001"
        (scene / "rgb").mkdir(parents=True)
        (scene / "depth").mkdir()
        rng = np.random.RandomState(1)
        gt, gt_info, cam = {}, {}, {}
        for im in range(2):
            cv2.imwrite(str(scene / "rgb" / f"{im:06d}.png"),
                        rng.randint(0, 255, (60, 80, 3), np.uint8))
            depth = np.zeros((60, 80), np.uint16)
            depth[20:40, 30:55] = 500
            cv2.imwrite(str(scene / "depth" / f"{im:06d}.png"), depth)
            gt[str(im)] = [{"obj_id": 7, "cam_R_m2c": list(np.eye(3).ravel()),
                            "cam_t_m2c": [0, 0, 500]}]
            gt_info[str(im)] = [{"bbox_obj": [30, 20, 25, 20],
                                 "bbox_visib": [30, 20, 25, 20],
                                 "visib_fract": 1.0}]
            cam[str(im)] = {"cam_K": [100, 0, 40, 0, 100, 30, 0, 0, 1],
                            "depth_scale": 1.0}
        (scene / "scene_gt.json").write_text(json.dumps(gt))
        (scene / "scene_gt_info.json").write_text(json.dumps(gt_info))
        (scene / "scene_camera.json").write_text(json.dumps(cam))

        voc = tmp_path / "voc"
        voc.mkdir()
        for i in range(2):
            cv2.imwrite(str(voc / f"bg{i}.jpg"),
                        rng.randint(0, 255, (60, 80, 3), np.uint8))

        out = tmp_path / "det_out"
        monkeypatch.setattr(sys, "argv", [
            "prog", "--dataset_path", str(tmp_path / "bop"),
            "--scenes", "1", "--vocdevkit_path", str(voc),
            "--output_path", str(out), "--num_images", "4",
            "--width", "160", "--height", "120",
            "--min_objects", "1", "--max_objects", "3",
        ])
        generate_sixd_train.main()
        imgs = sorted((out / "images").glob("*.png"))
        anns = sorted((out / "annotations").glob("*.xml"))
        assert len(imgs) == len(anns) == 4
        all_objs = [o for a in anns for o in parse_voc_xml(str(a))]
        assert all_objs, "at least one visible annotation expected"
        assert {o["id"] for o in all_objs} == {"7"} or {o["id"] for o in all_objs} == {7}
