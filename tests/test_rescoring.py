"""compute_eval_errors CLI: re-score an existing eval dir."""

import json
import os
import sys

import numpy as np


def test_rescore_cli(tmp_path, monkeypatch):
    from augmentedautoencoder_tpu.cli import compute_eval_errors

    results = []
    for i in range(10):
        results.append(
            {
                "scene_id": 1, "im_id": i, "obj_id": 5,
                "R": np.eye(3).ravel().tolist(), "t": [0, 0, 700.0],
                "score": 1.0, "time": 0.01,
                "errors": {"re": 2.0 if i < 6 else 30.0, "te": 10.0},
            }
        )
    with open(tmp_path / "results.json", "w") as fh:
        json.dump(results, fh)

    monkeypatch.setattr(
        sys, "argv",
        ["prog", str(tmp_path), "--error_thresh_deg", "5", "--error_thresh_mm", "50"],
    )
    compute_eval_errors.main()

    scores = json.load(open(tmp_path / "scores.json"))
    assert scores["re"]["recall"] == 0.6
    assert scores["te"]["recall"] == 1.0
    assert os.path.exists(tmp_path / "recall_by_metric.png")

    # re-score with a looser rotation threshold
    monkeypatch.setattr(
        sys, "argv", ["prog", str(tmp_path), "--error_thresh_deg", "45"]
    )
    compute_eval_errors.main()
    scores = json.load(open(tmp_path / "scores.json"))
    assert scores["re"]["recall"] == 1.0
