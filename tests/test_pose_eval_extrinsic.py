"""Pose-evaluation CLI --extrinsic branch: re-express the predicted
trajectory through a sensor extrinsic before evaluation
(reference pose_evaluator.py:739-754)."""
import os

import numpy as np
import pytest

from cama_tpu.eval.pose_metrics import main
from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.se3.codec import transforms_to_tum, tum_to_transforms
from cama_tpu.se3.core import inv_se3
from cama_tpu.io.clip import ClipReader


def test_cli_extrinsic_transform(tmp_path, capsys, monkeypatch):
    clip = make_fixture_clip(tmp_path, n_frames=30, with_images=False, with_lidar=False)
    reader = ClipReader(clip)
    # ground truth: chassis-frame odometry
    gt = np.loadtxt(os.path.join(clip, "odometry", "wigo.txt"))
    # prediction: the same trajectory expressed in the camera frame; the CLI
    # must pull it back through camera_front2chassis
    E = reader.extrinsic("camera_front", "chassis")
    T, ts = tum_to_transforms(gt)
    pred_cam = inv_se3(E) @ T @ E
    pred_path = tmp_path / "pred.txt"
    gt_path = tmp_path / "gt.txt"
    np.savetxt(pred_path, transforms_to_tum(pred_cam, ts))
    np.savetxt(gt_path, gt)

    monkeypatch.chdir(clip)  # CLI looks for attribute.json in . or ..
    main(["--pred", str(pred_path), "--gt", str(gt_path),
          "--alignment", "None", "--extrinsic", "camera_front2chassis"])
    out = capsys.readouterr().out
    assert "ATE" in out
    ate = float([l for l in out.splitlines() if l.startswith("ATE")][0].split("=")[1].split()[0])
    assert ate < 1e-6  # exact round-trip through the extrinsic


def test_cli_without_extrinsic_differs(tmp_path, capsys):
    clip = make_fixture_clip(tmp_path, n_frames=30, with_images=False, with_lidar=False)
    gt = np.loadtxt(os.path.join(clip, "odometry", "wigo.txt"))
    reader = ClipReader(clip)
    E = reader.extrinsic("camera_front", "chassis")
    T, ts = tum_to_transforms(gt)
    pred_cam = inv_se3(E) @ T @ E
    pred_path = tmp_path / "pred.txt"
    gt_path = tmp_path / "gt.txt"
    np.savetxt(pred_path, transforms_to_tum(pred_cam, ts))
    np.savetxt(gt_path, gt)
    main(["--pred", str(pred_path), "--gt", str(gt_path), "--alignment", "None"])
    out = capsys.readouterr().out
    ate = float([l for l in out.splitlines() if l.startswith("ATE")][0].split("=")[1].split()[0])
    assert ate > 0.01  # without the extrinsic the frames disagree
