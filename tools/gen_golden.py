#!/usr/bin/env python3
"""Generate committed golden values by running the REFERENCE implementation
(/root/reference) on deterministic synthetic inputs (SURVEY.md §4's
golden-value strategy).  tests/test_golden.py then verifies cama_tpu against
these files with no reference checkout needed.

Run from the repo root:  python tools/gen_golden.py
"""
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

from cama.dataset_reader import DatasetReader  # noqa: E402
from cama.pose_evaluator import PoseEvaluator  # noqa: E402
from cama.pose_transformer import PoseTransformer  # noqa: E402
from cama.reproject import CameraManager, MapManager  # noqa: E402

from cama_tpu.io.fixture import make_fixture_clip  # noqa: E402

OUT = os.path.join(REPO, "tests", "golden")


def deterministic_tum(n=50, seed=7):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = 1600000000.0 + np.arange(n) * 0.1 + rng.uniform(0, 0.01, size=n)
    t.sort()
    xyz = rng.normal(size=(n, 3)) * 20
    return np.concatenate([t[:, None], xyz, q], axis=1)


def golden_pose_transformer():
    tum = deterministic_tum()
    pt = PoseTransformer()
    pt.loadarray(tum.copy())
    out = {"tum": tum, "abs": pt.as_transform(True), "rel": pt.as_transform(False)}
    pt2 = PoseTransformer()
    pt2.loadarray(tum.copy())
    pt2.normalize2center()
    out["normalized_center"] = pt2.as_transform(True)
    E = np.eye(4)
    E[:3, 3] = [1.0, -2.0, 0.5]
    E[:3, :3] = _rot()
    pt3 = PoseTransformer()
    pt3.loadarray(tum.copy())
    pt3.transform(E)
    out["conjugated"] = pt3.as_transform(True)
    out["extrinsic"] = E
    # seeks
    ts = tum[:, 0]
    queries = np.concatenate([ts[1:20] + 0.037, [ts[5]], [(ts[8] + ts[9]) / 2]])
    seeks, valid = [], []
    ptq = PoseTransformer()
    ptq.loadarray(tum.copy())
    for q in queries:
        try:
            seeks.append(ptq.seek_by_timestamp(float(q), 0.5, interpolate=True))
            valid.append(True)
        except RuntimeError:
            seeks.append(np.eye(4))
            valid.append(False)
    out["seek_queries"] = queries
    out["seek_results"] = np.stack(seeks)
    out["seek_valid"] = np.asarray(valid)
    return out


def _rot():
    from scipy.spatial.transform import Rotation as R

    return R.from_euler("zxy", [0.3, -0.1, 0.2]).as_matrix()


def golden_fixture_projection():
    """Reference per-frame vu outputs on the deterministic fixture clip."""
    tmp = tempfile.mkdtemp()
    clip = make_fixture_clip(tmp, n_frames=6, with_images=False, with_lidar=False, seed=0)
    mm = MapManager()
    with open(os.path.join(clip, "maps", "map_labels.json")) as f:
        labels = json.load(f)
    bev = np.load(os.path.join(clip, "maps", "vision_road_mlp_ft.npy"))
    imap0 = mm.calculate_3d_instance_maps(bev, labels)
    dr = DatasetReader(clip)
    pt = PoseTransformer()
    pt.loadarray(dr.get_odometry("scmv_camera_front.txt"))
    pt.right_rotate(dr.get_extrinsic("chassis", "camera_front"))
    cams = ["camera_front_left", "camera_front", "camera_front_right",
            "camera_rear_left", "camera_rear", "camera_rear_right"]
    cm_list = [CameraManager(clip, cam) for cam in cams]
    times = dr.get_sensor_timestamp("camera_front", sync=True)
    out = {"lift_points": np.concatenate([i["points"] for i in imap0]),
           "lift_sizes": np.asarray([len(i["points"]) for i in imap0]),
           "lift_classes": np.asarray([i["class"] for i in imap0], dtype=object)}
    for image_idx in range(1, len(times)):
        c2w = pt.seek_by_timestamp(times[image_idx], t_max_diff=0.5,
                                   interpolate=True).astype(np.float32)
        imap = mm.transform_3d_instance_maps(imap0, np.linalg.inv(c2w))
        imap = mm.crop_3d_instance_maps(imap)
        for cm in cm_list:
            cam_map = mm.transform_3d_instance_maps(imap, cm.get_chassis2camera())
            vu_list = cm.project_to_image(cam_map)
            if vu_list:
                vu = np.concatenate([m["points"] for m in vu_list])
            else:
                vu = np.zeros((0, 2))
            out[f"vu_{image_idx}_{cm.camera_name}"] = vu
    return out


def golden_pose_eval():
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_pose_eval import synthetic_pair

    np.random.seed(0)
    gt, pred = synthetic_pair()
    out = {"gt": gt, "pred": pred}
    for alignment in ["None", "scale", "scale_7dof", "7dof", "6dof"]:
        res = PoseEvaluator(alignment=alignment).eval(gt.copy(), pred.copy())
        for k, v in res.items():
            out[f"{alignment}__{k}"] = np.asarray(v)
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "pose_transformer.npz"),
                        **golden_pose_transformer())
    np.savez_compressed(os.path.join(OUT, "fixture_projection.npz"),
                        **golden_fixture_projection())
    np.savez_compressed(os.path.join(OUT, "pose_eval.npz"), **golden_pose_eval())
    print("golden files written to", OUT)


if __name__ == "__main__":
    main()
