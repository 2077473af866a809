"""Reference-free golden tests: cama_tpu vs committed outputs of the reference
implementation (generated once by tools/gen_golden.py).  These carry the
parity guarantees into environments without /root/reference."""
import os

import numpy as np
import pytest

from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.io.scene import compile_scene
from cama_tpu.ops import lift
from cama_tpu.ops.geometry import compose_frame_matrices, project_frame_exact
from cama_tpu.se3 import Trajectory

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def load(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"golden file missing: {name} (run tools/gen_golden.py)")
    return np.load(path, allow_pickle=True)


def test_pose_transformer_golden():
    z = load("pose_transformer.npz")
    tum = z["tum"]
    tr = Trajectory()
    tr.loadarray(tum.copy())
    np.testing.assert_allclose(tr.as_transform(True), z["abs"], atol=1e-12)
    np.testing.assert_allclose(tr.as_transform(False), z["rel"], atol=1e-12)

    tr2 = Trajectory()
    tr2.loadarray(tum.copy())
    tr2.normalize2center()
    np.testing.assert_allclose(tr2.as_transform(True), z["normalized_center"], atol=1e-9)

    tr3 = Trajectory()
    tr3.loadarray(tum.copy())
    tr3.transform(z["extrinsic"])
    np.testing.assert_allclose(tr3.as_transform(True), z["conjugated"], atol=1e-9)

    tr4 = Trajectory()
    tr4.loadarray(tum.copy())
    out, valid = tr4.seek_many(z["seek_queries"], 0.5, interpolate=True)
    np.testing.assert_array_equal(valid, z["seek_valid"])
    np.testing.assert_allclose(out[valid], z["seek_results"][z["seek_valid"]], atol=1e-9)


def test_fixture_projection_golden(tmp_path):
    z = load("fixture_projection.npz")
    clip = make_fixture_clip(tmp_path, n_frames=6, with_images=False,
                             with_lidar=False, seed=0)
    scene = compile_scene(clip, sources=("cama",))
    fp = scene.flat["cama"]
    ours = lift.unflatten_to_instances(fp)
    np.testing.assert_array_equal(
        np.concatenate([i["points"] for i in ours]), z["lift_points"]
    )
    assert [len(i["points"]) for i in ours] == list(z["lift_sizes"])
    assert [i["class"] for i in ours] == list(z["lift_classes"])

    fm = compose_frame_matrices(
        scene.traj["cama"], scene.frame_times, scene.chassis2cam, scene.K_scaled
    )
    pts = fp.points[fp.valid]
    h, w = scene.output_size
    for k, image_idx in enumerate(fm.frame_indices):
        if not fm.frame_valid[k]:
            continue
        cam_outs = project_frame_exact(
            pts, np.linalg.inv(fm.chassis2world_f32[k]), scene.chassis2cam,
            scene.K_scaled, w, h,
        )
        for c, cam in enumerate(scene.camera_list):
            key = f"vu_{image_idx}_{cam}"
            vu, keep = cam_outs[c]
            np.testing.assert_allclose(vu[keep], z[key], atol=1e-9, err_msg=key)


def test_pose_eval_golden():
    from cama_tpu.eval.pose_metrics import PoseEvaluator

    z = load("pose_eval.npz")
    gt, pred = z["gt"], z["pred"]
    for alignment in ["None", "scale", "scale_7dof", "7dof", "6dof"]:
        res = PoseEvaluator(alignment=alignment).eval(gt.copy(), pred.copy())
        for key, val in res.items():
            gkey = f"{alignment}__{key}"
            if gkey not in z.files:
                continue
            expected = z[gkey]
            if key == "quaternion":
                assert abs(np.dot(np.asarray(val), expected)) > 1 - 1e-9
            else:
                np.testing.assert_allclose(val, expected, rtol=1e-7, atol=1e-9,
                                           err_msg=gkey)
