"""End-to-end geometry parity on the synthetic fixture clip: our lifting and
projection vs the reference MapManager/CameraManager/PoseTransformer chain
(replicating ClipManager.yield_frame + project_all_camera, cama/dataset.py:78-117,
run live from /root/reference)."""
import json
import os

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available
from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.io.scene import compile_scene
from cama_tpu.ops import lift
from cama_tpu.ops.geometry import (
    compose_frame_matrices,
    crop_bounds,
    project_frame_exact,
    project_frames,
)

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

add_reference_to_path()
from cama.dataset_reader import DatasetReader  # noqa: E402
from cama.pose_transformer import PoseTransformer  # noqa: E402
from cama.reproject import CameraManager, MapManager  # noqa: E402


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    root = tmp_path_factory.mktemp("fixture")
    return make_fixture_clip(root, n_frames=8, with_images=False, with_lidar=False)


@pytest.fixture(scope="module")
def scene(clip):
    return compile_scene(clip)


def reference_instances(clip, source):
    mm = MapManager()
    with open(os.path.join(clip, "maps", f"map_{'labels' if source == 'cama' else 'nuscenes'}.json")) as f:
        labels = json.load(f)
    if source == "cama":
        bev = np.load(os.path.join(clip, "maps", "vision_road_mlp_ft.npy"))
        return mm.calculate_3d_instance_maps(bev, labels)
    return mm.load_3d_instance_maps(labels)


def reference_chassis_traj(clip, source):
    dr = DatasetReader(clip)
    pt = PoseTransformer()
    if source == "cama":
        chassis2cam = dr.get_extrinsic("chassis", "camera_front")
        pt.loadarray(dr.get_odometry("scmv_camera_front.txt"))
        pt.right_rotate(chassis2cam)
    else:
        pt.loadarray(dr.get_odometry("wigo_offset_clip.txt"))
        pt.normalize2center()
    return dr, pt


def reference_frame_outputs(clip, source):
    """Replicates ClipManager.yield_frame + project_all_camera with reference
    primitives. Returns {frame_idx: {camera: [(cls, vu array)]}}."""
    mm = MapManager()
    instance_map0 = reference_instances(clip, source)
    dr, pt = reference_chassis_traj(clip, source)
    cm_list = [CameraManager(clip, cam) for cam in
               ["camera_front_left", "camera_front", "camera_front_right",
                "camera_rear_left", "camera_rear", "camera_rear_right"]]
    times = dr.get_sensor_timestamp("camera_front", sync=True)
    out = {}
    for image_idx in range(1, len(times)):
        try:
            chassis2world = pt.seek_by_timestamp(
                times[image_idx], t_max_diff=0.5, interpolate=True
            ).astype(np.float32)
        except RuntimeError:
            continue
        world2chassis = np.linalg.inv(chassis2world)
        imap = mm.transform_3d_instance_maps(instance_map0, world2chassis)
        imap = mm.crop_3d_instance_maps(imap)
        frame = {}
        for cm in cm_list:
            cam_map = mm.transform_3d_instance_maps(imap, cm.get_chassis2camera())
            maps_2d = cm.project_to_image(cam_map)
            frame[cm.camera_name] = [(m["class"], m["points"]) for m in maps_2d]
        out[image_idx] = frame
    return out


@pytest.mark.parametrize("source", ["cama", "nuscenes"])
def test_lift_bit_exact(clip, scene, source):
    ref = reference_instances(clip, source)
    ours = lift.unflatten_to_instances(scene.flat[source])
    assert len(ref) == len(ours)
    for r, o in zip(ref, ours):
        assert r["class"] == o["class"]
        assert r["points"].dtype == o["points"].dtype
        np.testing.assert_array_equal(r["points"], o["points"])


@pytest.mark.parametrize("source", ["cama", "nuscenes"])
def test_trajectory_parity(clip, scene, source):
    _, pt = reference_chassis_traj(clip, source)
    np.testing.assert_allclose(
        scene.traj[source].as_transform(True), pt.as_transform(True), atol=1e-9
    )


def _flatten_ref_frame(frame_cam_list):
    """Reference per-instance (cls, vu) lists -> flat arrays in paint order."""
    if not frame_cam_list:
        return np.zeros((0, 2)), []
    vus, classes = [], []
    for cls, vu in frame_cam_list:
        vus.append(vu)
        classes += [cls] * len(vu)
    return np.concatenate(vus, axis=0), classes


@pytest.mark.parametrize("source", ["cama", "nuscenes"])
def test_exact_host_projection_matches_reference(clip, scene, source):
    ref_out = reference_frame_outputs(clip, source)
    fm = compose_frame_matrices(
        scene.traj[source], scene.frame_times, scene.chassis2cam, scene.K_scaled
    )
    fp = scene.flat[source]
    pts = fp.points[fp.valid]
    cls = fp.cls[fp.valid]
    h, w = scene.output_size
    assert set(ref_out.keys()) == set(fm.frame_indices[fm.frame_valid].tolist())
    for k, image_idx in enumerate(fm.frame_indices):
        if not fm.frame_valid[k]:
            assert image_idx not in ref_out
            continue
        cam_outs = project_frame_exact(
            pts, np.linalg.inv(fm.chassis2world_f32[k]), scene.chassis2cam,
            scene.K_scaled, w, h,
        )
        for c, cam in enumerate(scene.camera_list):
            ref_vu, ref_cls = _flatten_ref_frame(ref_out[image_idx][cam])
            vu, keep = cam_outs[c]
            ours_vu = vu[keep]
            ours_cls = [fp.class_names[i] for i in cls[keep]]
            assert len(ref_vu) == len(ours_vu), f"frame {image_idx} {cam}"
            np.testing.assert_allclose(ours_vu, ref_vu, atol=1e-9)
            assert ours_cls == ref_cls


@pytest.mark.parametrize("source", ["cama", "nuscenes"])
def test_device_projection_close_to_reference(clip, scene, source):
    import jax.numpy as jnp

    ref_out = reference_frame_outputs(clip, source)
    fm = compose_frame_matrices(
        scene.traj[source], scene.frame_times, scene.chassis2cam, scene.K_scaled
    )
    points, cls, valid = scene.device_points(source)
    lo, hi = crop_bounds()
    h, w = scene.output_size
    vu, keep = project_frames(
        points, valid,
        jnp.asarray(fm.A, dtype=jnp.float32),
        jnp.asarray(fm.B, dtype=jnp.float32),
        jnp.asarray(fm.frame_valid),
        w, h, jnp.asarray(lo), jnp.asarray(hi),
    )
    vu = np.asarray(vu)
    keep = np.asarray(keep)
    total = agree = 0
    for k, image_idx in enumerate(fm.frame_indices):
        if not fm.frame_valid[k]:
            assert not keep[k].any()
            continue
        for c, cam in enumerate(scene.camera_list):
            ref_vu, _ = _flatten_ref_frame(ref_out[image_idx][cam])
            ours = vu[k, c][keep[k, c]]
            # masks may flip for points within float32 noise of a boundary;
            # demand < 0.1% disagreement on membership
            assert abs(len(ours) - len(ref_vu)) <= max(2, 0.001 * max(len(ref_vu), 1))
            n = min(len(ours), len(ref_vu))
            if n:
                # compare the int-cast pixels the renderer consumes
                a = ours[:n].astype(np.int32)
                b = ref_vu[:n].astype(np.int32)
                agree += (np.all(a == b, axis=1)).sum()
                total += n
                np.testing.assert_allclose(ours[:n], ref_vu[:n], atol=0.1)
    assert total > 0
    assert agree / total > 0.995, f"pixel agreement {agree}/{total}"


def test_skip_frame_semantics(tmp_path):
    """Dropping scmv rows creates a >0.5 s gap; those frames must be skipped
    in BOTH implementations (cama/dataset.py:93-96)."""
    clip = make_fixture_clip(tmp_path, n_frames=10, with_images=False,
                             with_lidar=False, drop_scmv_rows=(3, 4, 5, 6, 7, 8))
    scene = compile_scene(clip)
    ref_out = reference_frame_outputs(clip, "cama")
    fm = compose_frame_matrices(
        scene.traj["cama"], scene.frame_times, scene.chassis2cam, scene.K_scaled
    )
    ours_valid = set(fm.frame_indices[fm.frame_valid].tolist())
    assert ours_valid == set(ref_out.keys())
    assert len(ours_valid) < len(fm.frame_indices)  # something was skipped
