"""ClipReader parity vs the reference DatasetReader, including the auxiliary
sensor readers (IMU/GNSS/wheel JSON) and deprecated Trajectory aliases."""
import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available
from cama_tpu.io.clip import ClipReader
from cama_tpu.io.fixture import make_fixture_clip

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

add_reference_to_path()
from cama.dataset_reader import DatasetReader  # noqa: E402


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    return make_fixture_clip(
        tmp_path_factory.mktemp("aux"), n_frames=6, with_images=False,
        with_lidar=True, with_aux_sensors=True,
    )


@pytest.fixture(scope="module")
def readers(clip):
    return ClipReader(clip), DatasetReader(clip)


def test_sensor_timestamps(readers):
    ours, ref = readers
    for sensor in ["camera_front", "lidar_top", "IMU"]:
        np.testing.assert_array_equal(
            ours.sensor_timestamps(sensor, sync=False),
            ref.get_sensor_timestamp(sensor, sync=False),
        )


def test_extrinsic_graph_paths(readers):
    ours, ref = readers
    for a, b in [("chassis", "camera_front"), ("camera_front", "camera_rear"),
                 ("lidar_top", "camera_front_left"), ("chassis", "chassis")]:
        np.testing.assert_allclose(ours.extrinsic(a, b), ref.get_extrinsic(a, b), atol=1e-12)
    assert sorted(ours.all_sensors()) == sorted(ref.get_all_sensors())


def test_intrinsics(readers):
    ours, ref = readers
    a = ours.intrinsics("camera_front")
    b = ref.get_intrinsics("camera_front")
    np.testing.assert_allclose(a["K"], b["K"])
    assert a["width"] == b["width"] and a["height"] == b["height"]


def test_gnss_tum_matches_reference(readers):
    ours, ref = readers
    np.testing.assert_allclose(ours.gnss_tum(), ref.get_GNSS_tum(), atol=1e-12)


def test_wheel_tum_matches_reference(readers):
    ours, ref = readers
    np.testing.assert_allclose(ours.wheel_tum(sync=False), ref.get_wheel_tum(sync=False),
                               atol=1e-12)


def test_imu_and_lidar_iteration(readers):
    ours, ref = readers
    ours_imu = list(ours.iter_imu())
    ref_imu = list(ref.yield_IMU())
    assert len(ours_imu) == len(ref_imu)
    assert ours_imu[0][0] == ref_imu[0][0]
    assert ours_imu[3][1] == ref_imu[3][1]

    ours_lidar = list(ours.iter_lidar(end_idx=2))
    ref_lidar = list(ref.yield_lidar(end_idx=2))
    assert len(ours_lidar) == len(ref_lidar)
    np.testing.assert_array_equal(ours_lidar[0][1], ref_lidar[0][1])
    assert ours_lidar[0][0] == ref_lidar[0][0]


def test_trajectory_deprecated_aliases():
    import warnings

    from cama_tpu.se3 import Trajectory

    tum = np.zeros((5, 8))
    tum[:, 0] = np.arange(5)
    tum[:, 7] = 1.0
    tum[:, 1] = np.arange(5)
    tr = Trajectory()
    tr.loadarray(tum)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        aa = tr.as_axisangle(absolute=True)
        tr.rotate(np.eye(4))
        assert len(w) == 2
    assert aa.shape == (5, 3)
    np.testing.assert_array_equal(tr.get_timestamps()[:, 0], np.arange(5))
