"""Execute the real-devkit adapters (NuScenesDB / NuScenesMapSource) against a
fake `nuscenes` package carrying real-schema table records, so the first run
against the 300 GB dataset is not the first execution of that code
(reference schemas: dataset/nuscenes2clip.py:431-560 and the nuScenes devkit
docs' table definitions)."""
import sys
import types

import numpy as np
import pytest


# --------------------------------------------------------------------------
# fake devkit: real table schemas, minimal behavior
# --------------------------------------------------------------------------

SCENE = {
    "token": "scene-tok-1",
    "log_token": "log-tok-1",
    "nbr_samples": 2,
    "first_sample_token": "samp-1",
    "last_sample_token": "samp-2",
    "name": "scene-0061",
    "description": "Parked truck, construction",
}
LOG = {
    "token": "log-tok-1",
    "logfile": "n008-2018-08-01",
    "vehicle": "n008",
    "date_captured": "2018-08-01",
    "location": "boston-seaport",
}
SAMPLES = [
    {
        "token": "samp-1",
        "timestamp": 1532402927647951,
        "prev": "",
        "next": "samp-2",
        "scene_token": "scene-tok-1",
        "data": {"CAM_FRONT": "sd-cam-1", "LIDAR_TOP": "sd-lid-1"},
    },
    {
        "token": "samp-2",
        "timestamp": 1532402928147847,
        "prev": "samp-1",
        "next": "",
        "scene_token": "scene-tok-1",
        "data": {"CAM_FRONT": "sd-cam-2", "LIDAR_TOP": "sd-lid-2"},
    },
]
TABLES = {
    ("sample_data", "sd-cam-1"): {
        "token": "sd-cam-1",
        "sample_token": "samp-1",
        "ego_pose_token": "ep-1",
        "calibrated_sensor_token": "cs-cam",
        "timestamp": 1532402927612460,
        "fileformat": "jpg",
        "is_key_frame": True,
        "height": 900,
        "width": 1600,
        "filename": "samples/CAM_FRONT/n008-2018-08-01__CAM_FRONT__1532402927612460.jpg",
        "prev": "",
        "next": "sd-cam-2",
    },
    ("calibrated_sensor", "cs-cam"): {
        "token": "cs-cam",
        "sensor_token": "sens-cam-front",
        "translation": [1.70079118954, 0.0159456324149, 1.51095763913],
        "rotation": [0.4998015430569128, -0.5030316162024876,
                     0.4997798114386805, -0.49737083824542755],
        "camera_intrinsic": [
            [1266.417203046554, 0.0, 816.2670197447984],
            [0.0, 1266.417203046554, 491.50706579294757],
            [0.0, 0.0, 1.0],
        ],
    },
    ("ego_pose", "ep-1"): {
        "token": "ep-1",
        "timestamp": 1532402927612460,
        "rotation": [0.5720320396729045, -0.0016977771610471074,
                     0.011798001930183783, -0.8201446642457809],
        "translation": [411.3039349319818, 1180.8903791765097, 0.0],
    },
    ("log", "log-tok-1"): LOG,
    ("scene", "scene-tok-1"): SCENE,
}


class _FakeNuScenes:
    def __init__(self, version, dataroot, verbose=True):
        assert version and dataroot
        self.sample = list(SAMPLES)
        self.scene = [SCENE]

    def get(self, table, token):
        return TABLES[(table, token)]

    def get_sample_data(self, token):
        sd = TABLES[("sample_data", token)]
        cs = TABLES[("calibrated_sensor", sd["calibrated_sensor_token"])]
        return ("/data/" + sd["filename"], [], np.asarray(cs["camera_intrinsic"]))


class _Coords:
    def __init__(self, arr):
        self.coords = [tuple(p) for p in np.asarray(arr, float)]


class _FakeLine:
    def __init__(self, arr):
        arr = np.asarray(arr, float)
        self.is_empty = len(arr) == 0
        self.coords = [tuple(p) for p in arr]


class _FakePolygon:
    def __init__(self, ext, holes=(), valid=True):
        ext = np.asarray(ext, float)
        self.is_empty = len(ext) == 0
        self.is_valid = valid
        self.exterior = _Coords(ext)
        self.interiors = [_Coords(h) for h in holes]


_SQ = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
_HOLE = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)


class _FakeNuScenesMap:
    def __init__(self, dataroot, map_name):
        self.map_name = map_name
        # schema: line layers carry line_token; lane/road_segment carry
        # polygon_token; drivable_area carries polygon_tokens (list)
        self.road_divider = [{"token": "rd-1", "line_token": "l-1"}]
        self.lane_divider = [
            {"token": "ld-1", "line_token": "l-2"},
            {"token": "ld-2", "line_token": "l-empty"},
        ]
        self.ped_crossing = [
            {"token": "pc-1", "polygon_token": "p-1", "road_segment_token": "rs-1"}
        ]
        self.road_segment = [
            {"token": "rs-1", "polygon_token": "p-1", "is_intersection": False},
            {"token": "rs-2", "polygon_token": "p-invalid", "is_intersection": True},
        ]
        self.lane = [{"token": "la-1", "polygon_token": "p-2",
                      "lane_type": "CAR", "from_edge_line_token": "l-1",
                      "to_edge_line_token": "l-2"}]
        self.drivable_area = [{"token": "da-1", "polygon_tokens": ["p-1", "p-2"]}]
        self._lines = {
            "l-1": _FakeLine([[0, 0], [5, 5], [9, 9]]),
            "l-2": _FakeLine([[1, 0], [6, 5]]),
            "l-empty": _FakeLine([]),
        }
        self._polys = {
            "p-1": _FakePolygon(_SQ, holes=[_HOLE]),
            "p-2": _FakePolygon(_SQ + 10),
            "p-invalid": _FakePolygon(_SQ, valid=False),
        }

    def extract_line(self, token):
        return self._lines[token]

    def extract_polygon(self, token):
        return self._polys[token]


@pytest.fixture()
def fake_devkit(monkeypatch):
    nusc_mod = types.ModuleType("nuscenes")
    nusc_sub = types.ModuleType("nuscenes.nuscenes")
    nusc_sub.NuScenes = _FakeNuScenes
    map_pkg = types.ModuleType("nuscenes.map_expansion")
    map_api = types.ModuleType("nuscenes.map_expansion.map_api")
    map_api.NuScenesMap = _FakeNuScenesMap
    nusc_mod.nuscenes = nusc_sub
    nusc_mod.map_expansion = map_pkg
    map_pkg.map_api = map_api
    for name, mod in [("nuscenes", nusc_mod), ("nuscenes.nuscenes", nusc_sub),
                      ("nuscenes.map_expansion", map_pkg),
                      ("nuscenes.map_expansion.map_api", map_api)]:
        monkeypatch.setitem(sys.modules, name, mod)
    yield


# --------------------------------------------------------------------------
# second recorded schema snapshot: v1.0-trainval features the mini snapshot
# above does not exercise (round-4 verdict #7 — harden the adapters against
# table-content drift before the first 300 GB run):
#   * a LIDAR calibrated_sensor whose camera_intrinsic is the EMPTY list
#     (real devkit convention for non-camera sensors)
#   * non-keyframe sweep rows inside the sample_data prev/next chain
#     (is_key_frame False; trainval/mini both carry sweeps/)
#   * a second log location (singapore-onenorth) and an empty description
#   * map records where drivable_area carries ONLY polygon_tokens and
#     road_segment ONLY polygon_token (each missing the other key)
# --------------------------------------------------------------------------

SCENE_TV = {
    "token": "scene-tv-1",
    "log_token": "log-tv-1",
    "nbr_samples": 1,
    "first_sample_token": "samp-tv-1",
    "last_sample_token": "samp-tv-1",
    "name": "scene-0103",
    "description": "",
}
LOG_TV = {
    "token": "log-tv-1",
    "logfile": "n015-2018-07-24",
    "vehicle": "n015",
    "date_captured": "2018-07-24",
    "location": "singapore-onenorth",
}
SAMPLES_TV = [{
    "token": "samp-tv-1",
    "timestamp": 1532402930047951,
    "prev": "",
    "next": "",
    "scene_token": "scene-tv-1",
    "data": {"CAM_FRONT": "sd-tv-cam-1", "LIDAR_TOP": "sd-tv-lid-1"},
}]
TABLES_TV = {
    ("sample_data", "sd-tv-cam-1"): {
        "token": "sd-tv-cam-1",
        "sample_token": "samp-tv-1",
        "ego_pose_token": "ep-1",
        "calibrated_sensor_token": "cs-cam",
        "timestamp": 1532402930012460,
        "fileformat": "jpg",
        "is_key_frame": True,
        "height": 900,
        "width": 1600,
        "filename": "samples/CAM_FRONT/n015__CAM_FRONT__1532402930012460.jpg",
        "prev": "",
        "next": "sd-tv-cam-sweep",
    },
    # a SWEEP row in the chain: is_key_frame False, file under sweeps/
    ("sample_data", "sd-tv-cam-sweep"): {
        "token": "sd-tv-cam-sweep",
        "sample_token": "samp-tv-1",
        "ego_pose_token": "ep-1",
        "calibrated_sensor_token": "cs-cam",
        "timestamp": 1532402930112460,
        "fileformat": "jpg",
        "is_key_frame": False,
        "height": 900,
        "width": 1600,
        "filename": "sweeps/CAM_FRONT/n015__CAM_FRONT__1532402930112460.jpg",
        "prev": "sd-tv-cam-1",
        "next": "",
    },
    ("sample_data", "sd-tv-lid-1"): {
        "token": "sd-tv-lid-1",
        "sample_token": "samp-tv-1",
        "ego_pose_token": "ep-1",
        "calibrated_sensor_token": "cs-lid",
        "timestamp": 1532402930047951,
        "fileformat": "pcd",
        "is_key_frame": True,
        "height": 0,
        "width": 0,
        "filename": "samples/LIDAR_TOP/n015__LIDAR_TOP__1532402930047951.pcd.bin",
        "prev": "",
        "next": "",
    },
    # non-camera calibrated_sensor: camera_intrinsic is the EMPTY list
    ("calibrated_sensor", "cs-lid"): {
        "token": "cs-lid",
        "sensor_token": "sens-lidar-top",
        "translation": [0.943713, 0.0, 1.84023],
        "rotation": [0.7077955119163518, -0.006492242056004365,
                     0.010646214713995808, -0.7063073142877817],
        "camera_intrinsic": [],
    },
    ("calibrated_sensor", "cs-cam"): TABLES[("calibrated_sensor", "cs-cam")],
    ("ego_pose", "ep-1"): TABLES[("ego_pose", "ep-1")],
    ("log", "log-tv-1"): LOG_TV,
    ("scene", "scene-tv-1"): SCENE_TV,
}


class _FakeNuScenesTrainval(_FakeNuScenes):
    def __init__(self, version, dataroot, verbose=True):
        assert version == "v1.0-trainval" and dataroot
        self.sample = list(SAMPLES_TV)
        self.scene = [SCENE_TV]

    def get(self, table, token):
        return TABLES_TV[(table, token)]

    def get_sample_data(self, token):
        sd = TABLES_TV[("sample_data", token)]
        cs = TABLES_TV[("calibrated_sensor", sd["calibrated_sensor_token"])]
        return ("/data/" + sd["filename"], [],
                np.asarray(cs["camera_intrinsic"]))


class _FakeNuScenesMapTV(_FakeNuScenesMap):
    """Map snapshot where each polygon layer carries ONLY its own token
    key (no cross-contamination): the adapter's polygon_token/
    polygon_tokens fallback must handle either being absent."""

    def __init__(self, dataroot, map_name):
        super().__init__(dataroot, map_name)
        self.road_segment = [
            {"token": "rs-tv", "polygon_token": "p-1",
             "is_intersection": False}]
        self.drivable_area = [{"token": "da-tv",
                               "polygon_tokens": ["p-2"]}]


class _FakeNuScenesAnyVersion:
    """Dispatch on the version string like the real devkit loader does."""

    def __new__(cls, version, dataroot, verbose=True):
        impl = (_FakeNuScenesTrainval if version == "v1.0-trainval"
                else _FakeNuScenes)
        return impl(version, dataroot, verbose=verbose)


@pytest.fixture()
def fake_devkit_trainval(monkeypatch, fake_devkit):
    monkeypatch.setattr(sys.modules["nuscenes.nuscenes"], "NuScenes",
                        _FakeNuScenesAnyVersion)
    monkeypatch.setattr(sys.modules["nuscenes.map_expansion.map_api"],
                        "NuScenesMap", _FakeNuScenesMapTV)
    yield


def test_nuscenes_db_adapter_trainval_schema(fake_devkit_trainval):
    """The adapters against the SECOND recorded schema snapshot."""
    from cama_tpu.convert.nuscenes import NuScenesDB, NuScenesMapSource

    db = NuScenesDB("v1.0-trainval", "/data/nuscenes")
    assert db.scenes[0]["description"] == ""
    assert db.get("log", "log-tv-1")["location"] == "singapore-onenorth"
    # lidar calibrated_sensor: empty intrinsic must come through as an
    # empty array, not crash
    assert db.cam_intrinsic("sd-tv-lid-1").size == 0
    # sweep rows are reachable through the chain with is_key_frame False
    sweep = db.get("sample_data",
                   db.get("sample_data", "sd-tv-cam-1")["next"])
    assert sweep["is_key_frame"] is False
    assert sweep["filename"].startswith("sweeps/")

    src = NuScenesMapSource("/data/nuscenes")
    # polygon_token-only and polygon_tokens-only layers both extract
    assert len(src.polygon_layer("singapore-onenorth", "road_segment")) == 1
    assert len(src.polygon_layer("singapore-onenorth", "drivable_area")) == 1


def test_nuscenes_db_adapter(fake_devkit):
    from cama_tpu.convert.nuscenes import NuScenesDB

    db = NuScenesDB("v1.0-mini", "/data/nuscenes")
    assert [s["token"] for s in db.samples] == ["samp-1", "samp-2"]
    assert db.scenes[0]["name"] == "scene-0061"
    sd = db.get("sample_data", "sd-cam-1")
    assert sd["filename"].startswith("samples/CAM_FRONT/")
    K = db.cam_intrinsic("sd-cam-1")
    assert K.shape == (3, 3) and abs(K[0, 0] - 1266.417203046554) < 1e-9
    assert db.file_path(sd["filename"]).startswith("/data/nuscenes/samples/")
    ep = db.get("ego_pose", sd["ego_pose_token"])
    assert len(ep["rotation"]) == 4 and len(ep["translation"]) == 3
    assert db.get("log", "log-tok-1")["location"] == "boston-seaport"


def test_nuscenes_map_source_adapter(fake_devkit):
    from cama_tpu.convert.nuscenes import NuScenesMapSource

    src = NuScenesMapSource("/data/nuscenes")
    assert set(src.apis) == set(NuScenesMapSource.MAPS)

    lines = src.line_layer("boston-seaport", "lane_divider")
    assert len(lines) == 1  # the empty line is skipped
    np.testing.assert_allclose(lines[0], [[1, 0], [6, 5]])

    # polygon_token schema (road_segment / lane): invalid geometry skipped,
    # closing vertex stripped, holes preserved
    polys = src.polygon_layer("boston-seaport", "road_segment")
    assert len(polys) == 1
    ext, holes = polys[0]
    assert len(ext) == 4 and len(holes) == 1 and len(holes[0]) == 4
    np.testing.assert_allclose(ext, _SQ[:-1])

    # polygon_tokens (list) schema: drivable_area yields both polygons
    polys = src.polygon_layer("boston-seaport", "drivable_area")
    assert len(polys) == 2


def test_map_source_feeds_vectorized_local_map(fake_devkit):
    """End-to-end: the devkit adapter drives VectorizedLocalMap extraction."""
    from cama_tpu.convert.nuscenes import NuScenesMapSource
    from cama_tpu.convert.vecmap import VectorizedLocalMap

    src = NuScenesMapSource("/data/nuscenes")
    vmap = VectorizedLocalMap(src, patch_size=(60, 30))
    out = vmap.gen_vectorized_samples(
        "boston-seaport",
        lidar2global_translation=[5.0, 5.0, 0.0],
        lidar2global_rotation=[1.0, 0.0, 0.0, 0.0],
        patch_size=(60, 30),
        patch_center=(5.0, 5.0),
    )
    assert len(out["gt_vecs_pts_loc"]) > 0
    assert set(out["gt_vecs_label"]) <= {0, 1, 2}
