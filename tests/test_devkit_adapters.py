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
