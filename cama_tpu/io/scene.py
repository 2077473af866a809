"""Scene compiler: clip directory -> device-resident padded tensors.

This is the checkpoint artifact of the TPU build (SURVEY.md §5): everything
the per-frame pipeline needs — flattened label points per source, pose
trajectories, calibration — compiled once per scene.  The lifting
(densify + height gather) is host-side and bit-exact to the reference
(cama/reproject.py:42-106 — see cama_tpu.ops.lift); bulk per-frame math then
runs on device from these tensors.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from cama_tpu.io.clip import ClipReader
from cama_tpu.ops import lift
from cama_tpu.se3.core import inv_se3
from cama_tpu.se3.trajectory import Trajectory

DEFAULT_CAMA_CONFIGS = {
    # mirrors config.yaml:18-25 of the reference
    "result_dir": "maps",
    "camera_list": [
        "camera_front_left", "camera_front", "camera_front_right",
        "camera_rear_left", "camera_rear", "camera_rear_right",
    ],
    "camera_main": "camera_front",
    "height_mlp": "vision_road_mlp_ft.npy",
    "pose_prefix": "scmv",
    "cama_map_file": "map_labels.json",
    "nuscenes_map_file": "map_nuscenes.json",
    # extension: BEV map extent in meters (600 for v2 labels, 300 for v1 —
    # the reference requires editing reproject.py:26 by hand, README.md:29)
    "map_size_m": 600.0,
    # extensions: pre-undistorted frame store (io.frame_cache) — decode+remap
    # each JPEG once per clip; frame_cache_dir relocates it off the clip dir;
    # fast_decode opts into half-resolution JPEG decode for cache builds
    # (NOT byte-identical to the reference)
    "frame_cache": True,
    "frame_cache_dir": None,
    "fast_decode": False,
    # writer wall-clock budget for cache population (fraction of one core;
    # None = FrameCache.WRITE_BUDGET default, 1.0 = unthrottled).  Measured
    # round 4: unthrottled population costs a cold video pass ~40-50% of its
    # throughput on a 1-core host; the budget keeps first visits fast and
    # the store converges over runs
    "frame_cache_budget": None,
    # GT-mask store keying: hash ENTIRE lane_ins PNGs instead of the default
    # size + 8 KiB head/tail windows — closes the same-size middle-only
    # rewrite hole for >16 KiB files at the cost of reading every PNG once
    # per key resolution (pipeline._gt_stat_key / refresh_gt_cache)
    "gt_cache_full_hash": False,
    # overlay device program: 'auto' (CLI default — first chunks through the
    # seconds-to-compile scatter program, production compact program warms
    # in the background), 'compact', 'two_stage' via counting, 'scatter',
    # 'pallas'; None = the ClipPipeline constructor default ('compact')
    "raster_kernel": None,
    # extension: persist the compiled scene tensors (lift + densify + pose
    # chains) under {clip}/.cama_tpu — the SURVEY §5 checkpoint artifact —
    # so re-runs skip lifting entirely; scene_cache_dir relocates the file
    "scene_cache": True,
    "scene_cache_dir": None,
}

OUTPUT_SIZE = (540, 960)  # (h, w), reference CameraManager default


@dataclass
class Scene:
    clip_path: str
    camera_list: list
    camera_main: str
    output_size: tuple  # (h, w)
    # calibration (host float64)
    K_orig: np.ndarray  # [C, 3, 3]
    K_scaled: np.ndarray  # [C, 3, 3] rescaled to output_size
    d: np.ndarray  # [C, 8]
    image_size: tuple  # (h, w) original
    cam2chassis: np.ndarray  # [C, 4, 4]
    chassis2cam: np.ndarray  # [C, 4, 4]
    # frames
    frame_times: np.ndarray  # [N] float64 seconds (sync, camera_main)
    sync_ms: dict = field(repr=False, default=None)  # sensor -> [N] ms ints
    # label sources -> flattened points; pose chains
    flat: dict = field(default_factory=dict)  # source -> lift.FlatPoints
    traj: dict = field(default_factory=dict)  # source -> se3.Trajectory
    reader: ClipReader = field(repr=False, default=None)
    from_cache: bool = False  # True when served by load_scene_cache

    @property
    def sources(self):
        return sorted(self.flat.keys())

    def image_path(self, camera, index, sync=True):
        ts = self.sync_ms[camera][index] if sync else self.reader.sensor_timestamps_ms(camera, False)[index]
        return os.path.join(self.clip_path, camera, f"{ts}.jpg")

    def device_points(self, source):
        """(points [P,3] f32, cls [P] i32, valid [P] bool) as jnp arrays."""
        import jax.numpy as jnp

        fp = self.flat[source]
        return (
            jnp.asarray(fp.points),
            jnp.asarray(fp.cls),
            jnp.asarray(fp.valid),
        )


def build_chassis_trajectory(reader, source, configs=None):
    """chassis2world pose chains, shared by the pipeline and LiDAR
    aggregation:

      'cama'        SfM camera_front poses right-multiplied by
                    chassis->camera_front (cama/dataset.py:60-69)
      'nuscenes' /
      'wigo_offset' recentered ego odometry (cama/dataset.py:71-76)
      'wigo'        raw ego odometry, global UTM frame
    """
    configs = {**DEFAULT_CAMA_CONFIGS, **(configs or {})}
    tr = Trajectory()
    if source == "cama":
        camera_main = configs["camera_main"]
        chassis2cam_main = reader.extrinsic("chassis", camera_main)
        tr.loadarray(reader.odometry(f"{configs['pose_prefix']}_{camera_main}.txt"))
        tr.right_rotate(chassis2cam_main)
    elif source in ("nuscenes", "wigo_offset"):
        tr.loadarray(reader.odometry("wigo_offset_clip.txt"))
        tr.normalize2center()
    elif source == "wigo":
        tr.loadarray(reader.odometry("wigo.txt"))
    else:
        raise ValueError(f"unknown pose source {source}")
    return tr


def save_scene_cache(scene, path, cache_key=""):
    """Persist the compiled device-layout tensors (the checkpoint artifact of
    the TPU build, SURVEY.md §5: conversion + lifting never re-run)."""
    payload = {
        "cache_key": np.asarray(cache_key),
        "camera_list": np.asarray(scene.camera_list, dtype=object),
        "camera_main": scene.camera_main,
        "output_size": np.asarray(scene.output_size),
        "K_orig": scene.K_orig, "K_scaled": scene.K_scaled, "d": scene.d,
        "image_size": np.asarray(scene.image_size),
        "cam2chassis": scene.cam2chassis, "chassis2cam": scene.chassis2cam,
        "frame_times": scene.frame_times,
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    for src, fp in scene.flat.items():
        payload[f"flat_{src}_points"] = fp.points
        payload[f"flat_{src}_cls"] = fp.cls
        payload[f"flat_{src}_inst"] = fp.inst
        payload[f"flat_{src}_valid"] = fp.valid
        payload[f"flat_{src}_names"] = np.asarray(fp.class_names, dtype=object)
        tr = scene.traj[src]
        payload[f"traj_{src}_T"] = tr.as_transform(True)
        payload[f"traj_{src}_ts"] = tr.timestamps
    # write-then-rename: a concurrent run reading `path` must never see a
    # partially written zip (the frame cache uses the same discipline)
    tmp = f"{path}.tmp{os.getpid()}"
    try:
        np.savez_compressed(tmp, **payload)
        # savez appends .npz when missing; our tmp has no .npz suffix
        written = tmp if os.path.exists(tmp) else tmp + ".npz"
        os.replace(written, path)
    except BaseException:
        for cand in (tmp, tmp + ".npz"):
            try:
                os.remove(cand)
            except OSError:
                pass
        raise
    return path


def load_scene_cache(path, clip_path):
    """Rebuild a Scene from a cache file (attribute.json is still read for
    image paths / sync tables)."""
    from cama_tpu.ops.lift import FlatPoints
    from cama_tpu.se3.trajectory import Trajectory

    z = np.load(path, allow_pickle=True)
    reader = ClipReader(clip_path)
    flat, traj = {}, {}
    for key in z.files:
        if key.startswith("flat_") and key.endswith("_points"):
            src = key[len("flat_"):-len("_points")]
            flat[src] = FlatPoints(
                z[f"flat_{src}_points"], z[f"flat_{src}_cls"], z[f"flat_{src}_inst"],
                z[f"flat_{src}_valid"], list(z[f"flat_{src}_names"]),
            )
            tr = Trajectory()
            tr.from_absolute_transform(z[f"traj_{src}_T"])
            tr.timestamps = z[f"traj_{src}_ts"]
            traj[src] = tr
    return Scene(
        clip_path=str(clip_path),
        camera_list=list(z["camera_list"]),
        camera_main=str(z["camera_main"]),
        output_size=tuple(int(v) for v in z["output_size"]),
        K_orig=z["K_orig"], K_scaled=z["K_scaled"], d=z["d"],
        image_size=tuple(int(v) for v in z["image_size"]),
        cam2chassis=z["cam2chassis"], chassis2cam=z["chassis2cam"],
        frame_times=z["frame_times"],
        sync_ms={s: list(v) for s, v in reader.attribute["sync"].items()},
        flat=flat, traj=traj, reader=reader, from_cache=True,
    )


def _file_sig(path):
    """Content signature of one input file: (size, sha256 of head+tail MB).
    mtimes are useless here — the CLI re-extracts the label zip every run,
    refreshing mtimes of identical bytes; hashing the full 144 MB height
    grid every compile would cost ~0.5 s, so big files sign by their first
    and last megabyte plus exact size."""
    import hashlib

    try:
        st = os.stat(path)
    except OSError:
        return ("absent",)
    h = hashlib.sha256()
    with open(path, "rb") as f:
        h.update(f.read(1 << 20))
        if st.st_size > (2 << 20):
            f.seek(-(1 << 20), 2)
        h.update(f.read(1 << 20))
    return (st.st_size, h.hexdigest())


def _clip_content_sig(clip_path, configs, sources):
    """Signatures of every clip file whose content flows into the compiled
    tensors — labels, height grid, odometry, attribute.json.  A cache built
    before the label zip was extracted (or from a re-converted clip) must
    not be served (the round-3 reviewer's stale-scene scenario)."""
    result_dir = configs["result_dir"]
    files = [os.path.join(clip_path, "attribute.json"),
             os.path.join(clip_path, "odometry", "wigo_offset_clip.txt")]
    if "cama" in sources:
        files += [
            os.path.join(clip_path, "odometry",
                         f"{configs['pose_prefix']}_{configs['camera_main']}.txt"),
            os.path.join(clip_path, result_dir, configs["cama_map_file"]),
            os.path.join(clip_path, result_dir, configs["height_mlp"]),
        ]
    if "nuscenes" in sources:
        files.append(os.path.join(clip_path, result_dir,
                                  configs["nuscenes_map_file"]))
    return tuple((os.path.basename(f),) + _file_sig(f) for f in files)


def _scene_cache_key(configs, sources, output_size, pad_multiple, clip_path=None):
    """Compilation parameters AND input-content signatures that change the
    cached tensors — a cache built with different sources / map size /
    output size / label bytes must not be served."""
    content = (_clip_content_sig(str(clip_path), configs, sources)
               if clip_path is not None else ())
    return repr((tuple(sorted(sources)), tuple(output_size), int(pad_multiple),
                 float(configs.get("map_size_m", 600.0)),
                 tuple(configs.get("camera_list", ())),
                 configs.get("pose_prefix"), configs.get("cama_map_file"),
                 configs.get("nuscenes_map_file"), content))


def compile_scene(clip_path, configs=None, sources=("cama", "nuscenes"),
                  output_size=OUTPUT_SIZE, pad_multiple=1024, cache=None):
    configs = {**DEFAULT_CAMA_CONFIGS, **(configs or {})}
    key = _scene_cache_key(configs, sources, output_size, pad_multiple,
                           clip_path=clip_path)
    if cache and os.path.exists(cache):
        try:
            stored = np.load(cache, allow_pickle=True)
            if str(stored.get("cache_key", "")) == key:
                return load_scene_cache(cache, clip_path)
            # parameters changed since the cache was written: recompile below
            # (and overwrite) instead of silently serving mismatched tensors
        except Exception:  # corrupt/truncated cache (crashed writer, foreign
            pass           # bytes — np.load raises several unrelated types):
            #                recompile and overwrite
    reader = ClipReader(clip_path)
    camera_list = configs["camera_list"]
    camera_main = configs["camera_main"]

    C = len(camera_list)
    K_orig = np.zeros((C, 3, 3))
    K_scaled = np.zeros((C, 3, 3))
    d = np.zeros((C, 8))
    cam2chassis = np.zeros((C, 4, 4))
    chassis2cam = np.zeros((C, 4, 4))
    img_h = img_w = None
    for i, cam in enumerate(camera_list):
        intr = reader.intrinsics(cam)
        K_orig[i] = intr["K"]
        d[i, : len(intr["d"])] = intr["d"]
        img_w, img_h = intr["width"], intr["height"]
        # reference K rescale (cama/reproject.py:180-182)
        K = intr["K"].copy()
        K[0, :] = K[0, :] * output_size[1] / img_w
        K[1, :] = K[1, :] * output_size[0] / img_h
        K_scaled[i] = K
        chassis2cam[i] = reader.extrinsic("chassis", cam)
        cam2chassis[i] = inv_se3(chassis2cam[i])

    result_dir = configs["result_dir"]
    flat, traj = {}, {}
    if "cama" in sources:
        label_path = os.path.join(clip_path, result_dir, configs["cama_map_file"])
        if os.path.exists(label_path):
            labels = reader.map_json(result_dir, configs["cama_map_file"])
            grid = reader.height_grid(result_dir, configs["height_mlp"])
            m = float(configs.get("map_size_m", 600.0))
            instances = lift.lift_cama_instances(labels, grid, map_width=m, map_height=m)
            flat["cama"] = lift.flatten_instances(instances, pad_multiple=pad_multiple)
            traj["cama"] = build_chassis_trajectory(reader, "cama", configs)
    if "nuscenes" in sources:
        label_path = os.path.join(clip_path, result_dir, configs["nuscenes_map_file"])
        if os.path.exists(label_path):
            labels = reader.map_json(result_dir, configs["nuscenes_map_file"])
            instances = lift.lift_nuscenes_instances(labels)
            flat["nuscenes"] = lift.flatten_instances(instances, pad_multiple=pad_multiple)
            traj["nuscenes"] = build_chassis_trajectory(reader, "nuscenes", configs)

    scene = Scene(
        clip_path=str(clip_path),
        camera_list=list(camera_list),
        camera_main=camera_main,
        output_size=tuple(output_size),
        K_orig=K_orig,
        K_scaled=K_scaled,
        d=d,
        image_size=(img_h, img_w),
        cam2chassis=cam2chassis,
        chassis2cam=chassis2cam,
        frame_times=reader.sensor_timestamps(camera_main, sync=True),
        sync_ms={s: list(v) for s, v in reader.attribute["sync"].items()},
        flat=flat,
        traj=traj,
        reader=reader,
    )
    if cache:
        try:
            save_scene_cache(scene, cache, cache_key=key)
        except OSError:
            pass  # read-only clip mount: run uncached rather than fail
    return scene
