"""End-to-end overlay parity on the fixture clip: pipeline frames vs the
reference's undistort+render path (cama/reproject.py:228-257), plus video
writing smoke test."""
import os

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available
from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.ops.geometry import project_frame_exact
from cama_tpu.ops.raster import rasterize_exact_host
from cama_tpu.pipeline import ClipPipeline

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

add_reference_to_path()
from cama.dataset_reader import DatasetReader  # noqa: E402
from cama.pose_transformer import PoseTransformer  # noqa: E402
from cama.reproject import CameraManager, MapManager  # noqa: E402

from test_lift_geometry import reference_frame_outputs  # noqa: E402


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    root = tmp_path_factory.mktemp("fixture_img")
    return make_fixture_clip(root, n_frames=6, with_images=True, with_lidar=False)


@pytest.fixture(scope="module")
def pipe(clip):
    return ClipPipeline(clip_path=clip, chunk=4)


def reference_rendered_frames(clip, source):
    """Reference main loop: yields {image_idx: {camera: rendered image}}."""
    cams = ["camera_front_left", "camera_front", "camera_front_right",
            "camera_rear_left", "camera_rear", "camera_rear_right"]
    cm_list = [CameraManager(clip, cam) for cam in cams]
    outs = reference_frame_outputs(clip, source)
    rendered = {}
    for image_idx, frame in outs.items():
        images = {}
        for cm in cm_list:
            image = cm.read_resized_image_by_index(image_idx)
            maps_2d = [{"class": c, "points": p} for c, p in frame[cm.camera_name]]
            images[cm.camera_name] = cm.render_maps(image, maps_2d)
        rendered[image_idx] = images
    return rendered


@pytest.mark.parametrize("source", ["cama", "nuscenes"])
def test_overlay_frames_match_reference(clip, pipe, source):
    ref = reference_rendered_frames(clip, source)
    got = dict(pipe.iter_frames(source))
    assert set(got.keys()) == set(ref.keys())
    worst = 1.0
    for idx in ref:
        for cam in ref[idx]:
            a, b = got[idx][cam], ref[idx][cam]
            assert a.shape == b.shape
            same = (a == b).all(axis=-1).mean()
            worst = min(worst, same)
            # device float32 path: tiny mask flips allowed at circle fringes
            assert same > 0.998, f"{idx}/{cam}: only {same:.4%} pixels equal"
    print(f"worst per-image pixel agreement: {worst:.5%}")


def test_exact_host_path_is_pixel_exact(clip, pipe):
    """Host-exact projection + cv2 rasterization must reproduce the reference
    overlays byte-for-byte (the north-star pixel-exactness harness)."""
    source = "cama"
    ref = reference_rendered_frames(clip, source)
    scene = pipe.scene
    fm = pipe.frame_matrices(source)
    fp = scene.flat[source]
    pts = fp.points[fp.valid]
    cls_ids = fp.cls[fp.valid]
    h, w = scene.output_size
    for k, image_idx in enumerate(fm.frame_indices):
        if not fm.frame_valid[k]:
            continue
        cam_outs = project_frame_exact(
            pts, np.linalg.inv(fm.chassis2world_f32[k]), scene.chassis2cam,
            scene.K_scaled, w, h,
        )
        for c, cam in enumerate(scene.camera_list):
            vu, keep = cam_outs[c]
            base = pipe.undistorted_image(cam, image_idx)
            # group into per-instance paint order
            order = np.flatnonzero(keep)
            inst = fp.inst[fp.valid][order]
            vu_list = []
            for i in np.unique(inst):
                m = order[inst == i]
                vu_list.append((fp.class_names[cls_ids[m[0]]], vu[m]))
            ours = rasterize_exact_host(base, vu_list, fp.class_names)
            np.testing.assert_array_equal(ours, ref[image_idx][cam], err_msg=f"{image_idx}/{cam}")


def test_write_video(clip, pipe, tmp_path):
    out = tmp_path / "out.mp4"
    n = pipe.write_video("cama", str(out))
    assert n > 0
    assert out.exists() or os.path.isdir(str(out) + ".frames")


def test_write_videos_one_pass_matches_two_pass(clip, pipe, monkeypatch):
    """write_videos (shared decode, merged streams) must emit pixel-identical
    frames, in the same order, as the per-source write_video path."""
    import cama_tpu.pipeline as pl_mod
    from cama_tpu.io.video import concat_camera_grid

    captured = {}

    class FakeSink:
        def __init__(self, path, output_shape=None, fps=10, preset=None):
            self.path = path
            captured[path] = []

        def add_frame(self, img):
            captured[self.path].append(np.array(img, copy=True))

        def add_frame_from_dict(self, image_dict):
            self.add_frame(concat_camera_grid(image_dict))

        def close(self):
            pass

    monkeypatch.setattr(pl_mod, "VideoSink", FakeSink)
    counts = pipe.write_videos({"cama": "v_cama", "nuscenes": "v_nusc"})

    for source, path in (("cama", "v_cama"), ("nuscenes", "v_nusc")):
        expected = [concat_camera_grid(f) for _, f in pipe.iter_frames(source)]
        assert counts[source] == len(expected) > 0
        got = captured[path]
        assert len(got) == len(expected)
        for g, e in zip(got, expected):
            np.testing.assert_array_equal(g, e)


def test_write_videos_through_ffmpeg_pipe(clip, pipe, tmp_path, monkeypatch):
    """The production dual-video pass through the REAL subprocess encoder
    backend (recording fake ffmpeg on PATH): every mosaic frame of both
    sinks must cross the raw-BGR pipe, correctly framed — on this
    ffmpeg-less host write_videos otherwise only ever exercises the cv2
    fallback (/root/reference/cama/tools.py:13-20 is the settings anchor)."""
    from test_video_sink import _fake_ffmpeg

    _fake_ffmpeg(tmp_path, monkeypatch)
    paths = {s: str(tmp_path / f"{s}.mp4") for s in ("cama", "nuscenes")}
    counts = pipe.write_videos(paths)
    h, w = pipe.scene.output_size
    for source, path in paths.items():
        assert counts[source] > 0
        raw = os.path.getsize(path + ".rawpipe")
        assert raw == counts[source] * (2 * h) * (3 * w) * 3, \
            f"{source}: pipe bytes {raw} != {counts[source]} mosaic frames"


def test_multi_scene_pipeline_matches_per_scene(tmp_path):
    """MultiScenePipeline's batched program must reproduce each member
    scene's per-scene rasters exactly (different frame counts + point pads)."""
    from cama_tpu.pipeline import MultiScenePipeline

    clips = [
        make_fixture_clip(tmp_path, scene_name="scene-msa", n_frames=4,
                          with_images=False, with_lidar=False),
        make_fixture_clip(tmp_path, scene_name="scene-msb", n_frames=6,
                          seed=9, with_images=False, with_lidar=False),
    ]
    pipes = [ClipPipeline(clip_path=c, chunk=4) for c in clips]
    msp = MultiScenePipeline(pipes, source="cama", chunk=4)

    got = {}
    # max_in_flight=1 forces the bounded-window drain path; the fixture's
    # <=2 class ids also engage the 2-bit packed link format
    for si, idx, raster in msp.iter_overlay_rasters(max_in_flight=1):
        got[(si, idx)] = raster
    assert len(got) > 0

    for si, pipe in enumerate(pipes):
        singles = dict(pipe.iter_overlay_rasters("cama"))
        assert {i for s, i in got if s == si} == set(singles)
        for idx, r in singles.items():
            np.testing.assert_array_equal(got[(si, idx)], r,
                                          err_msg=f"scene {si} frame {idx}")


def test_overlay_counts_sidecar_round_trip(clip):
    """The counting maxima persist per clip: a second pipeline must resolve
    overlay_mode WITHOUT any counting dispatch, and a changed input (crop)
    must miss the sidecar key."""
    import cama_tpu.pipeline as pl

    p1 = ClipPipeline(clip_path=clip, chunk=4)
    want = p1.overlay_mode("cama")
    want_two_stage = p1._two_stage.get("cama")
    sidecar = os.path.join(p1._cache_dir(), "overlay_counts.json")
    assert os.path.exists(sidecar)

    calls = {"n": 0}
    real = pl._count_chunk

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    import pytest

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(pl, "_count_chunk", spy)
        p2 = ClipPipeline(clip_path=clip, chunk=4)
        assert p2.overlay_mode("cama") == want
        assert p2._two_stage.get("cama") == want_two_stage
        assert calls["n"] == 0, "sidecar hit must skip the counting pass"
        # different counting inputs -> different key -> counting runs
        p3 = ClipPipeline(clip_path=clip, chunk=4)
        p3._crop_hi = p3._crop_hi + 1.0
        p3.overlay_mode("cama")
        assert calls["n"] > 0
    finally:
        mp.undo()
