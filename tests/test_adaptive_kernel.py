"""The adaptive ('auto') raster kernel: first chunks serve through the
NumPy host lane (no device compile anywhere on the serving path) while the
production compact/two-stage program (and the scene-batched program in
MultiScenePipeline) warms on a background thread.  Cold-phase frames must be
either host-lane rasters or production rasters (the switch chunk depends on
compile latency), the host lane must closely agree with the device lane, and
after the warm lands the stream must serve the production program
bit-identically to an explicit 'compact' pipeline."""
import os

import numpy as np
import pytest

from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.pipeline import (
    ClipPipeline,
    MultiScenePipeline,
    _warm_fn,
    wait_for_warm,
)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    root = tmp_path_factory.mktemp("fixture_auto")
    return make_fixture_clip(root, n_frames=6, with_images=True,
                             with_lidar=False)


@pytest.fixture(scope="module")
def clips2(tmp_path_factory):
    root = tmp_path_factory.mktemp("fixture_auto_ms")
    return [
        make_fixture_clip(root, scene_name=f"scene-au{i}", n_frames=5,
                          with_images=False, with_lidar=False, seed=i)
        for i in range(2)
    ]


def _collect(pipe, source):
    return {idx: raster.copy()
            for idx, raster in pipe.iter_overlay_rasters(source)}


def _agreement(a, b):
    return float((a == b).mean())


def test_host_lane_matches_device_lane(clip):
    """The pure-host stream (the adaptive lane's cold phase) must agree with
    the device compact lane at the validate standard on every frame."""
    compact = ClipPipeline(clip_path=clip, chunk=4, raster_kernel="compact")
    want = _collect(compact, "cama")
    host = dict(compact.iter_overlay_rasters_host("cama"))
    assert set(host) == set(want)
    for idx in want:
        assert _agreement(host[idx], want[idx]) > 0.999, idx


def test_auto_solo_serves_then_switches(clip):
    compact = ClipPipeline(clip_path=clip, chunk=4, raster_kernel="compact")
    want = _collect(compact, "cama")

    auto = ClipPipeline(clip_path=clip, chunk=4, raster_kernel="auto")
    host = dict(auto.iter_overlay_rasters_host("cama"))
    got_cold = _collect(auto, "cama")  # host lane and/or production
    assert set(got_cold) == set(want)
    for idx in want:
        # deterministic acceptance: every cold frame is exactly one of the
        # two lanes' outputs
        assert (np.array_equal(got_cold[idx], want[idx])
                or np.array_equal(got_cold[idx], host[idx])), idx

    wait_for_warm()
    key = auto._production_warm_key("cama", auto._use_2bit("cama"))
    assert _warm_fn(key) is not None, "background warm never landed"
    got_warm = _collect(auto, "cama")  # production kernel from chunk 0
    for idx in want:
        np.testing.assert_array_equal(got_warm[idx], want[idx])


def test_auto_serving_mode_defers_then_resolves(clip):
    auto = ClipPipeline(clip_path=clip, chunk=4, raster_kernel="auto")
    # a fresh pipeline instance shares the process-wide warm registry but
    # not the per-instance counting memo: cold serving is raster/None
    mode0, _ = auto.serving_mode("cama")
    assert mode0 == "raster"
    auto.overlay_mode("cama")  # counting pass (fast on CPU)
    mode1, k1 = auto.serving_mode("cama")
    assert k1 is not None
    # a non-auto pipeline must pass through overlay_mode untouched
    compact = ClipPipeline(clip_path=clip, chunk=4, raster_kernel="compact")
    assert compact.serving_mode("cama") == compact.overlay_mode("cama")


def test_auto_multi_scene_serves_then_switches(clips2):
    pipes_c = [ClipPipeline(clip_path=c, chunk=4, raster_kernel="compact")
               for c in clips2]
    msp_c = MultiScenePipeline(pipes_c, chunk=4)
    assert not msp_c.adaptive
    want = {(si, idx): r.copy()
            for si, idx, r in msp_c.iter_overlay_rasters(source="cama")}
    host = {}
    for si, p in enumerate(pipes_c):
        for idx, r in p.iter_overlay_rasters_host("cama"):
            host[(si, idx)] = r

    pipes_a = [ClipPipeline(clip_path=c, chunk=4, raster_kernel="auto")
               for c in clips2]
    msp_a = MultiScenePipeline(pipes_a, chunk=4)
    assert msp_a.adaptive
    got = {(si, idx): r.copy()
           for si, idx, r in msp_a.iter_overlay_rasters(source="cama")}
    assert set(got) == set(want)
    for key in want:
        assert (np.array_equal(got[key], want[key])
                or np.array_equal(got[key], host[key])), key

    wait_for_warm()
    st = msp_a._source_state("cama")
    assert _warm_fn(st["key"]) is not None, "batched warm never landed"
    got2 = {(si, idx): r.copy()
            for si, idx, r in msp_a.iter_overlay_rasters(source="cama")}
    for key in want:
        np.testing.assert_array_equal(got2[key], want[key])


def test_auto_write_videos_and_first_frame_callback(clip, tmp_path):
    auto = ClipPipeline(clip_path=clip, chunk=4, raster_kernel="auto",
                        configs={"frame_cache": False})
    calls = []
    counts = auto.write_videos(
        {"cama": str(tmp_path / "c.mp4"), "nuscenes": str(tmp_path / "n.mp4")},
        on_first_frame=lambda: calls.append(1))
    assert counts["cama"] > 0 and counts["nuscenes"] > 0
    assert calls == [1], "on_first_frame must fire exactly once"
    assert os.path.getsize(tmp_path / "c.mp4") > 0
