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


def test_sparse_host_lane_serves_during_warm(clip, monkeypatch):
    """While ANY background warm is in flight, the adaptive sparse stream
    must serve chunks from the NumPy mirror with ZERO device interaction
    (a transfer would hard-block behind the compile), closely agreeing with
    the device sparse lane."""
    import cama_tpu.pipeline as pl

    compact = ClipPipeline(clip_path=clip, chunk=4, raster_kernel="compact")
    dev = {i: (np.asarray(v), np.asarray(c))
           for i, v, c in compact.iter_sparse_points("cama", k=4096)}

    auto = ClipPipeline(clip_path=clip, chunk=4, raster_kernel="auto")
    monkeypatch.setattr(pl, "warms_in_flight", lambda: True)

    def boom(source):
        raise AssertionError("device touched while a warm is in flight")

    monkeypatch.setattr(auto, "device_points", boom)
    host = {i: (v, c) for i, v, c in auto.iter_sparse_points("cama", k=4096)}
    assert set(host) == set(dev)
    for idx in dev:
        vd, cd = dev[idx]
        vh, ch = host[idx]
        sd = set(vd[vd >= 0].tolist())
        sh = set(vh[vh >= 0].tolist())
        jacc = len(sd & sh) / max(1, len(sd | sh))
        assert jacc > 0.99, (idx, jacc)  # f64 host vs f32 device edges
        assert abs(int(ch.sum()) - int(cd.sum())) <= max(2, 0.01 * cd.sum())
    assert auto.timers.count.get("host_lane", 0) > 0
    assert auto.timers.count.get("device_dispatch", 0) == 0


def test_overlay_single_auto_uses_host_lane(clip, monkeypatch):
    """'auto' serves the sparse-overflow single-frame fallback from the host
    lane: the [1]-frame device program would be a fresh cache-missing compile
    (minutes through a remote-compile tunnel) mid-stream."""
    compact = ClipPipeline(clip_path=clip, chunk=4, raster_kernel="compact")
    idx = next(iter(dict(compact.iter_overlay_rasters("cama"))))
    want = compact._overlay_single("cama", idx)

    auto = ClipPipeline(clip_path=clip, chunk=4, raster_kernel="auto")

    def boom(source):
        raise AssertionError("auto _overlay_single touched the device")

    monkeypatch.setattr(auto, "device_points", boom)
    got = auto._overlay_single("cama", idx)
    assert got.shape == want.shape and got.dtype == want.dtype
    assert _agreement(got, want) > 0.999


def test_wait_for_warm_total_deadline():
    """timeout bounds the TOTAL wait (shared deadline, not per warm) and the
    return value reports whether the warms actually finished."""
    import threading
    import time

    import cama_tpu.pipeline as pl

    evs = [threading.Event() for _ in range(3)]
    with pl._WARM_LOCK:
        for i, ev in enumerate(evs):
            pl._WARMING[("fake-warm", i)] = ev
    try:
        t0 = time.perf_counter()
        assert wait_for_warm(timeout=0.3) is False
        assert time.perf_counter() - t0 < 1.5  # 3 events, ONE shared budget
    finally:
        with pl._WARM_LOCK:
            for i, ev in enumerate(evs):
                ev.set()
                pl._WARMING.pop(("fake-warm", i), None)
    assert wait_for_warm(timeout=1.0) is True
