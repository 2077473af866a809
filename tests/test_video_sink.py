"""VideoSink: backend fallbacks and the async feeder thread (frame order,
byte-identical output, error surfacing)."""
import os
import shutil

import numpy as np
import pytest

from cama_tpu.io.video import VideoSink, concat_camera_grid


def _frames(n=5, h=12, w=16, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(n)]


def _force_raw(monkeypatch):
    """No ffmpeg, cv2.VideoWriter that refuses to open -> raw .npy backend."""
    import cv2

    monkeypatch.setattr(shutil, "which", lambda *_: None)

    class Dud:
        def __init__(self, *a, **k):
            pass

        def isOpened(self):
            return False

    monkeypatch.setattr(cv2, "VideoWriter", Dud)


@pytest.mark.parametrize("async_write", [False, True])
def test_raw_backend_roundtrip(tmp_path, monkeypatch, async_write):
    _force_raw(monkeypatch)
    frames = _frames()
    out = tmp_path / "v.mp4"
    with VideoSink(str(out), output_shape=(16, 12),
                   async_write=async_write) as sink:
        assert sink.backend == "raw"
        for f in frames:
            sink.add_frame(f)
    files = sorted(os.listdir(str(out) + ".frames"))
    assert files == [f"{i:06d}.npy" for i in range(len(frames))]
    for i, f in enumerate(frames):
        got = np.load(os.path.join(str(out) + ".frames", files[i]))
        np.testing.assert_array_equal(got, f)


def test_async_matches_sync_bytes(tmp_path, monkeypatch):
    """Async feeder output == sync output, frame for frame (raw backend —
    content-addressable)."""
    _force_raw(monkeypatch)
    outs = {}
    for mode in (False, True):
        frames = _frames(n=8)
        out = tmp_path / f"v{int(mode)}.mp4"
        with VideoSink(str(out), output_shape=(16, 12),
                       async_write=mode) as sink:
            for f in frames:
                sink.add_frame(f)
                f[:] = 0  # callers reuse mosaic buffers: copy must be eager
        outs[mode] = str(out) + ".frames"
    a, b = (sorted(os.listdir(d)) for d in outs.values())
    assert a == b
    for name in a:
        np.testing.assert_array_equal(
            np.load(os.path.join(outs[False], name)),
            np.load(os.path.join(outs[True], name)))


def test_async_encoder_frame_count(tmp_path):
    """Whatever encoder backend this host has (ffmpeg pipe or cv2), the
    async feeder must deliver every frame in order before close returns."""
    import cv2

    frames = _frames(n=6, h=24, w=32)
    out = tmp_path / "v.mp4"
    with VideoSink(str(out), output_shape=(32, 24), async_write=True) as sink:
        if sink.backend == "raw":
            pytest.skip("no video encoder on this host")
        for f in frames:
            sink.add_frame(f)
    cap = cv2.VideoCapture(str(out))
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == len(frames)


def _fake_ffmpeg(tmp_path, monkeypatch):
    """Put a fake `ffmpeg` on PATH: records argv, consumes the raw-BGR
    stdin stream verbatim into <output>.rawpipe, creates <output>.  The
    bench host has no real ffmpeg, so without this the subprocess pipe
    backend (arg construction, zero-copy framing, close/wait) NEVER
    executes (/root/reference/cama/tools.py:13-20 is the settings anchor)."""
    fake_dir = tmp_path / "fakebin"
    fake_dir.mkdir()
    script = fake_dir / "ffmpeg"
    script.write_text(
        "#!/usr/bin/env python3\n"
        "import json, sys\n"
        "out = sys.argv[-1]\n"
        "data = sys.stdin.buffer.read()\n"
        "open(out, 'wb').write(b'fake-encode')\n"
        "open(out + '.rawpipe', 'wb').write(data)\n"
        "json.dump(sys.argv[1:], open(out + '.argv.json', 'w'))\n")
    script.chmod(0o755)
    monkeypatch.setenv("PATH",
                       f"{fake_dir}{os.pathsep}{os.environ.get('PATH', '')}")


@pytest.mark.parametrize("async_write", [False, True])
def test_ffmpeg_pipe_backend(tmp_path, monkeypatch, async_write):
    """Drive the real ffmpeg subprocess path end-to-end against a recording
    fake: reference-identical encoder settings on argv, the raw-BGR pipe
    carries every frame's exact bytes in order, close() waits for the
    encoder before returning."""
    import json

    _fake_ffmpeg(tmp_path, monkeypatch)
    frames = _frames(n=7, h=12, w=16, seed=5)
    out = tmp_path / "v.mp4"
    with VideoSink(str(out), output_shape=(16, 12), fps=10,
                   async_write=async_write) as sink:
        assert sink.backend == "ffmpeg"
        for f in frames:
            sink.add_frame(f)
            f[:] = 0  # async feeder must have copied eagerly
    # close() waited on the subprocess, so the artifacts exist already
    argv = json.load(open(f"{out}.argv.json"))
    # the reference's encoder contract (cama/tools.py:13-20): raw BGR in,
    # declared input framerate (ffmpeg would otherwise assume 25 fps and
    # resample frames away), yuv420p libx264 out
    for flag, value in (("-f", "rawvideo"), ("-pix_fmt", "bgr24"),
                        ("-s", "16x12"), ("-framerate", "10"),
                        ("-r", "10"), ("-vcodec", "libx264")):
        assert value in argv[argv.index(flag) + 1:], (flag, argv)
    assert argv[-1] == str(out)
    raw = np.fromfile(f"{out}.rawpipe", np.uint8)
    rng = np.random.default_rng(5)  # regenerate: frames were zeroed above
    expect = np.concatenate([
        rng.integers(0, 256, (12, 16, 3), np.uint8).ravel()
        for _ in range(len(frames))])
    np.testing.assert_array_equal(raw, expect)


def test_ffmpeg_preset_passthrough(tmp_path, monkeypatch):
    import json

    _fake_ffmpeg(tmp_path, monkeypatch)
    out = tmp_path / "p.mp4"
    with VideoSink(str(out), output_shape=(16, 12),
                   preset="ultrafast", async_write=False) as sink:
        sink.add_frame(_frames(1)[0])
    argv = json.load(open(f"{out}.argv.json"))
    assert argv[argv.index("-preset") + 1] == "ultrafast"


def test_async_feeder_error_surfaces(tmp_path, monkeypatch):
    _force_raw(monkeypatch)
    out = tmp_path / "v.mp4"
    sink = VideoSink(str(out), output_shape=(16, 12), async_write=True)
    shutil.rmtree(str(out) + ".frames")  # make the writer fail
    f = _frames(1)[0]
    with pytest.raises(FileNotFoundError):
        # queue depth 2: keep feeding until the feeder's failure surfaces
        # (add_frame) or flush it out (close)
        for _ in range(50):
            sink.add_frame(f)
        sink.close()
    # the failure latches and surfaces exactly once: a later close is clean
    sink.close()


def test_add_frame_from_dict_async(tmp_path, monkeypatch):
    _force_raw(monkeypatch)
    from cama_tpu.io.video import CAMERA_GRID

    h, w = 6, 8
    rng = np.random.default_rng(3)
    d = {cam: rng.integers(0, 256, (h, w, 3), np.uint8)
         for row in CAMERA_GRID for cam in row}
    expected = concat_camera_grid(d)
    out = tmp_path / "v.mp4"
    with VideoSink(str(out), output_shape=(w * 3, h * 2),
                   async_write=True) as sink:
        sink.add_frame_from_dict(d)
        # mutate the sink's reused mosaic buffer via a second frame
        d2 = {k: np.zeros_like(v) for k, v in d.items()}
        sink.add_frame_from_dict(d2)
    files = sorted(os.listdir(str(out) + ".frames"))
    got = np.load(os.path.join(str(out) + ".frames", files[0]))
    np.testing.assert_array_equal(got, expected)
