"""Pre-undistorted frame cache (io.frame_cache): byte-exactness of served
pixels, persistence across pipelines, key invalidation, and the disable
knob.  The cache removes the dominant host cost of the user-facing video
loop (JPEG decode + remap, /root/reference/cama/reproject.py:228-244)."""
import os

import numpy as np
import pytest

from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.io.frame_cache import FrameCache
from cama_tpu.pipeline import ClipPipeline


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    root = tmp_path_factory.mktemp("fc_fixture")
    return make_fixture_clip(root, n_frames=5, with_images=True, with_lidar=False)


def test_cache_serves_byte_identical_pixels(clip):
    cold = ClipPipeline(clip_path=clip, configs={"frame_cache": False})
    warmer = ClipPipeline(clip_path=clip)
    cam = "camera_front"
    ref = cold.undistorted_image(cam, 1)
    first = warmer.undistorted_image(cam, 1)   # miss: decodes + populates
    assert np.array_equal(first, ref)
    fc = warmer.frame_cache()
    assert fc is not None
    fc.flush()  # writes are async (drop-on-full); drain before asserting
    c = warmer.scene.camera_list.index(cam)
    assert fc.get(1, c) is not None, "slot should be populated after a miss"
    second = warmer.undistorted_image(cam, 1)  # hit: mmap read
    assert np.array_equal(second, ref)
    # hits return a mutable copy by default; views only on request
    second[0, 0] = 255
    assert np.array_equal(warmer.undistorted_image(cam, 1), ref)
    view = warmer.undistorted_image(cam, 1, copy=False)
    assert not view.flags.writeable


def test_cache_persists_across_pipelines(clip):
    p1 = ClipPipeline(clip_path=clip)
    base = p1.base_images(2)
    p1.frame_cache().flush()
    p2 = ClipPipeline(clip_path=clip)
    fc2 = p2.frame_cache()
    for c, cam in enumerate(p2.scene.camera_list):
        hit = fc2.get(2, c)
        assert hit is not None, f"{cam} slot not persisted"
        assert np.array_equal(hit, base[cam])


def test_key_mismatch_invalidates(tmp_path):
    cache_dir = str(tmp_path)
    fc = FrameCache(cache_dir, 3, 2, (8, 10), key="k1")
    img = np.arange(8 * 10 * 3, dtype=np.uint8).reshape(8, 10, 3)
    fc.put(0, 0, img)
    fc.flush()
    same = FrameCache(cache_dir, 3, 2, (8, 10), key="k1")
    assert np.array_equal(same.get(0, 0), img)
    other = FrameCache(cache_dir, 3, 2, (8, 10), key="k2")
    assert other.get(0, 0) is None, "different key must not serve stale pixels"


def test_frame_cache_disabled_and_relocated(clip, tmp_path):
    off = ClipPipeline(clip_path=clip, configs={"frame_cache": False})
    assert off.frame_cache() is None
    moved = ClipPipeline(
        clip_path=clip, configs={"frame_cache_dir": str(tmp_path / "fc")})
    moved.undistorted_image("camera_front", 1)
    assert os.path.isdir(str(tmp_path / "fc"))


def test_write_videos_uses_cache(clip, tmp_path):
    pipe = ClipPipeline(clip_path=clip)
    out = {s: str(tmp_path / f"{s}.mp4") for s in pipe.scene.sources}
    counts = pipe.write_videos(out)
    assert all(v > 0 for v in counts.values())
    fc = pipe.frame_cache()
    assert fc is not None
    fc.flush()
    # frames write_videos touched are now resident (modulo dropped writes)
    assert fc.hit_rate() > 0 or fc.dropped_writes > 0


def test_fast_decode_approximates_full_decode(clip, tmp_path):
    """fast_decode (half-res JPEG decode + rescaled remap grids) must land
    close to the full-decode undistorted image — it is a documented
    non-byte-parity QA knob, so bound the error instead of requiring
    equality."""
    full = ClipPipeline(clip_path=clip, configs={"frame_cache": False})
    fast = ClipPipeline(clip_path=clip, configs={
        "frame_cache_dir": str(tmp_path / "fc"), "fast_decode": True})
    a = full.undistorted_image("camera_front", 1).astype(np.float32)
    b = fast.undistorted_image("camera_front", 1).astype(np.float32)
    assert a.shape == b.shape
    # same content at reduced detail: small mean error, high agreement
    assert np.abs(a - b).mean() < 8.0
    # and the fast store must never be served under the byte-exact key
    fast.frame_cache().flush()
    assert fast.frame_cache().key.startswith("fast2:")
    assert ClipPipeline(clip_path=clip, configs={
        "frame_cache_dir": str(tmp_path / "fc")}).frame_cache().get(1, 1) is None


def test_corrupt_store_self_heals(tmp_path):
    """A truncated data file (interrupted copy of the clip dir) must rebuild
    the store on open, not crash the scene on every run."""
    d = str(tmp_path / "fc")
    fc = FrameCache(d, 3, 2, (8, 10), key="k")
    img = np.arange(8 * 10 * 3, dtype=np.uint8).reshape(8, 10, 3)
    fc.put(0, 0, img)
    fc.flush()
    assert fc.get(0, 0) is not None
    # truncate the data file, keep the key file intact
    data_path = fc._data_path
    with open(data_path, "r+b") as f:
        f.truncate(64)
    fc2 = FrameCache(d, 3, 2, (8, 10), key="k")
    assert fc2.get(0, 0) is None  # rebuilt empty, not crashed
    fc2.put(0, 0, img)
    fc2.flush()
    np.testing.assert_array_equal(fc2.get(0, 0), img)


def test_tail_writes_flush_at_exit(tmp_path):
    """The atexit drain lands enqueued tail writes: a put followed by flush
    (what the atexit hook runs) must persist even without an explicit
    consumer-side flush call."""
    import subprocess
    import sys

    code = f"""
import numpy as np
from cama_tpu.io.frame_cache import FrameCache
fc = FrameCache({str(tmp_path / 'fc2')!r}, 2, 1, (4, 6), key="k")
fc.put(1, 0, np.full((4, 6, 3), 7, np.uint8))
# no flush(): the atexit hook must drain the writer backlog
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    fc = FrameCache(str(tmp_path / "fc2"), 2, 1, (4, 6), key="k")
    got = fc.get(1, 0)
    assert got is not None, "tail write was dropped at process exit"
    assert int(got[0, 0, 0]) == 7


def test_generalized_store_dtype_and_channels(tmp_path):
    """The GT-mask configuration of the store: named, uint16, no channel
    axis — coexists with a frames store in the same directory."""
    from cama_tpu.io.frame_cache import FrameCache

    d = str(tmp_path / "fc3")
    ids = FrameCache(d, 2, 1, (4, 6), key="g", name="gt_ids",
                     dtype=np.uint16, channels=0)
    frames = FrameCache(d, 2, 1, (4, 6), key="f")
    mask = np.arange(24, dtype=np.uint16).reshape(4, 6) * 300  # > uint8
    ids.put(0, 0, mask)
    ids.flush()
    got = ids.get(0, 0)
    assert got.dtype == np.uint16 and got.shape == (4, 6)
    np.testing.assert_array_equal(got, mask)
    assert frames.get(0, 0) is None  # distinct store, untouched

    # reopening with a different dtype invalidates rather than mis-serving
    ids8 = FrameCache(d, 2, 1, (4, 6), key="g", name="gt_ids",
                      dtype=np.uint8, channels=0)
    assert ids8.get(0, 0) is None


def test_gt_mask_cache_serves_and_invalidates(tmp_path):
    """instance_loader round-trips through the GT store byte-identically,
    and REGENERATED masks (same calibration, new PNG bytes) invalidate it —
    the copied-clip-then-remasked hazard."""
    import time

    from cama_tpu.eval.map_metrics import MapEvaluator
    from cama_tpu.io.fixture import add_instance_masks, make_fixture_clip
    from cama_tpu.pipeline import ClipPipeline

    clip = make_fixture_clip(tmp_path, scene_name="gtc", n_frames=3,
                             with_images=False, with_lidar=False)
    add_instance_masks(clip)
    pipe = ClipPipeline(clip_path=str(clip), chunk=2)
    ev = MapEvaluator()
    cam = pipe.scene.camera_list[0]
    cold = ev.instance_loader(pipe, cam, 1)
    pipe.gt_mask_cache().flush()
    pipe2 = ClipPipeline(clip_path=str(clip), chunk=2)
    warm = ev.instance_loader(pipe2, cam, 1)
    assert pipe2.gt_mask_cache().get(1, 0) is not None, "expected a cache hit"
    np.testing.assert_array_equal(np.asarray(warm), np.asarray(cold))

    # mtime-only refresh (the CLI re-extracts the label zip every run,
    # rewriting identical bytes): the content-keyed store must STAY warm
    for root, _dirs, files in os.walk(str(clip)):
        if "lane_ins" in os.path.basename(root):
            for f in files:
                os.utime(os.path.join(root, f))
    pipe_m = ClipPipeline(clip_path=str(clip), chunk=2)
    assert pipe_m.gt_mask_cache().get(1, 0) is not None, \
        "identical-bytes mtime refresh must not rebuild the GT store"

    time.sleep(0.01)  # ensure a distinct mtime_ns even on coarse clocks
    add_instance_masks(clip, shift_px=9.0)  # regenerate, same calibration
    pipe3 = ClipPipeline(clip_path=str(clip), chunk=2)
    fresh = ev.instance_loader(pipe3, cam, 1)
    assert not np.array_equal(np.asarray(fresh), np.asarray(cold)), \
        "stale GT served after masks were regenerated"


def test_writer_error_latches_readonly_without_deadlock(tmp_path):
    """A bad put (wrong shape/index) must latch the store read-only and
    leave flush() returning — an escaping exception used to kill the
    writer thread and deadlock flush()/the atexit drain in Queue.join()."""
    fc = FrameCache(str(tmp_path / "fc4"), 2, 1, (4, 6), key="k")
    fc.put(0, 0, np.zeros((99, 99, 3), np.uint8))  # shape mismatch
    fc.flush()  # must not hang
    assert fc.writable is False
    fc.put(1, 0, np.zeros((4, 6, 3), np.uint8))  # ignored once latched
    fc.flush()
    assert fc.get(1, 0) is None


def test_write_budget_throttles_and_converges(tmp_path):
    """Token-bucket writer budget: with an exhausted bucket every write
    drops (the producing pass is never starved); with the default burst the
    unit-scale write volume lands in full."""
    fc = FrameCache(tmp_path, 8, 2, (4, 6), "k-budget")
    img = np.full((4, 6, 3), 3, np.uint8)
    # exhaust the bucket: zero sustained budget, zero banked burst
    fc._budget = 0.0
    fc._tokens = 0.0
    for f in range(8):
        fc.put(f, 0, img)
    fc.flush()
    assert fc.dropped_writes == 8
    assert fc.hit_rate() == 0.0
    # restore the burst: the same puts now land (store converges over runs)
    fc._tokens = FrameCache.BURST_S
    for f in range(8):
        fc.put(f, 0, img)
    fc.flush()
    assert fc.hit_rate() == 0.5  # all 8 slots of camera 0
    np.testing.assert_array_equal(fc.get(3, 0), img)


def test_put_own_handover_skips_copy(tmp_path):
    """own=True hands the array to the writer without a defensive copy; the
    caller-side contract (pipeline marks it read-only) keeps it safe."""
    fc = FrameCache(tmp_path, 2, 1, (4, 6), "k-own", async_writes=False)
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    fc.put(0, 0, img, own=True)
    np.testing.assert_array_equal(fc.get(0, 0), img)


def test_pwrite_lane_coherent_with_mmap_reads(tmp_path):
    """Slot writes go through os.pwrite (16x cheaper than first-touch mmap
    stores on the bench host); readers keep the zero-copy mmap.  The two
    views must stay coherent in-process AND across instances (page-cache
    shared), and a non-contiguous put must land its logical bytes."""
    fc = FrameCache(tmp_path, 3, 2, (4, 6), "k-pw", async_writes=False)
    rng = np.random.default_rng(7)
    imgs = {}
    for f in range(3):
        for c in range(2):
            img = rng.integers(0, 256, (4, 6, 3), np.uint8)
            imgs[f, c] = img
            fc.put(f, c, img[:, ::1] if c == 0 else
                   np.asfortranarray(img))  # exercise the contiguity guard
    assert fc._data_fd is not None, "pwrite lane should have engaged"
    for (f, c), img in imgs.items():
        np.testing.assert_array_equal(fc.get(f, c), img)
    assert fc.hit_rate() == 1.0
    # a fresh instance (fresh mmap) over the same files sees the pwrites
    fc2 = FrameCache(tmp_path, 3, 2, (4, 6), "k-pw", async_writes=False)
    for (f, c), img in imgs.items():
        np.testing.assert_array_equal(fc2.get(f, c), img)


def test_gt_full_hash_catches_middle_rewrite(tmp_path):
    """Same-size middle-only rewrite of a >16 KiB GT PNG: invisible to the
    default head/tail signature (documented hole), caught by the
    gt_cache_full_hash opt-in — and refresh_gt_cache() drops the stale
    store so the next evaluation rebuilds."""
    import cv2

    from cama_tpu.io.fixture import add_instance_masks

    clip = make_fixture_clip(tmp_path, n_frames=3, with_images=False,
                             with_lidar=False)
    add_instance_masks(clip)
    cam = "camera_front"
    probe = ClipPipeline(clip_path=clip)
    ms = probe.scene.sync_ms[cam][1]
    path = os.path.join(clip, f"lane_ins_{cam}", f"{ms}.png")
    # incompressible noise makes the PNG large enough that neither the 8 KiB
    # head nor tail window covers its middle
    rng = np.random.default_rng(0)
    cv2.imwrite(path, (rng.random((540, 960)) < 0.5).astype(np.uint8))
    size = os.path.getsize(path)
    assert size > 16384

    default_pipe = ClipPipeline(clip_path=clip)
    full_pipe = ClipPipeline(clip_path=clip,
                             configs={"gt_cache_full_hash": True})
    k_def0 = default_pipe._gt_cache_key()
    k_full0 = full_pipe._gt_cache_key()
    cache0 = full_pipe.gt_mask_cache()
    assert cache0 is not None

    with open(path, "r+b") as f:  # same-size middle-only rewrite
        f.seek(size // 2)
        chunk = f.read(64)
        f.seek(size // 2)
        f.write(bytes(b ^ 0xFF for b in chunk))
    assert os.path.getsize(path) == size

    assert default_pipe._gt_cache_key() == k_def0  # the documented hole
    assert full_pipe._gt_cache_key() != k_full0  # opt-in sees the rewrite
    full_pipe.refresh_gt_cache()
    cache1 = full_pipe.gt_mask_cache()
    assert cache1 is not None and cache1.key != cache0.key
    # default pipe: refresh is a cheap no-op when the key is unchanged
    default_pipe.gt_mask_cache()
    default_pipe.refresh_gt_cache()
    assert default_pipe.gt_mask_cache() is not None
