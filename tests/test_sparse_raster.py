"""Sparse (scatter-free) overlay path: exact parity with the dense raster
path and with cv2 paint order, including overflow fallback."""
import numpy as np
import pytest

import jax.numpy as jnp

from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.ops.raster import (
    build_color_table,
    compact_points,
    composite_overlay_host,
    effective_counts,
    paint_sparse_host,
    rasterize_packed,
)


def test_effective_counts_equal_compact_counts():
    """The sort-free counting path (used by the cold-start-critical counting
    kernel) must agree exactly with compact_points' counts."""
    rng = np.random.default_rng(11)
    P, W, H = 257, 40, 30
    vu = jnp.asarray(rng.integers(0, 30, (4, P, 2)).astype(np.float32))
    keep = jnp.asarray(rng.random((4, P)) < 0.6)
    cls = jnp.asarray(rng.integers(0, 3, P).astype(np.int32))
    _, want = compact_points(vu, keep, cls, W, H, 8)
    got = effective_counts(vu, keep, cls, W, H)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
from cama_tpu.pipeline import ClipPipeline

RNG = np.random.default_rng(21)


def test_sparse_paint_matches_dense_raster():
    h, w, n = 48, 64, 800
    vu = np.stack([RNG.uniform(0, h - 1e-3, n), RNG.uniform(0, w - 1e-3, n)], -1).astype(np.float32)
    keep = RNG.random(n) > 0.15
    cls = RNG.integers(0, 3, n).astype(np.int32)
    names = ["lane_marking", "Road_teeth", "Crosswalk_Line"]
    table = build_color_table(names)
    base = RNG.integers(0, 255, (h, w, 3)).astype(np.uint8)

    packed = np.asarray(rasterize_packed(vu[None], keep[None], cls, w, h))[0]
    dense = composite_overlay_host(base, packed, table)

    vals, counts = compact_points(jnp.asarray(vu), jnp.asarray(keep), jnp.asarray(cls), w, h, n)
    sparse = np.array(base, copy=True)
    paint_sparse_host(sparse, np.asarray(vals), int(counts), table, w)
    np.testing.assert_array_equal(sparse, dense)


def test_compact_points_overflow_count():
    # 10 distinct pixels (no dedup): deduped count exceeds k
    vu = np.stack([np.arange(10), np.arange(10)], -1).astype(np.float32)
    keep = np.ones(10, bool)
    cls = np.zeros(10, np.int32)
    vals, counts = compact_points(jnp.asarray(vu), jnp.asarray(keep), jnp.asarray(cls), 16, 16, 4)
    assert int(counts) == 10  # > k: caller must fall back
    assert np.asarray(vals).shape == (4,)


def test_compact_points_dedups_consecutive_same_pixel():
    vu = np.zeros((10, 2), np.float32)  # all on one pixel
    keep = np.ones(10, bool)
    cls = np.zeros(10, np.int32)
    vals, counts = compact_points(jnp.asarray(vu), jnp.asarray(keep), jnp.asarray(cls), 8, 8, 4)
    assert int(counts) == 1
    v = np.asarray(vals)
    assert (v >= 0).sum() == 1


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    return make_fixture_clip(
        tmp_path_factory.mktemp("sparse"), n_frames=5, with_images=True, with_lidar=False
    )


def test_pipeline_sparse_equals_raster(clip):
    pipe = ClipPipeline(clip_path=clip, chunk=4)
    dense = dict(pipe.iter_frames("cama", mode="raster"))
    sparse = dict(pipe.iter_frames("cama", mode="sparse"))
    auto = dict(pipe.iter_frames("cama", mode="auto"))
    assert set(dense) == set(auto)
    for idx in dense:
        for cam in dense[idx]:
            np.testing.assert_array_equal(auto[idx][cam], dense[idx][cam])
    assert set(dense) == set(sparse)
    for idx in dense:
        for cam in dense[idx]:
            np.testing.assert_array_equal(sparse[idx][cam], dense[idx][cam],
                                          err_msg=f"{idx}/{cam}")


def test_pipeline_sparse_overflow_fallback(clip):
    pipe = ClipPipeline(clip_path=clip, chunk=4)
    dense = dict(pipe.iter_frames("cama", mode="raster"))
    # force overflow on every frame with a tiny k
    orig = pipe.iter_sparse_points

    def tiny_k(source, k=None):
        return orig(source, k=64)

    pipe.iter_sparse_points = tiny_k
    out = list(pipe.iter_frames("cama", mode="sparse"))
    assert [i for i, _ in out] == sorted(dense)  # order preserved
    assert pipe.timers.count.get("sparse_overflow", 0) > 0
    for idx, frame in out:
        for cam in frame:
            np.testing.assert_array_equal(frame[cam], dense[idx][cam])


def test_compact_points_host_matches_device():
    """The NumPy mirror (the adaptive sparse lane's host fallback) must be
    BIT-identical to the device kernel on identical projected inputs — same
    encoding, dedup, paint order, padding, and overflow counts."""
    from cama_tpu.ops.raster import compact_points, compact_points_host

    rng = np.random.default_rng(7)
    C, P, w, h, k = 3, 257, 64, 48, 96
    vu = np.stack([rng.uniform(0, h, (C, P)), rng.uniform(0, w, (C, P))],
                  axis=-1).astype(np.float32)
    # runs of consecutive same-pixel points exercise the dedup mask
    vu[:, 40:80] = vu[:, 40:41]
    keep = rng.random((C, P)) < 0.7
    cls = rng.integers(0, 4, P).astype(np.int32)
    want_vals, want_counts = compact_points(
        jnp.asarray(vu), jnp.asarray(keep), jnp.asarray(cls), w, h, k)
    got_vals, got_counts = compact_points_host(vu, keep, cls, w, h, k)
    np.testing.assert_array_equal(got_vals, np.asarray(want_vals))
    np.testing.assert_array_equal(got_counts, np.asarray(want_counts))
    # overflow: a tiny budget must preserve the first-k paint order and
    # report the uncapped effective count, exactly like the device kernel
    want_vals, want_counts = compact_points(
        jnp.asarray(vu), jnp.asarray(keep), jnp.asarray(cls), w, h, 8)
    got_vals, got_counts = compact_points_host(vu, keep, cls, w, h, 8)
    np.testing.assert_array_equal(got_vals, np.asarray(want_vals))
    np.testing.assert_array_equal(got_counts, np.asarray(want_counts))
