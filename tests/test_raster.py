"""Rasterizer parity: packed scatter-max overlay vs cv2.circle paint order."""
import numpy as np
import pytest

from cama_tpu.ops.raster import (
    CIRCLE_R2_OFFSETS,
    build_color_table,
    composite_overlay_host,
    rasterize_exact_host,
    rasterize_packed,
)

cv2 = pytest.importorskip("cv2")

RNG = np.random.default_rng(3)


def test_circle_stencil_matches_cv2():
    img = np.zeros((9, 9), np.uint8)
    cv2.circle(img, (4, 4), 2, 255, -1)
    ours = np.zeros((9, 9), np.uint8)
    for dy, dx in CIRCLE_R2_OFFSETS:
        ours[4 + dy, 4 + dx] = 255
    np.testing.assert_array_equal(ours, img)


def _run_case(h, w, n, class_names, clustered=False):
    if clustered:
        centers = RNG.uniform([2, 2], [h - 2, w - 2], size=(4, 2))
        vu = (centers[RNG.integers(0, 4, n)] + RNG.normal(0, 2.0, (n, 2))).astype(np.float32)
    else:
        vu = RNG.uniform([0, 0], [h, w], size=(n, 2)).astype(np.float32)
    vu = np.clip(vu, 0, [h - 1e-3, w - 1e-3])
    cls = RNG.integers(0, len(class_names), n).astype(np.int32)
    keep = RNG.random(n) > 0.1

    packed = np.asarray(rasterize_packed(vu[None], keep[None], cls, w, h))[0]
    table = build_color_table(class_names)
    base = RNG.integers(0, 255, (h, w, 3)).astype(np.uint8)
    ours = composite_overlay_host(base, packed, table)

    # reference paint order: point order, per-point circle
    ref = np.array(base, copy=True)
    for i in range(n):
        if not keep[i]:
            continue
        name = class_names[cls[i]]
        eff = name if name == "lane_marking" else "Crosswalk_Line"
        from cama_tpu.ops.lift import COLOR_MAPS

        color = tuple(COLOR_MAPS[eff][::-1].tolist())
        v, u = vu[i].astype(np.int32)
        cv2.circle(ref, (int(u), int(v)), 2, color, -1)
    np.testing.assert_array_equal(ours, ref)


def test_raster_random_points_matches_cv2_order():
    _run_case(64, 96, 500, ["lane_marking", "Road_teeth", "Crosswalk_Line"])


def test_raster_heavy_overlap_matches_cv2_order():
    _run_case(48, 48, 2000, ["lane_marking", "Road_teeth", "Crosswalk_Line"], clustered=True)


def test_raster_border_clipping():
    h, w = 16, 16
    vu = np.array([[0, 0], [15, 15], [0, 15], [15, 0], [1, 1]], dtype=np.float32)
    cls = np.zeros(len(vu), dtype=np.int32)
    keep = np.ones(len(vu), dtype=bool)
    packed = np.asarray(rasterize_packed(vu[None], keep[None], cls, w, h))[0]
    base = np.zeros((h, w, 3), np.uint8)
    table = build_color_table(["lane_marking"])
    ours = composite_overlay_host(base, packed, table)
    ref = rasterize_exact_host(base, [("lane_marking", vu)], ["lane_marking"])
    np.testing.assert_array_equal(ours, ref)


def test_raster_batch_shapes():
    vu = RNG.uniform(0, 30, size=(2, 6, 50, 2)).astype(np.float32)
    keep = np.ones((2, 6, 50), bool)
    cls = np.zeros(50, np.int32)
    packed = np.asarray(rasterize_packed(vu, keep, cls, 32, 32))
    assert packed.shape == (2, 6, 32, 32)


def test_composite_mosaic_device_matches_host():
    """The opt-in device compositor (paint + 3x2 mosaic in one program) is
    byte-identical to the host compositing + grid path."""
    import jax.numpy as jnp

    from cama_tpu.io.video import CAMERA_GRID, concat_camera_grid
    from cama_tpu.ops.raster import build_color_table, composite_mosaic_device

    rng = np.random.default_rng(5)
    cams = [c for row in CAMERA_GRID for c in row]
    h, w = 24, 40
    base = rng.integers(0, 255, (6, h, w, 3), dtype=np.uint8)
    cls_raster = (rng.random((6, h, w)) < 0.2).astype(np.uint8) * rng.integers(
        1, 4, (6, h, w)).astype(np.uint8)
    table = build_color_table(["lane_marking", "Road_teeth", "Crosswalk_Line"])

    # host reference: per-camera paint (cls-1 color where painted) + grid
    painted = {}
    for i, cam in enumerate(cams):
        img = base[i].copy()
        nz = cls_raster[i] > 0
        img[nz] = table[(cls_raster[i][nz].astype(np.int32) - 1) % len(table)]
        painted[cam] = img
    want = concat_camera_grid(painted)

    grid = np.arange(6, dtype=np.int32)  # cams listed in grid order here
    got = np.asarray(composite_mosaic_device(
        jnp.asarray(base), jnp.asarray(cls_raster), jnp.asarray(table),
        jnp.asarray(grid)))
    np.testing.assert_array_equal(got, want)


def test_pipeline_mosaic_device_matches_host_path(tmp_path):
    """ClipPipeline.mosaic_device == composite_frame + concat_camera_grid
    on a real fixture frame (cache-served base images, real rasters)."""
    from cama_tpu.io.fixture import make_fixture_clip
    from cama_tpu.io.video import concat_camera_grid
    from cama_tpu.pipeline import ClipPipeline

    clip = make_fixture_clip(tmp_path, scene_name="dm", n_frames=3,
                             with_images=True, with_lidar=False)
    pipe = ClipPipeline(clip_path=str(clip), chunk=2)
    raster = pipe._overlay_single("cama", 1)
    host = concat_camera_grid(pipe.composite_frame("cama", 1, raster))
    dev = pipe.mosaic_device("cama", 1, cls_raster=raster)
    np.testing.assert_array_equal(dev, host)


def test_pipeline_mosaics_device_shared_upload(tmp_path):
    """Multi-source device mosaics (one base upload) equal the per-source
    host paths for BOTH label sources."""
    from cama_tpu.io.fixture import make_fixture_clip
    from cama_tpu.io.video import concat_camera_grid
    from cama_tpu.pipeline import ClipPipeline

    clip = make_fixture_clip(tmp_path, scene_name="dmm", n_frames=3,
                             with_images=True, with_lidar=False)
    pipe = ClipPipeline(clip_path=str(clip), chunk=2)
    got = pipe.mosaics_device(["cama", "nuscenes"], 1)
    for source in ("cama", "nuscenes"):
        raster = pipe._overlay_single(source, 1)
        want = concat_camera_grid(pipe.composite_frame(source, 1, raster))
        np.testing.assert_array_equal(got[source], want, err_msg=source)


def test_mosaic_device_unknown_source_raises(tmp_path):
    from cama_tpu.io.fixture import make_fixture_clip
    from cama_tpu.pipeline import ClipPipeline

    clip = make_fixture_clip(tmp_path, scene_name="dmu", n_frames=2,
                             with_images=True, with_lidar=False)
    pipe = ClipPipeline(clip_path=str(clip), chunk=2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no labels for source"):
        pipe.mosaic_device("no-such-source", 1)
