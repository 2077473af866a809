"""Native host compositor (cama_tpu/native): byte-equivalence against the
NumPy paths it replaces, and the fused-mosaic pipeline integration.

The C++ tier is an optimization only — every test here asserts exact byte
equality with the pure-NumPy implementations, which remain the fallback
(CAMA_TPU_NO_NATIVE=1)."""
import numpy as np
import pytest

from cama_tpu import native
from cama_tpu.ops.raster import (
    MAX_CLS,
    build_color_table,
    paint_sparse_host,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native compositor unavailable (no g++)"
)


def _numpy_composite(base, raster, table):
    out = base.copy()
    nz = np.flatnonzero(raster)
    if len(nz):
        out.reshape(-1, 3)[nz] = table[(raster.reshape(-1)[nz] - 1) % MAX_CLS]
    return out


def _random_case(rng, h, w, density=0.05, n_cls=3):
    base = rng.integers(0, 256, (h, w, 3), np.uint8)
    raster = np.where(
        rng.random((h, w)) < density, rng.integers(1, n_cls + 1, (h, w)), 0
    ).astype(np.uint8)
    table = rng.integers(0, 256, (n_cls, 3), np.uint8)
    return base, raster, table


@pytest.mark.parametrize("h,w", [(36, 48), (17, 53), (1, 1), (5, 7)])
def test_composite_matches_numpy(h, w):
    rng = np.random.default_rng(h * 100 + w)
    base, raster, table = _random_case(rng, h, w)
    out = native.composite(base, raster, table, np.empty_like(base))
    np.testing.assert_array_equal(out, _numpy_composite(base, raster, table))


def test_composite_empty_and_full_rasters():
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (20, 32, 3), np.uint8)
    table = rng.integers(0, 256, (3, 3), np.uint8)
    empty = np.zeros((20, 32), np.uint8)
    out = native.composite(base, empty, table, np.empty_like(base))
    np.testing.assert_array_equal(out, base)
    full = np.full((20, 32), 2, np.uint8)
    out = native.composite(base, full, table, np.empty_like(base))
    np.testing.assert_array_equal(out, np.broadcast_to(table[1], out.shape))


def test_composite_into_mosaic_slot_view():
    rng = np.random.default_rng(2)
    h, w = 24, 40
    base, raster, table = _random_case(rng, h, w)
    mosaic = rng.integers(0, 256, (h * 2, w * 3, 3), np.uint8)
    before = mosaic.copy()
    slot = mosaic[h:2 * h, w:2 * w]
    native.composite(base, raster, table, slot)
    np.testing.assert_array_equal(slot, _numpy_composite(base, raster, table))
    # pixels outside the slot untouched
    mosaic[h:2 * h, w:2 * w] = before[h:2 * h, w:2 * w]
    np.testing.assert_array_equal(mosaic, before)


def test_composite_in_place_without_base():
    rng = np.random.default_rng(3)
    base, raster, table = _random_case(rng, 19, 31)
    out = base.copy()
    native.composite(None, raster, table, out)
    np.testing.assert_array_equal(out, _numpy_composite(base, raster, table))


@pytest.mark.parametrize("w", [48, 53, 54, 55, 3])
def test_composite_packed2_matches_unpacked(w):
    import jax.numpy as jnp

    from cama_tpu.ops.raster import pack_cls_2bit

    rng = np.random.default_rng(w)
    base, raster, table = _random_case(rng, 21, w)
    packed = np.asarray(pack_cls_2bit(jnp.asarray(raster)))
    out = native.composite_packed2(base, packed, table, np.empty_like(base), w)
    np.testing.assert_array_equal(out, _numpy_composite(base, raster, table))


def test_paint_sparse_matches_host_painter():
    rng = np.random.default_rng(4)
    h, w = 40, 64
    base = rng.integers(0, 256, (h, w, 3), np.uint8)
    table = rng.integers(0, 256, (3, 3), np.uint8)
    # points spilling all four borders, plus -1 padding entries
    py = rng.integers(-2, h + 2, 200)
    px = rng.integers(-2, w + 2, 200)
    cls = rng.integers(0, 3, 200)
    vals = ((py * w + px) * MAX_CLS + cls).astype(np.int32)
    vals[::9] = -1
    ref = base.copy()
    paint_sparse_host(ref, vals, len(vals), table, w)
    out = base.copy()
    native.paint_sparse(vals, len(vals), table, w, out)
    np.testing.assert_array_equal(out, ref)


def test_paint_sparse_last_drawn_wins():
    base = np.zeros((9, 9, 3), np.uint8)
    table = np.array([[10, 10, 10], [200, 200, 200]], np.uint8)
    # two points on the same pixel, different classes: the later entry must
    # overwrite (cv2.circle order semantics)
    v = np.array([(4 * 9 + 4) * MAX_CLS + 0, (4 * 9 + 4) * MAX_CLS + 1],
                 np.int32)
    out = base.copy()
    native.paint_sparse(v, 2, table, 9, out)
    assert tuple(out[4, 4]) == (200, 200, 200)
    ref = base.copy()
    paint_sparse_host(ref, v, 2, table, 9)
    np.testing.assert_array_equal(out, ref)


def test_paint_sparse_zero_count_is_noop():
    base = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    out = base.copy()
    native.paint_sparse(np.empty(0, np.int32), 0, np.zeros((1, 3), np.uint8),
                        3, out)
    np.testing.assert_array_equal(out, base)


@pytest.fixture(scope="module")
def fixture_pipe(tmp_path_factory):
    from cama_tpu.io.fixture import make_fixture_clip
    from cama_tpu.pipeline import ClipPipeline

    root = tmp_path_factory.mktemp("native_clip")
    clip = make_fixture_clip(str(root), n_frames=4)
    return ClipPipeline(clip_path=clip, chunk=2)


def test_mosaic_fused_equals_dict_path(fixture_pipe):
    """composite_mosaic_frame == composite_frame + concat_camera_grid, byte
    for byte, for both the raster and sparse payload kinds."""
    from cama_tpu.io.video import concat_camera_grid

    pipe = fixture_pipe
    h, w = pipe.scene.output_size
    image_idx, raster = next(iter(pipe.iter_overlay_rasters("cama")))
    base = pipe.base_images(image_idx)

    ref = concat_camera_grid(pipe.composite_frame("cama", image_idx, raster,
                                                  base=base))
    mosaic = np.empty((h * 2, w * 3, 3), np.uint8)
    assert pipe.composite_mosaic_frame("cama", image_idx, raster, "raster",
                                       base, mosaic)
    np.testing.assert_array_equal(mosaic, ref)

    # sparse kind
    image_idx2, vals, counts = next(iter(pipe.iter_sparse_points("cama")))
    assert counts.max() <= vals.shape[-1]
    ref2 = concat_camera_grid(
        pipe.composite_frame_sparse("cama", image_idx2, vals, counts,
                                    base=pipe.base_images(image_idx2)))
    mosaic2 = np.empty((h * 2, w * 3, 3), np.uint8)
    assert pipe.composite_mosaic_frame("cama", image_idx2, (vals, counts),
                                       "sparse", pipe.base_images(image_idx2),
                                       mosaic2)
    np.testing.assert_array_equal(mosaic2, ref2)


def test_mosaic_fused_packed2_payload(fixture_pipe):
    """The 2-bit packed passthrough (iter_overlay_rasters(unpack=False))
    composites identically to the unpacked stream."""
    pipe = fixture_pipe
    if not pipe._use_2bit("cama"):
        pytest.skip("fixture scene does not use the 2-bit link format")
    h, w = pipe.scene.output_size
    unpacked = dict(pipe.iter_overlay_rasters("cama"))
    packed = dict(pipe.iter_overlay_rasters("cama", unpack=False))
    assert unpacked.keys() == packed.keys()
    idx = next(iter(unpacked))
    base = pipe.base_images(idx)
    m1 = np.empty((h * 2, w * 3, 3), np.uint8)
    m2 = np.empty((h * 2, w * 3, 3), np.uint8)
    pipe.composite_mosaic_frame("cama", idx, unpacked[idx], "raster", base, m1)
    pipe.composite_mosaic_frame("cama", idx, packed[idx], "raster", base, m2)
    np.testing.assert_array_equal(m1, m2)


def test_composite_frame_native_matches_fallback(fixture_pipe, monkeypatch):
    """ClipPipeline.composite_frame with the native tier == the NumPy path."""
    import cama_tpu.native as nat

    pipe = fixture_pipe
    image_idx, raster = next(iter(pipe.iter_overlay_rasters("cama")))
    base = pipe.base_images(image_idx)
    with_native = pipe.composite_frame("cama", image_idx, raster, base=base)
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_tried", True)
    assert not nat.available()
    without = pipe.composite_frame("cama", image_idx, raster, base=base)
    for cam in with_native:
        np.testing.assert_array_equal(with_native[cam], without[cam])


def test_color_table_roundtrip_through_native():
    """build_color_table rows (the production tables) paint identically."""
    table = build_color_table(["lane_marking", "Road_teeth", "Crosswalk_Line"])
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (10, 16, 3), np.uint8)
    raster = rng.integers(0, 4, (10, 16)).astype(np.uint8)
    out = native.composite(base, raster, table, np.empty_like(base))
    np.testing.assert_array_equal(out, _numpy_composite(base, raster, table))
