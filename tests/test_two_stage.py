"""Two-stage (crop-first) compaction: bit-identical rasters to the
single-stage path, engaged exactly when the crop culls enough points."""
import numpy as np
import pytest

import jax.numpy as jnp

from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.pipeline import ClipPipeline, _overlay_chunk_compact, _overlay_chunk_two_stage


@pytest.fixture(scope="module")
def long_clip(tmp_path_factory):
    """Labels spanning ~500 m while the crop box keeps ±50 m around the
    vehicle: most points cull per frame."""
    return make_fixture_clip(
        tmp_path_factory.mktemp("long"), n_frames=6, with_images=False,
        with_lidar=False, label_span=(-295.0, 200.0),
    )


def test_two_stage_engages_on_long_scene(long_clip):
    pipe = ClipPipeline(clip_path=long_clip, chunk=4)
    pipe.overlay_mode("cama")
    k1 = pipe._two_stage["cama"]
    assert k1 is not None
    P = pipe.scene.flat["cama"].points.shape[0]
    assert k1 * 2 <= P


def test_two_stage_rasters_bit_identical(long_clip):
    pipe = ClipPipeline(clip_path=long_clip, chunk=4)
    fm, A, B, fv, F = pipe._chunked_AB("cama")
    points, cls, valid = pipe.scene.device_points("cama")
    h, w = pipe.scene.output_size
    _, k = pipe.overlay_mode("cama")
    k1 = pipe._two_stage["cama"]
    args = (points, valid, cls, jnp.asarray(A[:4]), jnp.asarray(B[:4]),
            jnp.asarray(fv[:4]), pipe._crop_lo, pipe._crop_hi, w, h)
    single = np.asarray(_overlay_chunk_compact(*args, k, False))
    double = np.asarray(_overlay_chunk_two_stage(*args, k1, min(k, k1), False))
    np.testing.assert_array_equal(double, single)


def test_two_stage_pipeline_end_to_end(long_clip):
    """The pipeline transparently uses the two-stage kernel; output equals
    the scatter (reference-structured) kernel's."""
    a = dict(ClipPipeline(clip_path=long_clip, chunk=4).iter_overlay_rasters("cama"))
    b = dict(ClipPipeline(clip_path=long_clip, chunk=4,
                          raster_kernel="scatter").iter_overlay_rasters("cama"))
    assert set(a) == set(b) and len(a) > 0
    for i in a:
        np.testing.assert_array_equal(a[i], b[i])


def test_short_scene_stays_single_stage(tmp_path):
    clip = make_fixture_clip(tmp_path, n_frames=4, with_images=False, with_lidar=False)
    pipe = ClipPipeline(clip_path=clip, chunk=4)
    pipe.overlay_mode("cama")
    assert pipe._two_stage["cama"] is None
