"""Fused Pallas projection kernel vs the XLA einsum path (interpret mode on
CPU; the real-TPU timing comparison lives in tools/bench_pallas.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.io.scene import compile_scene
from cama_tpu.ops.geometry import compose_frame_matrices, crop_bounds, project_frames
from cama_tpu.ops.pallas_project import project_frame_pallas


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    clip = make_fixture_clip(tmp_path_factory.mktemp("pl"), n_frames=4,
                             with_images=False, with_lidar=False)
    return compile_scene(clip)


def test_pallas_matches_einsum_path(scene):
    fm = compose_frame_matrices(
        scene.traj["cama"], scene.frame_times, scene.chassis2cam, scene.K_scaled
    )
    fp = scene.flat["cama"]
    P = len(fp.points)
    pts4 = jnp.asarray(np.concatenate([fp.points, np.ones((P, 1), np.float32)], axis=1).T)
    valid = jnp.asarray(fp.valid)
    h, w = scene.output_size
    lo, hi = crop_bounds()

    for k in range(len(fm.frame_indices)):
        if not fm.frame_valid[k]:
            continue
        A = jnp.asarray(fm.A[k].astype(np.float32))
        B = jnp.asarray(fm.B[k].astype(np.float32))
        vu_ref, keep_ref = project_frames(
            jnp.asarray(fp.points), valid, A[None], B[None],
            jnp.ones(1, bool), w, h, jnp.asarray(lo), jnp.asarray(hi),
        )
        vu_pl, keep_pl = project_frame_pallas(pts4, valid, A, B, w, h, interpret=True)
        np.testing.assert_array_equal(np.asarray(keep_pl), np.asarray(keep_ref[0]))
        kept = np.asarray(keep_ref[0])
        # both are float32 paths with ~0.008 px noise vs float64 truth;
        # they round differently, so compare at the f32-noise scale
        np.testing.assert_allclose(
            np.asarray(vu_pl)[kept], np.asarray(vu_ref[0])[kept], atol=2e-2
        )


def test_pipeline_pallas_kernel_matches_compact(tmp_path):
    """ClipPipeline(raster_kernel='pallas') streams the same class rasters as
    the production compact path (interpret mode on CPU; the on-chip run lives
    in the `-m tpu` lane, tests/test_tpu_chip.py)."""
    from cama_tpu.pipeline import ClipPipeline

    clip = make_fixture_clip(tmp_path, scene_name="scene-pl", n_frames=3,
                             with_images=False, with_lidar=False)
    base = ClipPipeline(clip_path=clip, raster_kernel="compact", chunk=4)
    pall = ClipPipeline(clip_path=clip, scene=base.scene, raster_kernel="pallas",
                        chunk=4)
    got_c = dict(base.iter_overlay_rasters("cama"))
    got_p = dict(pall.iter_overlay_rasters("cama"))
    assert got_c.keys() == got_p.keys() and len(got_c) > 0
    for idx in got_c:
        # keep masks are identical, but vu differs by ~1e-4 px between the
        # MXU dot and the einsum, so a point sitting exactly on an integer
        # pixel boundary can cast differently — allow a handful of pixels
        diff = int((got_c[idx] != got_p[idx]).sum())
        assert diff <= 16, f"frame {idx}: {diff} differing pixels"
