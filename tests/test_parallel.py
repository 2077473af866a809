"""Sharded overlay step on the 8-device virtual CPU mesh: frame-axis DP +
point-axis (sequence-parallel analogue) sharding with pmax raster combine."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.io.scene import compile_scene
from cama_tpu.ops.geometry import compose_frame_matrices, crop_bounds
from cama_tpu.parallel import make_mesh, pad_to_multiple, sharded_overlay_step
from cama_tpu.pipeline import ClipPipeline


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    return make_fixture_clip(
        tmp_path_factory.mktemp("fx"), n_frames=8, with_images=False, with_lidar=False
    )


def _prep(clip, mesh):
    scene = compile_scene(clip)
    fm = compose_frame_matrices(
        scene.traj["cama"], scene.frame_times, scene.chassis2cam, scene.K_scaled
    )
    fp = scene.flat["cama"]
    f_mult = mesh.shape["frames"]
    p_mult = mesh.shape["points"]
    A = pad_to_multiple(fm.A.astype(np.float32), f_mult)
    B = pad_to_multiple(fm.B.astype(np.float32), f_mult)
    fv = pad_to_multiple(fm.frame_valid, f_mult)
    pts = pad_to_multiple(fp.points, p_mult)
    valid = pad_to_multiple(fp.valid, p_mult)
    cls = pad_to_multiple(fp.cls, p_mult)
    return scene, fm, (pts, valid, cls, A, B, fv)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_step_matches_single_device(clip, shape):
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh(n_frames_axis=shape[0], n_points_axis=shape[1])
    scene, fm, args = _prep(clip, mesh)
    h, w = scene.output_size
    lo, hi = crop_bounds()
    step = sharded_overlay_step(mesh, w, h)
    rasters, counts = step(*[jnp.asarray(a) for a in args], jnp.asarray(lo), jnp.asarray(hi))
    rasters = np.asarray(rasters)

    # single-device truth via the pipeline path
    pipe = ClipPipeline(clip_path=clip, chunk=4)
    single = dict(pipe.iter_overlay_rasters("cama"))
    F = len(fm.frame_indices)
    got_valid = 0
    for k in range(F):
        if not fm.frame_valid[k]:
            continue
        idx = int(fm.frame_indices[k])
        np.testing.assert_array_equal(rasters[k], single[idx], err_msg=f"frame {idx}")
        got_valid += 1
    assert got_valid > 0
    total_painted = sum((r > 0).sum() for r in single.values())
    assert int(np.asarray(counts).sum()) == total_painted


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_sharded_compact_kernel_matches_single_device(clip, shape):
    """The sharded variant of the measured-fastest kernel (dedup+sort-compact)
    must be bit-identical to the single-device compact path on a 2-D mesh."""
    from cama_tpu.pipeline import _overlay_chunk_compact

    assert len(jax.devices()) >= 8
    mesh = make_mesh(n_frames_axis=shape[0], n_points_axis=shape[1])
    scene, fm, args = _prep(clip, mesh)
    pts, valid, cls, A, B, fv = args
    h, w = scene.output_size
    lo, hi = crop_bounds()
    k = 4096
    step = sharded_overlay_step(mesh, w, h, kernel="compact", k=k)
    rasters, _ = step(*[jnp.asarray(a) for a in args], jnp.asarray(lo), jnp.asarray(hi))
    rasters = np.asarray(rasters)

    single = np.asarray(_overlay_chunk_compact(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(cls),
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(fv),
        jnp.asarray(lo), jnp.asarray(hi), w, h, k, False,
    ))
    np.testing.assert_array_equal(rasters, single)


def test_sharded_end_to_end_video_frames(tmp_path):
    """Sharded rasters driven through the full host video path (composite +
    mosaic) must reproduce the single-device pipeline's video frames exactly."""
    from cama_tpu.io.video import concat_camera_grid

    clip = make_fixture_clip(tmp_path, scene_name="scene-shv", n_frames=4,
                             with_images=True, with_lidar=False)
    mesh = make_mesh(n_frames_axis=4, n_points_axis=2)
    scene, fm, args = _prep(clip, mesh)
    h, w = scene.output_size
    lo, hi = crop_bounds()
    step = sharded_overlay_step(mesh, w, h, kernel="compact", k=4096)
    rasters, _ = step(*[jnp.asarray(a) for a in args], jnp.asarray(lo), jnp.asarray(hi))
    rasters = np.asarray(rasters)

    pipe = ClipPipeline(clip_path=clip, scene=scene, chunk=4)
    expected = {}
    for idx, frame in pipe.iter_frames("cama"):
        expected[idx] = concat_camera_grid(frame)

    n_checked = 0
    for k in range(len(fm.frame_indices)):
        if not fm.frame_valid[k]:
            continue
        idx = int(fm.frame_indices[k])
        frame = pipe.composite_frame("cama", idx, rasters[k])
        got = concat_camera_grid(frame)
        np.testing.assert_array_equal(got, expected[idx], err_msg=f"frame {idx}")
        n_checked += 1
    assert n_checked > 0


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_sharded_two_stage_kernel_matches_single_device(clip, shape):
    """Sharded crop-first two-stage kernel == single-device two-stage rasters
    (per-shard stage-1 budgets generous enough not to overflow)."""
    from cama_tpu.pipeline import _overlay_chunk_two_stage

    mesh = make_mesh(n_frames_axis=shape[0], n_points_axis=shape[1])
    scene, fm, args = _prep(clip, mesh)
    pts, valid, cls, A, B, fv = args
    h, w = scene.output_size
    lo, hi = crop_bounds()
    P = pts.shape[0]
    k1_local = P // shape[1]  # full shard: cannot overflow
    k = 4096
    step = sharded_overlay_step(mesh, w, h, kernel="two_stage", k=k, k1=k1_local)
    rasters, _ = step(*[jnp.asarray(a) for a in args], jnp.asarray(lo), jnp.asarray(hi))

    single = np.asarray(_overlay_chunk_two_stage(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(cls),
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(fv),
        jnp.asarray(lo), jnp.asarray(hi), w, h, P, k, False,
    ))
    np.testing.assert_array_equal(np.asarray(rasters), single)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_sharded_fused_kernel_matches_single_device(clip, shape):
    """Sharded single-pass fused kernel == single-device fused rasters
    (shard-offset paint priorities reconstruct global order under pmax;
    per-shard union budgets generous enough not to overflow)."""
    from cama_tpu.pipeline import _overlay_chunk_fused

    mesh = make_mesh(n_frames_axis=shape[0], n_points_axis=shape[1])
    scene, fm, args = _prep(clip, mesh)
    pts, valid, cls, A, B, fv = args
    h, w = scene.output_size
    lo, hi = crop_bounds()
    k = pts.shape[0]  # full point count: the union list cannot overflow
    step = sharded_overlay_step(mesh, w, h, kernel="fused", k=k)
    rasters, _ = step(*[jnp.asarray(a) for a in args], jnp.asarray(lo), jnp.asarray(hi))

    single = np.asarray(_overlay_chunk_fused(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(cls),
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(fv),
        jnp.asarray(lo), jnp.asarray(hi), w, h, k, False,
    ))
    np.testing.assert_array_equal(np.asarray(rasters), single)


def test_scenes_axis_batched_kernel_matches_single_device(clip):
    """sharded_multi_scene_step over a ('scenes','frames') mesh must be
    bit-identical to the single-device scene-batched compact program."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cama_tpu.parallel import make_scene_mesh, sharded_multi_scene_step
    from cama_tpu.pipeline import ClipPipeline, MultiScenePipeline, _overlay_chunk_batched

    assert len(jax.devices()) >= 8
    # two scenes stacked by MultiScenePipeline (common padding), frame axis
    # padded to the mesh's frames extent
    pipes = [ClipPipeline(clip_path=clip, chunk=4)] * 2
    msp = MultiScenePipeline(pipes, chunk=4)
    _, _, pts, cls_, valid, A, B, fv = msp._stacked("cama")
    mesh = make_scene_mesh(n_scenes_axis=2, n_frames_axis=4)
    nf = mesh.shape["frames"]
    padF = (-A.shape[1]) % nf
    if padF:
        A = np.pad(A, [(0, 0), (0, padF), (0, 0), (0, 0)])
        A[:, -padF:] = np.eye(4)
        B = np.pad(B, [(0, 0), (0, padF)] + [(0, 0)] * 3)
        fv = np.pad(fv, [(0, 0), (0, padF)])
    lo, hi = pipes[0]._crop_lo, pipes[0]._crop_hi
    h, w = pipes[0].scene.output_size
    k = max(p.overlay_mode("cama")[1] for p in pipes)

    step = sharded_multi_scene_step(mesh, w, h, k=k)
    got = np.asarray(step(pts.astype(np.float32), valid, cls_,
                          A.astype(np.float32), B.astype(np.float32), fv,
                          lo, hi))
    want = np.asarray(_overlay_chunk_batched(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(cls_),
        jnp.asarray(A.astype(np.float32)), jnp.asarray(B.astype(np.float32)),
        jnp.asarray(fv), lo, hi, w, h, k, False))
    np.testing.assert_array_equal(got, want)
