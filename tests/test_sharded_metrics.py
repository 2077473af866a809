"""Frame-sharded map metrics on the virtual CPU mesh == single-device totals."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cama_tpu.eval.map_metrics import MapEvaluator, reduce_metrics
from cama_tpu.io.fixture import add_instance_masks, make_fixture_clip
from cama_tpu.parallel import make_mesh, pad_to_multiple
from cama_tpu.parallel.sharding import sharded_map_metrics
from cama_tpu.pipeline import ClipPipeline


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    c = make_fixture_clip(tmp_path_factory.mktemp("shmet"), n_frames=8,
                          with_images=False, with_lidar=False)
    add_instance_masks(c)
    return c


def test_sharded_metrics_match_single_device(clip):
    assert len(jax.devices()) >= 8
    pipe = ClipPipeline(clip_path=clip, chunk=4)
    ev = MapEvaluator(tolerance=4, max_radius=16)
    single = ev.evaluate_scene(pipe, "cama")

    fm = pipe.frame_matrices("cama")
    fp = pipe.scene.flat["cama"]
    h, w = pipe.scene.output_size
    # build gt mask stack for the valid frames
    gt, As, Bs, fvs = [], [], [], []
    for k, image_idx in enumerate(fm.frame_indices):
        if not fm.frame_valid[k]:
            continue
        masks = [ev.mask_loader(pipe, cam, int(image_idx)) for cam in pipe.scene.camera_list]
        gt.append(np.stack(masks))
        As.append(fm.A[k])
        Bs.append(fm.B[k])
        fvs.append(True)
    mesh = make_mesh(n_frames_axis=8, n_points_axis=1)
    nf = mesh.shape["frames"]
    gt = pad_to_multiple(np.stack(gt), nf)
    As = pad_to_multiple(np.stack(As).astype(np.float32), nf)
    Bs = pad_to_multiple(np.stack(Bs).astype(np.float32), nf)
    fvs = pad_to_multiple(np.asarray(fvs), nf)

    step = sharded_map_metrics(mesh, w, h, 16, 4)
    out = step(
        jnp.asarray(fp.points), jnp.asarray(fp.valid), jnp.asarray(gt),
        jnp.asarray(As), jnp.asarray(Bs), jnp.asarray(fvs),
        pipe._crop_lo, pipe._crop_hi,
    )
    totals = {k: float(v) for k, v in out.items()}
    merged = reduce_metrics([totals])
    for key in ["SRE", "precision", "recall", "f1"]:
        np.testing.assert_allclose(merged[key], single[key], rtol=1e-6, err_msg=key)




def test_sharded_metrics_euclidean_matches_single_device():
    """distance='euclidean' threads through the sharded psum step (incl. the
    scan-carry varying-axis fix in _nearest_dist_rows) and matches
    single-device frame_metrics sums.  Small synthetic shapes: the exact EDT
    at full video size takes minutes on the 1-core CI host."""
    from cama_tpu.eval.map_metrics import frame_metrics
    from cama_tpu.ops.geometry import project_frames

    F, C, H, W, P = 4, 2, 16, 24, 64
    rng = np.random.default_rng(0)
    points = rng.uniform(-5, 5, (P, 3)).astype(np.float32)
    valid = np.ones(P, bool)
    gt = rng.random((F, C, H, W)) < 0.1
    A = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    B = rng.uniform(-1, 1, (F, C, 3, 4)).astype(np.float32)
    fv = np.ones(F, bool)
    lo = np.zeros(3, np.float32)
    hi = np.ones(3, np.float32) * 50

    mesh = make_mesh(n_frames_axis=4, n_points_axis=1)
    step = sharded_map_metrics(mesh, W, H, 8, 3, distance="euclidean")
    got = step(jnp.asarray(points), jnp.asarray(valid), jnp.asarray(gt),
               jnp.asarray(A), jnp.asarray(B), jnp.asarray(fv),
               jnp.asarray(lo), jnp.asarray(hi))

    totals = {}
    for f in range(F):
        vu, keep = project_frames(
            jnp.asarray(points), jnp.asarray(valid), jnp.asarray(A[f:f + 1]),
            jnp.asarray(B[f:f + 1]), jnp.ones(1, bool), W, H,
            jnp.asarray(lo), jnp.asarray(hi))
        p = frame_metrics(jnp.asarray(gt[f]), vu[0], keep[0], 8, 3, "euclidean")
        for k2, v in p.items():
            totals[k2] = totals.get(k2, 0.0) + float(v)
    for k2, v in totals.items():
        np.testing.assert_allclose(float(got[k2]), v, rtol=1e-5, err_msg=k2)


def _mini_fleet(tmp_path_factory, n=3):
    root = tmp_path_factory.mktemp("fleet_sh")
    clips = []
    for i in range(n):
        c = make_fixture_clip(root, scene_name=f"scene-fl{i}", n_frames=5,
                              with_images=False, with_lidar=False, seed=i)
        add_instance_masks(c)
        clips.append(c)
    return [ClipPipeline(clip_path=c, chunk=4) for c in clips]


def test_scene_sharded_fleet_eval_matches_batch(tmp_path_factory):
    """evaluate_scene_batch_sharded on a ('scenes','frames') mesh must match
    the single-device fleet evaluator per scene (binary metrics)."""
    from cama_tpu.parallel import make_scene_mesh

    assert len(jax.devices()) >= 8
    pipes = _mini_fleet(tmp_path_factory)
    ev = MapEvaluator(tolerance=4, max_radius=16)
    want = ev.evaluate_scene_batch(pipes, "cama")
    mesh = make_scene_mesh(n_scenes_axis=4, n_frames_axis=2)
    got = ev.evaluate_scene_batch_sharded(pipes, mesh, "cama")
    assert len(got) == len(want)
    for g, w_ in zip(got, want):
        assert (g is None) == (w_ is None)
        if g is None:
            continue
        assert g["frames_evaluated"] == w_["frames_evaluated"]
        for key in ("SRE", "precision", "recall", "f1", "n_points",
                    "gt_pixels"):
            np.testing.assert_allclose(g[key], w_[key], rtol=1e-5,
                                       err_msg=key)
    # the compiled-step cache must key by mesh LAYOUT, never id(mesh): a
    # garbage-collected mesh's id can be recycled by a differently-shaped
    # successor, silently serving a step compiled for the wrong axis extents
    mesh_key = (tuple(mesh.shape.items()),
                tuple(d.id for d in mesh.devices.flat))
    assert any(k[0] == mesh_key for k in ev._sharded_steps)
    assert not any(isinstance(k[0], int) for k in ev._sharded_steps)


def test_sharded_metrics_compacted_matches_full():
    """k1 (crop-first compaction) threads through both sharded metric steps
    with identical totals — the multi-chip form of the evaluator's
    two-stage."""
    from cama_tpu.parallel.sharding import (
        make_scene_mesh,
        sharded_scene_batch_metrics,
    )

    F, C, H, W, P = 4, 2, 16, 24, 128
    rng = np.random.default_rng(3)
    points = rng.uniform(-8, 8, (P, 3)).astype(np.float32)
    valid = rng.random(P) > 0.1
    gt = rng.random((F, C, H, W)) < 0.1
    A = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    A[:, :3, 3] = rng.normal(0, 2, (F, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (F, C, 3, 4)).astype(np.float32)
    fv = np.ones(F, bool)
    lo = np.full(3, -4.0, np.float32)
    hi = np.full(3, 4.0, np.float32)

    mesh = make_mesh(n_frames_axis=4, n_points_axis=1)
    a = (jnp.asarray(points), jnp.asarray(valid), jnp.asarray(gt),
         jnp.asarray(A), jnp.asarray(B), jnp.asarray(fv),
         jnp.asarray(lo), jnp.asarray(hi))
    full = sharded_map_metrics(mesh, W, H, 8, 3)(*a)
    comp = sharded_map_metrics(mesh, W, H, 8, 3, k1=64)(*a)
    for k2, v in full.items():
        np.testing.assert_allclose(float(comp[k2]), float(v), rtol=1e-6,
                                   err_msg=k2)

    # fleet form: 2 scenes over a ('scenes', 'frames') mesh
    S = 2
    sp = np.stack([points, points + 0.5])
    sv = np.stack([valid, valid])
    sgt = rng.random((S, F, C, H, W)) < 0.1
    sA = np.stack([A, A])
    sB = np.stack([B, B])
    sf = np.ones((S, F), bool)
    smesh = make_scene_mesh(n_scenes_axis=2, n_frames_axis=4)
    b = (jnp.asarray(sp), jnp.asarray(sv), jnp.asarray(sgt), jnp.asarray(sA),
         jnp.asarray(sB), jnp.asarray(sf), jnp.asarray(lo), jnp.asarray(hi))
    full_b = sharded_scene_batch_metrics(smesh, W, H, 8, 3)(*b)
    comp_b = sharded_scene_batch_metrics(smesh, W, H, 8, 3, k1=64)(*b)
    for k2, v in full_b.items():
        np.testing.assert_allclose(np.asarray(comp_b[k2]), np.asarray(v),
                                   rtol=1e-6, err_msg=k2)


def test_scene_sharded_fleet_eval_compacted(tmp_path_factory):
    """Wide fleet: evaluate_scene_batch_sharded engages the fleet-wide k1
    (consult-only sizing) and still matches the full-P single-device fleet
    evaluator per scene."""
    from cama_tpu.parallel import make_scene_mesh

    assert len(jax.devices()) >= 8
    root = tmp_path_factory.mktemp("sharded_wide")
    pipes = []
    for i in range(2):
        c = make_fixture_clip(root, scene_name=f"sw-{i}", n_frames=4,
                              with_images=False, with_lidar=False, seed=i,
                              label_span=(-290.0, 210.0))
        add_instance_masks(c)
        p = ClipPipeline(clip_path=c, chunk=2)
        p.overlay_mode("cama")  # size every member -> sharded path compacts
        assert p.crop_compact_k("cama") is not None
        pipes.append(p)
    want = MapEvaluator(tolerance=4, max_radius=16,
                        compact="off").evaluate_scene_batch(pipes, "cama")
    mesh = make_scene_mesh(n_scenes_axis=2, n_frames_axis=4)
    got = MapEvaluator(tolerance=4, max_radius=16).evaluate_scene_batch_sharded(
        pipes, mesh, "cama")
    assert len(got) == len(want)
    for g, w_ in zip(got, want):
        assert g is not None and w_ is not None
        assert g["frames_evaluated"] == w_["frames_evaluated"] > 0
        for key in ("SRE", "precision", "recall", "f1", "n_points",
                    "gt_pixels"):
            np.testing.assert_allclose(g[key], w_[key], rtol=1e-5,
                                       err_msg=key)
