"""Fused single-pass project+dedup+compact kernel (ops/fused_compact.py) vs
its XLA mirror and the production two-stage path — interpret mode on CPU;
the on-chip lane lives in the tpu-marked test below and the timing in
bench.py's device lane."""
import numpy as np
import pytest

import jax.numpy as jnp

from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.io.scene import compile_scene
from cama_tpu.ops.fused_compact import (
    count_union_chunk,
    fused_compact_mirror,
    fused_compact_project,
    rasterize_from_union,
    TILE,
)
from cama_tpu.ops.geometry import compose_frame_matrices, crop_bounds


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    clip = make_fixture_clip(tmp_path_factory.mktemp("fc"), n_frames=4,
                             with_images=False, with_lidar=False)
    return compile_scene(clip)


def _frame_inputs(scene):
    fm = compose_frame_matrices(
        scene.traj["cama"], scene.frame_times, scene.chassis2cam, scene.K_scaled
    )
    fp = scene.flat["cama"]
    h, w = scene.output_size
    lo, hi = crop_bounds()
    pts = jnp.asarray(fp.points)
    pts4 = jnp.asarray(
        np.concatenate([fp.points, np.ones((len(fp.points), 1), np.float32)],
                       axis=1).T)
    return fm, pts, pts4, jnp.asarray(fp.valid), jnp.asarray(fp.cls), w, h, \
        jnp.asarray(lo), jnp.asarray(hi)


def test_fused_kernel_matches_mirror(scene):
    """Interpret-mode kernel output is bit-equal to the sort-based XLA
    mirror on every valid fixture frame (values AND count)."""
    fm, pts, pts4, valid, cls, w, h, lo, hi = _frame_inputs(scene)
    k_cap = int(count_union_chunk(
        pts, valid, cls, jnp.asarray(fm.A.astype(np.float32)),
        jnp.asarray(fm.B.astype(np.float32)), jnp.asarray(fm.frame_valid),
        lo, hi, w, h))
    k_cap = max(256, -(-k_cap // 128) * 128)
    checked = 0
    for k in range(len(fm.frame_indices)):
        if not fm.frame_valid[k]:
            continue
        A = jnp.asarray(fm.A[k].astype(np.float32))
        B = jnp.asarray(fm.B[k].astype(np.float32))
        vals_k, cnt_k = fused_compact_project(
            pts4, valid, cls, A, B, w, h, lo, hi, k_cap, interpret=True)
        vals_m, cnt_m = fused_compact_mirror(
            pts, valid, cls, A, B, w, h, lo, hi, k_cap)
        assert int(cnt_k) == int(cnt_m)
        n = int(cnt_k)
        assert n > 0, "fixture frame projected no points — test is vacuous"
        np.testing.assert_array_equal(np.asarray(vals_k)[:n],
                                      np.asarray(vals_m)[:n])
        checked += 1
    assert checked >= 2


def test_fused_raster_vs_two_stage(scene):
    """rasterize_from_union over the kernel's union list: bit-identical to
    the same raster built from the MIRROR list (pure compaction parity), and
    >= 0.99999 pixel agreement with the production two-stage raster — the
    residual is the einsum-vs-dot f32 borderline class every device lane
    carries (PARITY.md divergence #1); measured 1 pixel in 3.1M here."""
    from cama_tpu.pipeline import _overlay_chunk_two_stage, _count_chunk
    from cama_tpu.ops.raster import packed_to_cls

    fm, pts, pts4, valid, cls, w, h, lo, hi = _frame_inputs(scene)
    A = jnp.asarray(fm.A.astype(np.float32))
    B = jnp.asarray(fm.B.astype(np.float32))
    fv = jnp.asarray(fm.frame_valid)
    k_crop, k_eff, _ku = (int(x) for x in _count_chunk(
        pts, valid, cls, A, B, fv, lo, hi, w, h))
    k1 = max(256, -(-k_crop // 128) * 128)
    k2 = max(256, -(-k_eff // 128) * 128)
    ref = np.asarray(_overlay_chunk_two_stage(
        pts, valid, cls, A, B, fv, lo, hi, w, h, k1, min(k1, k2), False))

    k_cap = int(count_union_chunk(pts, valid, cls, A, B, fv, lo, hi, w, h))
    k_cap = max(256, -(-k_cap // 128) * 128)
    C = B.shape[1]
    for k in range(len(fm.frame_indices)):
        if not fm.frame_valid[k]:
            continue
        vals_k, cnt_k = fused_compact_project(
            pts4, valid, cls, A[k], B[k], w, h, lo, hi, k_cap, interpret=True)
        got = np.asarray(packed_to_cls(rasterize_from_union(
            vals_k, cnt_k, C, w, h)))
        vals_m, cnt_m = fused_compact_mirror(
            pts, valid, cls, A[k], B[k], w, h, lo, hi, k_cap)
        mirror_raster = np.asarray(packed_to_cls(rasterize_from_union(
            vals_m, cnt_m, C, w, h)))
        np.testing.assert_array_equal(got, mirror_raster)
        agree = (got == ref[k]).mean()
        assert agree >= 0.99999, f"frame {k}: agreement {agree}"


def test_fused_dedup_across_tile_boundary():
    """Same-pixel runs straddling the TILE boundary: the deferred-lane
    mechanism must reproduce original-adjacency dedup exactly.  Points sit
    on one camera ray in a synthetic geometry so consecutive points land on
    identical pixels around lanes TILE-2..TILE+2."""
    P = TILE + 512
    rng = np.random.default_rng(3)
    # identity-ish camera: B projects x,y onto pixels directly, z = depth
    B = np.zeros((1, 3, 4), np.float32)
    B[0, 0, 0] = 1.0   # u <- x
    B[0, 1, 1] = 1.0   # v <- y
    B[0, 2, 2] = 1.0   # w <- z
    A = np.eye(4, dtype=np.float32)
    lo = np.array([-1e6, -1e6, -1e6], np.float32)
    hi = np.array([1e6, 1e6, 1e6], np.float32)
    w, h = 64, 64
    # long same-pixel runs: pixel index changes every ~3 points
    base = np.repeat(np.arange(P // 3 + 2), 3)[:P]
    pts = np.stack([
        (base % w).astype(np.float32) + rng.uniform(0.05, 0.95, P).astype(np.float32) * 0,
        ((base // w) % h).astype(np.float32),
        np.ones(P, np.float32),
    ], axis=1)
    valid = np.ones(P, bool)
    # sprinkle invalid points INSIDE runs so suppression must skip them
    valid[rng.choice(P, 200, replace=False)] = False
    cls = (base % 3).astype(np.int32)

    pts4 = jnp.asarray(np.concatenate([pts, np.ones((P, 1), np.float32)], 1).T)
    args = (jnp.asarray(valid), jnp.asarray(cls), jnp.asarray(A),
            jnp.asarray(B), w, h, jnp.asarray(lo), jnp.asarray(hi))
    k_cap = 2048
    vals_k, cnt_k = fused_compact_project(pts4, *args, k_cap, interpret=True)
    vals_m, cnt_m = fused_compact_mirror(jnp.asarray(pts), *args, k_cap)
    assert int(cnt_k) == int(cnt_m) > 0
    n = int(cnt_k)
    np.testing.assert_array_equal(np.asarray(vals_k)[:n],
                                  np.asarray(vals_m)[:n])


def test_fused_overflow_detectable(scene):
    """count > k_cap signals overflow (same contract as compact_points);
    the first k_cap columns still hold the first k_cap survivors."""
    fm, pts, pts4, valid, cls, w, h, lo, hi = _frame_inputs(scene)
    k = int(np.flatnonzero(fm.frame_valid)[0])
    A = jnp.asarray(fm.A[k].astype(np.float32))
    B = jnp.asarray(fm.B[k].astype(np.float32))
    big_cap = 8192
    vals_full, cnt_full = fused_compact_mirror(
        pts, valid, cls, A, B, w, h, lo, hi, big_cap)
    n = int(cnt_full)
    assert n > 8, "need enough survivors to truncate"
    small = max(8, (n // 2) // 8 * 8)
    vals_k, cnt_k = fused_compact_project(
        pts4, valid, cls, A, B, w, h, lo, hi, small, interpret=True)
    assert int(cnt_k) == n > small  # overflow visible to the caller
    np.testing.assert_array_equal(np.asarray(vals_k)[:small],
                                  np.asarray(vals_full)[:small])


def test_pipeline_fused_kernel_serves(tmp_path):
    """raster_kernel='fused' end-to-end: the pipeline sizes k_cap from the
    counting pass's new union maximum (persisted as the sidecar's third
    entry), serves every frame, and agrees with the 'compact' pipeline at
    the device-lane contract (>= 0.99999; the residual is the dot-vs-einsum
    borderline class)."""
    import json
    import os

    from cama_tpu.pipeline import ClipPipeline

    clip = make_fixture_clip(tmp_path / "clip", n_frames=4,
                             with_images=False, with_lidar=False)
    ref_pipe = ClipPipeline(clip_path=clip, chunk=2, raster_kernel="compact")
    ref = dict(ref_pipe.iter_overlay_rasters("cama"))

    pipe = ClipPipeline(clip_path=clip, chunk=2, raster_kernel="fused")
    got = dict(pipe.iter_overlay_rasters("cama"))
    assert pipe._fused_k.get("cama") is not None
    assert set(got) == set(ref) and len(got) >= 2
    for idx in ref:
        agree = (got[idx] == ref[idx]).mean()
        assert agree >= 0.99999, f"frame {idx}: agreement {agree}"

    # sidecar round-trip: third entry present, fresh process consumes it
    sidecar = os.path.join(pipe._cache_dir(), "overlay_counts.json")
    entries = list(json.load(open(sidecar)).values())
    assert entries and all(len(e) == 3 for e in entries)
    fresh = ClipPipeline(clip_path=clip, chunk=2, raster_kernel="fused")
    fresh.overlay_mode("cama")
    assert fresh._fused_k.get("cama") == pipe._fused_k.get("cama")


def test_pipeline_fused_fallback_legacy_sidecar(tmp_path):
    """A legacy 2-entry sidecar (no union count) still serves: sizing falls
    back to the crop bound — a valid upper bound for the union."""
    import json
    import os

    from cama_tpu.pipeline import ClipPipeline

    clip = make_fixture_clip(tmp_path / "clip", n_frames=3,
                             with_images=False, with_lidar=False)
    pipe = ClipPipeline(clip_path=clip, chunk=2, raster_kernel="fused")
    pipe.overlay_mode("cama")
    sidecar = os.path.join(pipe._cache_dir(), "overlay_counts.json")
    data = json.load(open(sidecar))
    legacy = {k: v[:2] for k, v in data.items()}
    json.dump(legacy, open(sidecar, "w"))

    fresh = ClipPipeline(clip_path=clip, chunk=2, raster_kernel="fused")
    fresh.overlay_mode("cama")
    ku = fresh._fused_k.get("cama")
    assert ku is not None and ku >= pipe._fused_k.get("cama")
    rasters = dict(fresh.iter_overlay_rasters("cama"))
    assert len(rasters) >= 2
