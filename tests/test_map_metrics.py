"""SRE / precision / recall / F1 map metrics: unit tests vs a brute-force
NumPy Chebyshev distance, plus scene-level sanity on the fixture clip with
self-consistent and deliberately-shifted GT masks."""
import numpy as np
import pytest

import jax.numpy as jnp

from cama_tpu.eval.map_metrics import MapEvaluator, frame_metrics, reduce_metrics
from cama_tpu.io.fixture import add_instance_masks, make_fixture_clip
from cama_tpu.pipeline import ClipPipeline

RNG = np.random.default_rng(9)


def brute_force(gt, vu, keep, max_radius, tolerance):
    C, H, W = gt.shape
    ys, xs = np.mgrid[0:H, 0:W]
    out = {"sre_sum": 0.0, "n_points": 0.0, "n_hit": 0.0, "gt_total": 0.0, "gt_covered": 0.0}
    for c in range(C):
        mask_pts = np.stack([ys[gt[c]], xs[gt[c]]], -1)
        out["gt_total"] += gt[c].sum()
        kept = np.flatnonzero(keep[c])
        pv = np.clip(vu[c, kept, 0].astype(np.int32), 0, H - 1)
        pu = np.clip(vu[c, kept, 1].astype(np.int32), 0, W - 1)
        out["n_points"] += len(kept)
        if len(mask_pts) == 0:
            out["sre_sum"] += max_radius * len(kept)
            continue
        # chebyshev distance point -> mask
        d = np.max(
            np.abs(np.stack([pv, pu], -1)[:, None, :] - mask_pts[None, :, :]), axis=-1
        ).min(axis=1)
        d = np.minimum(d, max_radius)
        out["sre_sum"] += d.sum()
        out["n_hit"] += (d <= tolerance).sum()
        # recall: gt pixels within tolerance (chebyshev) of any point
        if len(kept):
            dg = np.max(
                np.abs(mask_pts[:, None, :] - np.stack([pv, pu], -1)[None, :, :]), axis=-1
            ).min(axis=1)
            out["gt_covered"] += (dg <= tolerance).sum()
    return out


def test_frame_metrics_matches_brute_force():
    C, H, W, P = 2, 40, 56, 60
    gt = RNG.random((C, H, W)) > 0.98
    vu = np.stack([RNG.uniform(0, H, (C, P)), RNG.uniform(0, W, (C, P))], -1).astype(np.float32)
    keep = RNG.random((C, P)) > 0.2
    got = frame_metrics(jnp.asarray(gt), jnp.asarray(vu), jnp.asarray(keep), 12, 3)
    want = brute_force(gt, vu, keep, 12, 3)
    for k, v in want.items():
        np.testing.assert_allclose(float(got[k]), v, atol=1e-5, err_msg=k)


def test_squared_edt_matches_scipy():
    from scipy.ndimage import distance_transform_edt

    from cama_tpu.eval.map_metrics import squared_edt

    rng = np.random.default_rng(3)
    for shape, p in (((48, 64), 0.02), ((37, 53), 0.2), ((16, 16), 0.0)):
        mask = rng.random(shape) < p
        got = np.asarray(squared_edt(jnp.asarray(mask)))
        exp = distance_transform_edt(~mask) ** 2
        if not mask.any():
            assert (got >= 1e7).all()  # "no seed" sentinel distances
            continue
        np.testing.assert_allclose(got, exp, rtol=0, atol=1e-3)
    # batched [C, H, W]
    m = rng.random((3, 24, 40)) < 0.05
    got = np.asarray(squared_edt(jnp.asarray(m)))
    for c in range(3):
        np.testing.assert_allclose(got[c], distance_transform_edt(~m[c]) ** 2, atol=1e-3)


def test_frame_metrics_euclidean_vs_brute_force():
    rng = np.random.default_rng(11)
    C, H, W, P = 2, 40, 56, 300
    gt = rng.random((C, H, W)) < 0.03
    vu = np.stack([rng.uniform(0, H - 1, (C, P)), rng.uniform(0, W - 1, (C, P))],
                  axis=-1).astype(np.float32)
    keep = rng.random((C, P)) < 0.8
    max_radius, tol = 12, 3
    got = frame_metrics(jnp.asarray(gt), jnp.asarray(vu), jnp.asarray(keep),
                        max_radius, tol, "euclidean")
    got = {k: float(v) for k, v in got.items()}

    from scipy.ndimage import distance_transform_edt

    sre, hits = 0.0, 0
    for c in range(C):
        d = distance_transform_edt(~gt[c])
        vi = np.clip(vu[c, :, 0].astype(int), 0, H - 1)
        ui = np.clip(vu[c, :, 1].astype(int), 0, W - 1)
        dp = d[vi, ui]
        sre += np.minimum(dp, max_radius)[keep[c]].sum()
        hits += int((dp[keep[c]] <= tol).sum())
        # recall: gt pixels within tol of a kept point
        pr = np.zeros((H, W), bool)
        pr[vi[keep[c]], ui[keep[c]]] = True
        dpr = distance_transform_edt(~pr)
        if c == 0:
            cov0 = int((gt[c] & (dpr <= tol)).sum())
    assert abs(got["sre_sum"] - sre) < 1e-2 * max(1.0, sre)
    assert got["n_hit"] == hits
    assert got["n_points"] == keep.sum()


def test_chebyshev_vs_euclidean_bounded():
    """The Chebyshev approximation is within sqrt(2)x of Euclidean — quantify
    the deviation VERDICT flagged as unbounded."""
    rng = np.random.default_rng(5)
    C, H, W, P = 1, 48, 48, 400
    gt = rng.random((C, H, W)) < 0.04
    vu = np.stack([rng.uniform(0, H - 1, (C, P)), rng.uniform(0, W - 1, (C, P))],
                  axis=-1).astype(np.float32)
    keep = np.ones((C, P), bool)
    a = frame_metrics(jnp.asarray(gt), jnp.asarray(vu), jnp.asarray(keep), 15, 3,
                      "chebyshev")
    b = frame_metrics(jnp.asarray(gt), jnp.asarray(vu), jnp.asarray(keep), 15, 3,
                      "euclidean")
    cheb, eucl = float(a["sre_sum"]), float(b["sre_sum"])
    assert cheb <= eucl + 1e-3  # Chebyshev <= Euclidean pointwise
    assert eucl <= cheb * np.sqrt(2) + 1e-3


def test_reduce_metrics_math():
    partials = [
        {"sre_sum": 10.0, "n_points": 10.0, "n_hit": 8.0, "gt_total": 20.0, "gt_covered": 10.0},
        {"sre_sum": 0.0, "n_points": 10.0, "n_hit": 10.0, "gt_total": 20.0, "gt_covered": 20.0},
    ]
    out = reduce_metrics(partials)
    assert out["SRE"] == 0.5
    assert out["precision"] == 0.9
    assert out["recall"] == 0.75
    np.testing.assert_allclose(out["f1"], 2 * 0.9 * 0.75 / 1.65)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    root = tmp_path_factory.mktemp("metrics_fx")
    c = make_fixture_clip(root, n_frames=5, with_images=False, with_lidar=False)
    add_instance_masks(c)
    return c


def test_scene_metrics_self_consistent(clip):
    pipe = ClipPipeline(clip_path=clip, chunk=4)
    ev = MapEvaluator(tolerance=5, max_radius=20)
    out = ev.evaluate_scene(pipe, "cama")
    assert out["frames_evaluated"] > 0
    # masks were drawn from the same projection with radius-3 circles:
    # every projected point should sit on (or within a px of) the mask
    assert out["precision"] > 0.995
    assert out["SRE"] < 0.2
    assert out["recall"] > 0.5  # thick masks cover more area than points
    assert 0 < out["f1"] <= 1


def test_cama_vs_nuscenes_origin_labels(clip, tmp_path):
    """BASELINE.json config 3: score the CAMA map against ground truth derived
    from the nuScenes ORIGIN labels.  The fixture's two sources describe the
    same world polylines through different frames/chains, so cross-source
    agreement should be high but below self-consistency."""
    # flat height: the cama grid's synthetic z (vs nuScenes z=0) would
    # otherwise dominate the cross-source comparison
    cross = make_fixture_clip(tmp_path, scene_name="cross", n_frames=5,
                              with_images=False, with_lidar=False, flat_height=True)
    add_instance_masks(cross, source="nuscenes")  # GT masks from nuScenes labels
    pipe = ClipPipeline(clip_path=cross, chunk=4)
    out = MapEvaluator(tolerance=5, max_radius=20).evaluate_scene(pipe, "cama")
    assert out["frames_evaluated"] > 0
    assert out["precision"] > 0.9  # same world, small cross-chain error
    assert out["SRE"] < 3.0
    assert 0 < out["f1"] <= 1
    import shutil

    shifted = str(tmp_path / "shifted")
    shutil.copytree(clip, shifted)
    add_instance_masks(shifted, shift_px=12.0)
    base = MapEvaluator(tolerance=3, max_radius=20).evaluate_scene(
        ClipPipeline(clip_path=clip, chunk=4), "cama"
    )
    worse = MapEvaluator(tolerance=3, max_radius=20).evaluate_scene(
        ClipPipeline(clip_path=shifted, chunk=4), "cama"
    )
    assert worse["SRE"] > base["SRE"] + 2.0
    assert worse["precision"] < base["precision"] - 0.2


def test_instance_association_unit():
    from cama_tpu.eval.map_metrics import instance_association

    # map inst 1: votes 10x gt 5, 2x bg -> matched, purity 10/12
    # map inst 2: all background -> unmatched, purity 0
    # map inst 3: votes gt 7 -> matched
    mi = np.array([1] * 12 + [2] * 4 + [3] * 3)
    gi = np.array([5] * 10 + [0] * 2 + [0] * 4 + [7] * 3)
    out = instance_association(mi, gi)
    assert out["n_map_instances"] == 3
    assert out["n_gt_instances"] == 2
    assert abs(out["instance_precision"] - 2 / 3) < 1e-9
    assert out["instance_recall"] >= 0.7  # crop-culled map twins may leave GT ids unclaimed
    assert abs(out["mean_purity"] - (10 / 12 + 0.0 + 1.0) / 3) < 1e-9


def test_scene_instance_metrics_self_consistent(clip):
    """Masks generated from the clip's own labels: every visible map instance
    must associate cleanly with its own GT id."""
    ev = MapEvaluator(tolerance=4)
    pipe = ClipPipeline(clip_path=clip, chunk=4)
    out = ev.evaluate_scene_instances(pipe, "cama")
    assert out["frames_evaluated"] > 0
    assert out["n_map_instances"] > 0
    assert out["instance_precision"] == 1.0
    assert out["instance_recall"] >= 0.7  # crop-culled map twins may leave GT ids unclaimed
    assert out["mean_purity"] > 0.8  # nearest-downsampled thin masks leak some background votes


def test_evaluate_scene_all_matches_separate_passes(clip):
    """The one-pass combined evaluation (used by --instances) must return the
    exact union of the two single-metric methods."""
    ev = MapEvaluator(tolerance=4)
    pipe = ClipPipeline(clip_path=clip, chunk=4)
    combined = ev.evaluate_scene_all(pipe, "cama")
    scene = ev.evaluate_scene(pipe, "cama")
    inst = ev.evaluate_scene_instances(pipe, "cama")
    for k, v in {**scene, **inst}.items():
        assert combined[k] == pytest.approx(v), k


def test_squared_edt_edge_masks():
    from scipy.ndimage import distance_transform_edt

    from cama_tpu.eval.map_metrics import squared_edt

    # full-True mask: all distances zero
    m = np.ones((12, 20), bool)
    assert (np.asarray(squared_edt(jnp.asarray(m))) == 0).all()
    # single pixel
    m = np.zeros((15, 17), bool)
    m[7, 3] = True
    got = np.asarray(squared_edt(jnp.asarray(m)))
    np.testing.assert_allclose(got, distance_transform_edt(~m) ** 2, atol=1e-3)
    # single row / single column masks (degenerate scan directions)
    m = np.zeros((9, 11), bool)
    m[0, :] = True
    got = np.asarray(squared_edt(jnp.asarray(m)))
    np.testing.assert_allclose(got, distance_transform_edt(~m) ** 2, atol=1e-3)


# ---------------------------------------------------------------------------
# exact nearest-instance feature transform (round-3: replaces the
# larger-id-wins dilation approximation in association voting)
# ---------------------------------------------------------------------------


def test_nearest_id_edt_matches_brute_force():
    from cama_tpu.eval.map_metrics import nearest_id_edt

    rng = np.random.default_rng(3)
    ids = np.zeros((2, 17, 23), np.int32)
    for c in range(2):
        for inst in (1, 2, 3):
            yy, xx = rng.integers(0, 17, 4), rng.integers(0, 23, 4)
            ids[c, yy, xx] = inst
    d2, nid = (np.asarray(a) for a in nearest_id_edt(jnp.asarray(ids)))
    ys, xs = np.mgrid[0:17, 0:23]
    for c in range(2):
        fy, fx = np.nonzero(ids[c])
        dd = (ys[..., None] - fy) ** 2 + (xs[..., None] - fx) ** 2  # [H, W, F]
        best = dd.min(-1)
        np.testing.assert_array_equal(d2[c], best)
        # the returned id must be A nearest instance (ties are impl-defined)
        at_best = ids[c, fy, fx][None, None, :] * (dd == best[..., None])
        assert ((at_best == nid[c][..., None]).any(-1)).all()


def test_nearest_assignment_wins_in_overlap_zone():
    """Two instances within 2*tolerance: the nearest one must receive the
    vote (the dilation rule hands the overlap to the larger id)."""
    from cama_tpu.eval.map_metrics import frame_instance_pairs

    tol = 3
    gt = np.zeros((1, 9, 32), np.int32)
    gt[0, :, 10] = 1   # instance 1 at column 10
    gt[0, :, 14] = 2   # instance 2 (larger id) at column 14: gap 4 < 2*tol
    # one projected point at column 11 -> Euclidean-nearest is instance 1
    vu = np.array([[[4.0, 11.0]]], np.float32)
    keep = np.ones((1, 1), bool)
    point_inst = np.array([7])

    mi, gi = frame_instance_pairs(gt, jnp.asarray(vu), jnp.asarray(keep),
                                  point_inst, tol)
    assert list(mi) == [7] and list(gi) == [1], "nearest instance must win"
    mi, gi = frame_instance_pairs(gt, jnp.asarray(vu), jnp.asarray(keep),
                                  point_inst, tol, assignment="chebyshev")
    assert list(gi) == [2], "dilation mode keeps the larger-id-wins rule"


def test_nearest_assignment_respects_tolerance():
    from cama_tpu.eval.map_metrics import frame_instance_pairs

    gt = np.zeros((1, 9, 32), np.int32)
    gt[0, 4, 10] = 5
    vu = np.array([[[4.0, 14.0], [4.0, 12.0]]], np.float32)  # d=4 and d=2
    keep = np.ones((1, 2), bool)
    point_inst = np.array([1, 2])
    mi, gi = frame_instance_pairs(gt, jnp.asarray(vu), jnp.asarray(keep),
                                  point_inst, 3)
    assert list(gi) == [0, 5], "beyond-tolerance points vote background"


def test_frame_metrics_chunk_matches_per_frame():
    """Chunk-batched metrics (one dispatch) == summed per-frame calls, with
    zero-weighted padding rows contributing nothing — both distances."""
    from cama_tpu.eval.map_metrics import frame_metrics_chunk

    K, C, H, W, P = 4, 2, 40, 56, 60
    gt = RNG.random((K, C, H, W)) > 0.98
    vu = np.stack([RNG.uniform(-5, H + 5, (K, C, P)),
                   RNG.uniform(-5, W + 5, (K, C, P))], -1).astype(np.float32)
    keep = RNG.random((K, C, P)) > 0.2
    fv = np.array([1.0, 0.0, 1.0, 1.0], np.float32)  # row 1 is padding
    for distance in ("chebyshev", "euclidean"):
        got = frame_metrics_chunk(jnp.asarray(gt), jnp.asarray(vu),
                                  jnp.asarray(keep), jnp.asarray(fv),
                                  12, 3, distance)
        want = {}
        for k in range(K):
            if fv[k] == 0.0:
                continue
            p = frame_metrics(jnp.asarray(gt[k]), jnp.asarray(vu[k]),
                              jnp.asarray(keep[k]), 12, 3, distance)
            for k2, v in p.items():
                want[k2] = want.get(k2, 0.0) + float(v)
        for k2, v in want.items():
            np.testing.assert_allclose(float(got[k2]), v, rtol=1e-6,
                                       err_msg=f"{distance}:{k2}")


def test_instance_votes_chunk_matches_per_frame():
    """Batched association votes == frame_instance_pairs row by row."""
    from cama_tpu.eval.map_metrics import frame_instance_pairs, instance_votes_chunk

    K, C, H, W, P = 3, 2, 32, 48, 40
    gt = (RNG.random((K, C, H, W)) > 0.97).astype(np.int32) * RNG.integers(
        1, 5, (K, C, H, W), dtype=np.int32)
    vu = np.stack([RNG.uniform(0, H, (K, C, P)),
                   RNG.uniform(0, W, (K, C, P))], -1).astype(np.float32)
    keep = RNG.random((K, C, P)) > 0.3
    point_inst = RNG.integers(0, 6, (P,), dtype=np.int32)
    for assignment in ("nearest", "chebyshev"):
        votes = np.asarray(instance_votes_chunk(
            jnp.asarray(gt), jnp.asarray(vu), jnp.asarray(keep), 3, assignment))
        for k in range(K):
            mi_want, gi_want = frame_instance_pairs(
                gt[k], jnp.asarray(vu[k]), jnp.asarray(keep[k]), point_inst,
                3, assignment=assignment)
            gi_got = votes[k][keep[k]].astype(np.int64)
            mi_got = np.broadcast_to(point_inst[None, :], keep[k].shape)[
                keep[k]].astype(np.int64)
            np.testing.assert_array_equal(gi_got, gi_want, err_msg=assignment)
            np.testing.assert_array_equal(mi_got, mi_want)


def test_evaluate_scene_chunked_equals_reference_totals(tmp_path):
    """The chunk-batched evaluator path on the fixture clip produces the same
    totals as a hand-rolled per-frame loop over the same projections."""
    clip = make_fixture_clip(tmp_path, scene_name="scene-chunk", n_frames=5,
                             with_images=False, with_lidar=False)
    add_instance_masks(clip)
    pipe = ClipPipeline(clip_path=str(clip), chunk=2)  # several partial chunks
    ev = MapEvaluator(tolerance=3, max_radius=8)
    got = ev.evaluate_scene(pipe, "cama")

    partials = []
    n = 0
    for image_idx, vu, keep in ev._iter_frame_projections(pipe, "cama", None):
        ids = ev._load_all_cameras(pipe, image_idx)
        if ids is None:
            continue
        p = frame_metrics(jnp.asarray(ids > 0), vu, keep, 8, 3)
        partials.append({k: np.asarray(v) for k, v in p.items()})
        n += 1
    want = reduce_metrics(partials)
    assert got["frames_evaluated"] == n > 0
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-6, err_msg=k)

    # and the fused all-in-one pass agrees on the shared keys
    both = ev.evaluate_scene_all(pipe, "cama")
    for k in ("SRE", "precision", "recall", "f1", "n_points", "gt_pixels"):
        np.testing.assert_allclose(both[k], got[k], rtol=1e-6, err_msg=k)


def test_packed_chunk_and_device_ids_match_dense():
    """Bitpacked mask upload and sparse-COO id upload are pure transport
    optimizations: results identical to the dense arrays they encode."""
    import jax

    from cama_tpu.eval.map_metrics import (
        device_ids, frame_metrics_chunk, frame_metrics_chunk_packed)

    K, C, H, W, P = 3, 2, 24, 37, 50  # W deliberately not a multiple of 8
    ids = (RNG.random((K, C, H, W)) > 0.96).astype(np.uint16) * RNG.integers(
        1, 7, (K, C, H, W), dtype=np.uint16)
    vu = np.stack([RNG.uniform(0, H, (K, C, P)),
                   RNG.uniform(0, W, (K, C, P))], -1).astype(np.float32)
    keep = RNG.random((K, C, P)) > 0.3
    fv = np.ones((K,), np.float32)

    dense = frame_metrics_chunk(jnp.asarray(ids > 0), jnp.asarray(vu),
                                jnp.asarray(keep), jnp.asarray(fv), 10, 3)
    packed = frame_metrics_chunk_packed(
        jnp.asarray(np.packbits(ids > 0, axis=-1)), jnp.asarray(vu),
        jnp.asarray(keep), jnp.asarray(fv), W, 10, 3)
    for k in dense:
        np.testing.assert_array_equal(np.asarray(dense[k]),
                                      np.asarray(packed[k]), err_msg=k)

    np.testing.assert_array_equal(np.asarray(device_ids(ids)), ids)
    dense_ids = np.full((2, 3, 3), 5, np.uint16)  # >1/3 nonzero: dense path
    np.testing.assert_array_equal(np.asarray(device_ids(dense_ids)), dense_ids)
    np.testing.assert_array_equal(
        np.asarray(device_ids(np.zeros((2, 4, 4), np.int32))), 0)


def test_nearest_id_within_matches_full_edt_inside_mask():
    """The bounded feature transform is identical to the full EDT for every
    pixel within the radius (same ids, same distances, same tie-breaks) —
    only pixels the tolerance test discards may differ."""
    from cama_tpu.eval.map_metrics import nearest_id_edt, nearest_id_within

    for radius in (1, 3, 5):
        ids = (RNG.random((2, 30, 44)) > 0.93).astype(np.int32) * RNG.integers(
            1, 9, (2, 30, 44), dtype=np.int32)
        d2_f, id_f = (np.asarray(a) for a in nearest_id_edt(jnp.asarray(ids)))
        d2_b, id_b = (np.asarray(a) for a in
                      nearest_id_within(jnp.asarray(ids), radius))
        inside = d2_f <= radius ** 2
        np.testing.assert_array_equal(d2_b[inside], d2_f[inside])
        np.testing.assert_array_equal(id_b[inside], id_f[inside])
        # and the bounded pass never UNDER-estimates outside the radius
        assert (d2_b >= d2_f - 1e-6).all()


def test_squared_edt_within_capped_equals_full():
    """min(sqrt(bounded), R) == min(sqrt(full), R) everywhere, and the
    bounded transform never under-estimates — the property the Euclidean
    metric path relies on."""
    from cama_tpu.eval.map_metrics import squared_edt, squared_edt_within

    mask = RNG.random((2, 28, 52)) > 0.95
    full = np.asarray(squared_edt(jnp.asarray(mask)))
    for R in (2, 6, 11):
        bounded = np.asarray(squared_edt_within(jnp.asarray(mask), R))
        assert (bounded >= full - 1e-4).all()
        np.testing.assert_allclose(
            np.minimum(np.sqrt(bounded), R), np.minimum(np.sqrt(full), R),
            atol=1e-4)


def test_evaluate_scene_batch_matches_per_scene(tmp_path):
    """Fleet-batched evaluation == per-scene evaluation, scene by scene
    (binary metrics AND instance association), including a scene without
    GT masks (None slot) and differing frame counts."""
    pipes = []
    for i, nf in enumerate((4, 6, 5)):
        clip = make_fixture_clip(tmp_path, scene_name=f"batch-{i}",
                                 n_frames=nf, with_images=False,
                                 with_lidar=False, seed=i)
        if i != 2:  # scene 2 ships no GT: expect a None result slot
            add_instance_masks(clip)
        pipes.append(ClipPipeline(clip_path=str(clip), chunk=2))
    ev = MapEvaluator(tolerance=3, max_radius=8)
    batch = ev.evaluate_scene_batch(pipes, "cama", instances=True)
    assert batch[2] is None
    for i in (0, 1):
        single = ev.evaluate_scene_all(pipes[i], "cama")
        got = batch[i]
        assert got["frames_evaluated"] == single["frames_evaluated"] > 0
        for k in ("SRE", "precision", "recall", "f1", "n_points",
                  "gt_pixels", "instance_precision", "instance_recall",
                  "mean_purity", "n_map_instances", "n_gt_instances"):
            np.testing.assert_allclose(got[k], single[k], rtol=1e-6,
                                       err_msg=f"scene {i}: {k}")


@pytest.mark.parametrize("trial", range(3))
def test_eval_fuzz_random_gt_patterns(tmp_path, trial):
    """Chunked evaluation under randomized conditions — chunk size, frames
    with missing GT PNGs (some cameras, some frames), quick-look subsets —
    always equals the trusted per-frame reference loop."""
    rng = np.random.default_rng(100 + trial)
    nf = int(rng.integers(4, 8))
    clip = make_fixture_clip(tmp_path, scene_name=f"fuzz-{trial}",
                             n_frames=nf, with_images=False,
                             with_lidar=False, seed=trial)
    add_instance_masks(clip)
    # knock out GT randomly: whole frames and single cameras
    import glob
    import os

    pngs = sorted(glob.glob(os.path.join(str(clip), "lane_ins_*", "*.png")))
    for p in rng.choice(pngs, size=max(1, len(pngs) // 5), replace=False):
        os.remove(p)
    chunk = int(rng.integers(1, 5))
    pipe = ClipPipeline(clip_path=str(clip), chunk=chunk)
    ev = MapEvaluator(tolerance=int(rng.integers(2, 5)),
                      max_radius=int(rng.integers(6, 12)))
    frames = None
    if rng.random() < 0.5:  # quick-look subset
        fm = pipe.frame_matrices("cama")
        valid = [int(i) for i in np.asarray(fm.frame_indices)[
            np.asarray(fm.frame_valid)]]
        frames = set(rng.choice(valid, size=max(1, len(valid) // 2),
                                replace=False).tolist())
    got = ev.evaluate_scene(pipe, "cama", frames=frames)

    partials, n = [], 0
    for image_idx, vu, keep in ev._iter_frame_projections(pipe, "cama", frames):
        ids = ev._load_all_cameras(pipe, image_idx)
        if ids is None:
            continue
        p = frame_metrics(jnp.asarray(ids > 0), vu, keep,
                          ev.max_radius, ev.tolerance)
        partials.append({k: np.asarray(v) for k, v in p.items()})
        n += 1
    want = reduce_metrics(partials)
    assert got["frames_evaluated"] == n
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-6, err_msg=k)


@pytest.mark.parametrize("trial", range(2))
def test_fleet_batch_fuzz(tmp_path, trial):
    """Randomized fleets (scene count, frame counts, chunk, missing GT in
    one scene) — batch results always equal per-scene evaluation."""
    rng = np.random.default_rng(300 + trial)
    n_scenes = int(rng.integers(2, 4))
    pipes = []
    gt_scenes = set()
    for i in range(n_scenes):
        clip = make_fixture_clip(tmp_path, scene_name=f"fb{trial}-{i}",
                                 n_frames=int(rng.integers(3, 7)),
                                 with_images=False, with_lidar=False, seed=i)
        if rng.random() < 0.8 or i == 0:  # at least one scene with GT
            add_instance_masks(clip)
            gt_scenes.add(i)
        pipes.append(ClipPipeline(clip_path=str(clip),
                                  chunk=int(rng.integers(1, 4))))
    ev = MapEvaluator(tolerance=3, max_radius=8)
    instances = bool(rng.random() < 0.5)
    batch = ev.evaluate_scene_batch(pipes, "cama", instances=instances)
    for i, (p, got) in enumerate(zip(pipes, batch)):
        single = (ev.evaluate_scene_all(p, "cama") if instances
                  else ev.evaluate_scene(p, "cama"))
        if i not in gt_scenes:
            assert got is None and single["frames_evaluated"] == 0
            continue
        assert got["frames_evaluated"] == single["frames_evaluated"] > 0
        for k, v in single.items():
            np.testing.assert_allclose(got[k], v, rtol=1e-6,
                                       err_msg=f"scene {i}: {k}")


def test_frame_metrics_host_matches_device():
    """The NumPy/SciPy host backend's per-frame metrics must match the
    jitted implementation on identical inputs, both distance modes
    (chebyshev integer-exact; euclidean to float tolerance)."""
    from cama_tpu.eval.map_metrics import frame_metrics, frame_metrics_host

    rng = np.random.default_rng(11)
    C, H, W, P = 3, 48, 64, 500
    gt = rng.random((C, H, W)) < 0.03
    gt[2] = False  # one empty-mask camera exercises the empty guard
    vu = np.stack([rng.uniform(-4, H + 4, (C, P)),
                   rng.uniform(-4, W + 4, (C, P))], axis=-1).astype(np.float32)
    keep = rng.random((C, P)) < 0.7
    keep &= ((vu[..., 0] >= 0) & (vu[..., 0] < H)
             & (vu[..., 1] >= 0) & (vu[..., 1] < W))
    for distance in ("chebyshev", "euclidean"):
        want = {k: float(v) for k, v in frame_metrics(
            jnp.asarray(gt), jnp.asarray(vu), jnp.asarray(keep), 12, 4,
            distance).items()}
        got = frame_metrics_host(gt, vu, keep, 12, 4, distance)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-4,
                                       err_msg=f"{distance}:{k}")


def test_evaluate_scene_host_backend(clip):
    """End-to-end host-backend scene evaluation: no device metric programs,
    results agree with the device backend (host projections are f64, device
    f32 — mask-edge points may differ by a few, hence the loose rtol)."""
    from cama_tpu.eval.map_metrics import MapEvaluator
    from cama_tpu.pipeline import ClipPipeline

    pipe = ClipPipeline(clip_path=clip, chunk=4)
    dev = MapEvaluator(tolerance=4, max_radius=16).evaluate_scene(pipe, "cama")
    host = MapEvaluator(tolerance=4, max_radius=16,
                        backend="host").evaluate_scene(pipe, "cama")
    assert host["frames_evaluated"] == dev["frames_evaluated"]
    for k in ("SRE", "precision", "recall", "f1"):
        np.testing.assert_allclose(host[k], dev[k], rtol=0.02, atol=1e-3,
                                   err_msg=k)
    np.testing.assert_allclose(host["n_points"], dev["n_points"], rtol=0.01)


def test_evaluate_scene_all_host_backend(clip):
    """Host backend covers the FULL scene surface: metrics + association
    voting in one pass, matching the device backend (nearest assignment;
    tie pixels between equidistant instances may flip a vote, association
    is a per-instance majority — aggregates agree on the fixture)."""
    from cama_tpu.eval.map_metrics import MapEvaluator
    from cama_tpu.pipeline import ClipPipeline

    pipe = ClipPipeline(clip_path=clip, chunk=4)
    dev = MapEvaluator(tolerance=4, max_radius=16).evaluate_scene_all(
        pipe, "cama")
    host = MapEvaluator(tolerance=4, max_radius=16,
                        backend="host").evaluate_scene_all(pipe, "cama")
    assert host["frames_evaluated"] == dev["frames_evaluated"]
    for k in ("SRE", "precision", "recall", "f1"):
        np.testing.assert_allclose(host[k], dev[k], rtol=0.02, atol=1e-3,
                                   err_msg=k)
    assert host["n_map_instances"] == dev["n_map_instances"]
    assert host["n_gt_instances"] == dev["n_gt_instances"]
    for k in ("instance_precision", "instance_recall", "mean_purity"):
        np.testing.assert_allclose(host[k], dev[k], rtol=0.05, atol=0.02,
                                   err_msg=k)


@pytest.mark.parametrize("trial", range(2))
def test_host_vs_device_backend_fuzz(tmp_path, trial):
    """Randomized host-vs-device backend agreement: scipy CDT/EDT vs the
    device's iterated-dilation / bounded-EDT programs across random scene
    geometry, tolerance, radius, and distance mode.  The projections differ
    (f64 vs f32) only at mask edges, hence the loose rtol."""
    from cama_tpu.eval.map_metrics import MapEvaluator
    from cama_tpu.io.fixture import add_instance_masks, make_fixture_clip
    from cama_tpu.pipeline import ClipPipeline

    rng = np.random.default_rng(700 + trial)
    clip = make_fixture_clip(tmp_path, scene_name=f"hvd-{trial}",
                             n_frames=int(rng.integers(3, 6)),
                             with_images=False, with_lidar=False, seed=trial)
    add_instance_masks(clip)
    pipe = ClipPipeline(clip_path=str(clip), chunk=int(rng.integers(1, 5)))
    kw = dict(tolerance=int(rng.integers(2, 6)),
              max_radius=int(rng.integers(8, 18)),
              distance=["chebyshev", "euclidean"][trial % 2])
    dev = MapEvaluator(**kw).evaluate_scene(pipe, "cama")
    host = MapEvaluator(backend="host", **kw).evaluate_scene(pipe, "cama")
    assert host["frames_evaluated"] == dev["frames_evaluated"] > 0
    for k in ("SRE", "precision", "recall", "f1"):
        np.testing.assert_allclose(host[k], dev[k], rtol=0.02, atol=1e-3,
                                   err_msg=k)


def test_host_backend_assignment_validated_at_entry(tmp_path):
    """An unsupported assignment must raise even on a clip with NO GT masks
    — the old in-loop check only fired when a GT-bearing chunk existed, so
    GT-less clips returned empty results silently."""
    clip = make_fixture_clip(tmp_path, scene_name="nogt-assign", n_frames=3,
                             with_images=False, with_lidar=False)
    pipe = ClipPipeline(clip_path=str(clip), chunk=2)
    ev = MapEvaluator(backend="host")
    with pytest.raises(ValueError, match="nearest"):
        ev.evaluate_scene_instances(pipe, "cama", assignment="dilate")
    with pytest.raises(ValueError, match="nearest"):
        ev.evaluate_scene_all(pipe, "cama", assignment="dilate")


def test_host_fleet_no_source_matches_device_failure_mode(tmp_path):
    """backend='host' through the fleet API must raise like the device route
    when NO member carries the source, not return a silent all-None list."""
    clip = make_fixture_clip(tmp_path, scene_name="nosrc", n_frames=3,
                             with_images=False, with_lidar=False)
    pipes = [ClipPipeline(clip_path=str(clip), chunk=2)]
    ev = MapEvaluator(backend="host")
    with pytest.raises(ValueError, match="no member scene carries"):
        ev.evaluate_scene_batch(pipes, "not-a-source")


# ---------------- compacted evaluation (crop-first two-stage) ----------------


def test_crop_compact_project_idx_matches_full():
    """Unit: the compacted projection (evaluator two-stage, ops/geometry.
    crop_compact_project_idx) keeps exactly the full projection's kept-point
    set, in stable original order, with identical vu values; idx maps each
    survivor back to the original point axis."""
    import jax.numpy as jnp

    from cama_tpu.ops.geometry import crop_compact_project_idx, project_frames

    P, C, w, h = 257, 3, 960, 540
    pts = RNG.normal(0, 60, (P, 3)).astype(np.float32)
    valid = RNG.random(P) > 0.1
    lo = np.array([-50.0, -100.0, -200.0], np.float32)
    hi = np.array([50.0, 100.0, 200.0], np.float32)
    A = np.eye(4, dtype=np.float32)
    A[:3, 3] = [3.0, -2.0, 1.0]
    K = np.array([[500.0, 0, 480], [0, 500, 270], [0, 0, 1]], np.float32)
    B = np.stack([
        (K @ np.concatenate([np.eye(3), np.array([[dx], [0.0], [0.0]])],
                            axis=1)).astype(np.float32)
        for dx in (-1.0, 0.0, 1.0)
    ])
    vu_f, keep_f = project_frames(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(A[None]),
        jnp.asarray(B[None]), jnp.asarray(np.ones(1, bool)), w, h,
        jnp.asarray(lo), jnp.asarray(hi))
    # size k1 like _finish_overlay_mode: pow2 >= the crop-survivor count
    p4 = np.concatenate([pts, np.ones((P, 1), np.float32)], axis=1)
    xyz = p4 @ A[:3, :].T
    n_crop = int((np.all((xyz >= lo) & (xyz <= hi), axis=1) & valid).sum())
    k1 = 1
    while k1 < n_crop:
        k1 *= 2
    vu_c, keep_c, idx = crop_compact_project_idx(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(True), w, h, jnp.asarray(lo), jnp.asarray(hi), k1)
    vu_f, keep_f = np.asarray(vu_f[0]), np.asarray(keep_f[0])
    vu_c, keep_c, idx = np.asarray(vu_c), np.asarray(keep_c), np.asarray(idx)
    assert keep_c.shape == (C, k1) and idx.shape == (k1,)
    for c in range(C):
        kept_full = np.flatnonzero(keep_f[c])
        assert kept_full.size > 0  # fixture must exercise the path
        np.testing.assert_array_equal(idx[keep_c[c]], kept_full)
        np.testing.assert_array_equal(vu_c[c][keep_c[c]], vu_f[c][kept_full])


@pytest.fixture(scope="module")
def wide_clip(tmp_path_factory):
    """Long-range labels (500 m span vs the +-50x100 m crop): the counting
    pass engages the crop-first two-stage split, so the evaluator's 'auto'
    compaction is ACTIVE here (on the default fixture the crop keeps most
    points and compaction stays off)."""
    root = tmp_path_factory.mktemp("metrics_wide_fx")
    c = make_fixture_clip(root, scene_name="scene-wide-eval", n_frames=5,
                          with_images=False, with_lidar=False,
                          label_span=(-290.0, 210.0))
    add_instance_masks(c)
    return c


def test_eval_compact_engages_and_matches_full(wide_clip):
    """compact='auto' (default) vs compact='off' on a scene where the
    two-stage split engages: every metric — scalar SRE/precision/recall/F1
    AND the instance association — must be identical (the kept-point set is
    unchanged; only the per-point work shrinks)."""
    pipe = ClipPipeline(clip_path=wide_clip, chunk=4)
    pipe.overlay_mode("cama")  # counting pass sizes k1
    P = int(pipe.scene.flat["cama"].points.shape[0])
    k1 = pipe.crop_compact_k("cama")
    assert k1 is not None and k1 * 2 <= P
    full = MapEvaluator(tolerance=4, compact="off").evaluate_scene_all(
        pipe, "cama")
    comp = MapEvaluator(tolerance=4).evaluate_scene_all(pipe, "cama")
    assert full["frames_evaluated"] > 0
    for k, v in full.items():
        assert comp[k] == pytest.approx(v, rel=1e-6), k


def test_eval_compact_instances_match(wide_clip):
    """The vote path's sel gather: instance association through the
    compacted projection equals the full-P association exactly."""
    pipe = ClipPipeline(clip_path=wide_clip, chunk=4)
    pipe.overlay_mode("cama")
    full = MapEvaluator(tolerance=4, compact="off").evaluate_scene_instances(
        pipe, "cama")
    comp = MapEvaluator(tolerance=4).evaluate_scene_instances(pipe, "cama")
    assert full["frames_evaluated"] > 0
    for k, v in full.items():
        assert comp[k] == pytest.approx(v), k


def test_crop_compact_k_never_counts(wide_clip, tmp_path):
    """crop_compact_k consults only already-known sizing: a fresh pipeline
    on a clip with a counting sidecar gets k1 with ZERO counting dispatches;
    a clip that was never sized returns None (compaction stays off) rather
    than growing an eval-only process a counting compile."""
    import cama_tpu.pipeline as plmod

    # sized clip: the sidecar from the tests above serves a fresh pipeline
    pipe = ClipPipeline(clip_path=wide_clip, chunk=4)
    pipe.overlay_mode("cama")  # ensure the sidecar exists
    fresh = ClipPipeline(clip_path=wide_clip, chunk=4)
    counted = []
    orig = plmod._count_chunk

    def spy(*a, **kw):
        counted.append(1)
        return orig(*a, **kw)

    plmod._count_chunk = spy
    try:
        k1 = fresh.crop_compact_k("cama")
    finally:
        plmod._count_chunk = orig
    assert k1 == pipe.crop_compact_k("cama") and k1 is not None
    assert not counted

    # never-sized clip: None, still zero dispatches
    virgin = make_fixture_clip(tmp_path, scene_name="virgin", n_frames=3,
                               with_images=False, with_lidar=False)
    vp = ClipPipeline(clip_path=str(virgin), chunk=2)
    plmod._count_chunk = spy
    try:
        assert vp.crop_compact_k("cama") is None
    finally:
        plmod._count_chunk = orig
    assert not counted


def test_fleet_compact_matches_per_scene(tmp_path):
    """Fleet-batched evaluation through the scene-batched compaction
    (_project_compact_scenes, fleet-wide max k1) equals the full-P solo
    evaluation per member — scalars and association both."""
    pipes = []
    for i, off in enumerate((0.0, 0.7)):
        c = make_fixture_clip(tmp_path, scene_name=f"wf-{i}", n_frames=4,
                              with_images=False, with_lidar=False,
                              label_span=(-290.0, 210.0), traj_t_offset=off)
        add_instance_masks(str(c))
        p = ClipPipeline(clip_path=str(c), chunk=2)
        p.overlay_mode("cama")  # size every member -> fleet path compacts
        assert p.crop_compact_k("cama") is not None
        pipes.append(p)
    batch = MapEvaluator(tolerance=4).evaluate_scene_batch(
        pipes, "cama", instances=True)
    for p, r in zip(pipes, batch):
        solo = MapEvaluator(tolerance=4, compact="off").evaluate_scene_all(
            p, "cama")
        assert r is not None and r["frames_evaluated"] > 0
        for k, v in solo.items():
            assert r[k] == pytest.approx(v, rel=1e-6), k


@pytest.mark.parametrize("trial", range(2))
def test_compact_vs_full_fuzz(tmp_path, trial):
    """Randomized two-stage-eval parity (tools/fuzz_sweep.py widens the
    trial range): random long-range spans, trajectory offsets, GT shifts,
    and tolerances — the compacted evaluation must match full-P on every
    metric including association."""
    rng = np.random.default_rng(7100 + trial)
    c = make_fixture_clip(
        tmp_path, scene_name=f"cfz-{trial}", n_frames=3,
        with_images=False, with_lidar=False,
        label_span=(float(rng.uniform(-320, -250)),
                    float(rng.uniform(150, 260))),
        traj_t_offset=float(rng.uniform(0, 1)),
        seed=int(rng.integers(0, 2**31)))
    add_instance_masks(str(c), shift_px=float(rng.uniform(0, 6)))
    pipe = ClipPipeline(clip_path=str(c), chunk=2)
    pipe.overlay_mode("cama")  # size the clip so 'auto' can engage
    tol = int(rng.integers(2, 7))
    full = MapEvaluator(tolerance=tol, compact="off").evaluate_scene_all(
        pipe, "cama")
    comp = MapEvaluator(tolerance=tol).evaluate_scene_all(pipe, "cama")
    assert full["frames_evaluated"] > 0
    for k, v in full.items():
        assert comp[k] == pytest.approx(v, rel=1e-6), k


def test_host_backend_compact_matches_full(wide_clip):
    """backend='host' compacts unconditionally under compact='auto' (no
    compile shapes to size): identical metrics + association vs full-P."""
    pipe = ClipPipeline(clip_path=wide_clip, chunk=4)
    full = MapEvaluator(tolerance=4, backend="host",
                        compact="off").evaluate_scene_all(pipe, "cama")
    comp = MapEvaluator(tolerance=4, backend="host").evaluate_scene_all(
        pipe, "cama")
    assert full["frames_evaluated"] > 0
    for k, v in full.items():
        assert comp[k] == pytest.approx(v), k


# ---------------------------------------------------------------------------
# resident GT-field evaluation (round 5): the device steady state keeps
# distance/vote fields in HBM and runs one fused dispatch per chunk
# ---------------------------------------------------------------------------


@pytest.fixture()
def shifted_clip(clip, tmp_path):
    """Copy of the module fixture with masks shifted 9 px: every metric is
    strictly interior (0 < SRE, precision, recall < 1), so a resident-path
    divergence cannot hide behind a saturated 0/1 score."""
    import shutil

    s = str(tmp_path / "shifted-res")
    shutil.copytree(clip, s)
    add_instance_masks(s, shift_px=9.0)
    return s


def _store(ev, pipe):
    return ev._resident_fields.get(pipe)


@pytest.mark.parametrize("distance", ["chebyshev", "euclidean"])
def test_resident_scene_identical_and_warm(shifted_clip, distance):
    """resident='auto' (default) vs 'off': bit-identical scene metrics; the
    second evaluation serves from the HBM fields (no rebuild) and is still
    bit-identical."""
    pipe = ClipPipeline(clip_path=shifted_clip, chunk=4)
    ref = MapEvaluator(tolerance=4, max_radius=16, distance=distance,
                       resident="off").evaluate_scene(pipe, "cama")
    assert 0 < ref["precision"] < 1 and ref["SRE"] > 0.5  # interior regime
    ev = MapEvaluator(tolerance=4, max_radius=16, distance=distance)
    cold = ev.evaluate_scene(pipe, "cama")
    st = _store(ev, pipe)
    assert st is not None and st["bytes"] > 0 and st["chunks"]
    ids_before = {k: id(v.get("dist")) for k, v in st["chunks"].items()}
    warm = ev.evaluate_scene(pipe, "cama")
    ids_after = {k: id(v.get("dist")) for k, v in st["chunks"].items()}
    assert ids_after == ids_before  # served, not rebuilt
    for k, v in ref.items():
        assert cold[k] == v, k
        assert warm[k] == v, k


def test_resident_scene_all_identical_and_upgrade(shifted_clip):
    """evaluate_scene_all through the resident path matches resident='off'
    exactly; a metrics-only store upgrades in place (rebuild with the vote
    field) when instances are first requested."""
    pipe = ClipPipeline(clip_path=shifted_clip, chunk=4)
    ref = MapEvaluator(tolerance=4, resident="off").evaluate_scene_all(
        pipe, "cama")
    ev = MapEvaluator(tolerance=4)
    ev.evaluate_scene(pipe, "cama")  # builds WITHOUT vote fields
    st = _store(ev, pipe)
    assert all("nearest" not in e["votes"] for e in st["chunks"].values()
               if not e.get("empty"))
    combined = ev.evaluate_scene_all(pipe, "cama")
    assert all("nearest" in e["votes"] for e in st["chunks"].values()
               if not e.get("empty"))
    for k, v in ref.items():
        assert combined[k] == pytest.approx(v), k
    # and the upgraded store serves the combined pass identically too
    again = ev.evaluate_scene_all(pipe, "cama")
    for k, v in ref.items():
        assert again[k] == pytest.approx(v), k


def test_resident_budget_zero_still_identical(shifted_clip, monkeypatch):
    """Over-budget chunks run the fused build dispatch but are not retained:
    results identical, store stays empty."""
    monkeypatch.setattr(MapEvaluator, "RESIDENT_BUDGET_MB", 0.0)
    pipe = ClipPipeline(clip_path=shifted_clip, chunk=4)
    ref = MapEvaluator(tolerance=4, resident="off").evaluate_scene(
        pipe, "cama")
    ev = MapEvaluator(tolerance=4)
    out = ev.evaluate_scene(pipe, "cama")
    st = _store(ev, pipe)
    assert st is not None and st["bytes"] == 0 and not st["chunks"]
    for k, v in ref.items():
        assert out[k] == v, k


def test_resident_gt_regeneration_invalidates(shifted_clip):
    """Rewriting the GT masks on disk must invalidate the resident fields at
    the next evaluation (they key by the GT store's content key), not serve
    stale distance fields."""
    pipe = ClipPipeline(clip_path=shifted_clip, chunk=4)
    ev = MapEvaluator(tolerance=4)
    worse = ev.evaluate_scene(pipe, "cama")
    add_instance_masks(shifted_clip, shift_px=0.0)  # re-label: aligned masks
    good = ev.evaluate_scene(pipe, "cama")
    assert good["SRE"] < worse["SRE"] - 0.5
    ref = MapEvaluator(tolerance=4, resident="off").evaluate_scene(
        pipe, "cama")
    for k, v in ref.items():
        assert good[k] == v, k


def test_resident_respects_compact_lens(shifted_clip):
    """compact='auto' with the crop-first k1 engaged inside the fused
    dispatch: identical to the uncompacted resident path and to
    resident='off'."""
    pipe = ClipPipeline(clip_path=shifted_clip, chunk=4)
    pipe.overlay_mode("cama")  # size the clip so 'auto' can engage
    ref = MapEvaluator(tolerance=4, resident="off",
                       compact="off").evaluate_scene_all(pipe, "cama")
    comp = MapEvaluator(tolerance=4).evaluate_scene_all(pipe, "cama")
    for k, v in ref.items():
        assert comp[k] == pytest.approx(v, rel=1e-6), k


def test_count_raster_regroup_exactness():
    """frame_metrics' point sums run through a scatter-add COUNT raster
    (sre_sum == sum over pixels of count*dist) instead of per-point field
    gathers — pin the regrouping claims from _frame_metrics_from_field's
    docstring: chebyshev sums are integer-valued so the regroup is
    BIT-IDENTICAL to the per-point sum; euclidean agrees to 1e-6 relative
    (and the integer-valued hit/point counts exactly)."""
    from cama_tpu.eval.map_metrics import _dist_field

    rng = np.random.default_rng(7)
    C, H, W, P = 2, 40, 56, 4000  # P >> H*W/10: real per-pixel counts > 1
    gt = rng.random((C, H, W)) < 0.05
    gt[1, :, :28] = False  # asymmetric content
    vu = np.stack([rng.uniform(0, H, (C, P)),
                   rng.uniform(0, W, (C, P))], -1).astype(np.float32)
    keep = rng.random((C, P)) < 0.8
    max_radius, tolerance = 12, 4
    rounds = max(max_radius, tolerance + 1)
    for distance in ("chebyshev", "euclidean"):
        got = {k: float(v) for k, v in frame_metrics(
            jnp.asarray(gt), jnp.asarray(vu), jnp.asarray(keep),
            max_radius, tolerance, distance).items()}
        # per-point oracle: gather the SAME device field at every kept point
        field = np.asarray(_dist_field(jnp.asarray(gt), rounds, distance))
        vi = np.clip(vu[..., 0].astype(np.int32), 0, H - 1)
        ui = np.clip(vu[..., 1].astype(np.int32), 0, W - 1)
        kf = keep.astype(np.float64)
        d_pts = np.stack([field[c, vi[c], ui[c]] for c in range(C)])
        if distance == "euclidean":
            dist = np.minimum(np.sqrt(d_pts.astype(np.float64)),
                              float(max_radius))
            hit = d_pts <= float(tolerance) ** 2
        else:
            dist = np.minimum(d_pts, max_radius).astype(np.float64)
            hit = d_pts <= tolerance
        want_sre = float((dist * kf).sum())
        assert got["n_points"] == float(kf.sum())
        assert got["n_hit"] == float((hit * kf).sum())
        if distance == "chebyshev":
            assert got["sre_sum"] == want_sre, (got["sre_sum"], want_sre)
        else:
            np.testing.assert_allclose(got["sre_sum"], want_sre, rtol=1e-6)
