"""Map-annotation quality metrics: SRE + precision / recall / F1.

The reference README names these for the camav2 branch (release notes 2.1.0,
/root/reference/README.md:18-20) but the code is not in the snapshot
(SURVEY.md §2.3), so this module implements them from the CAMA / CAMAv2
papers' evaluation protocol: reproject the 3-D map annotation into every
camera image and compare against 2-D ground-truth lane segmentation masks
(the clip format's `lane_ins_{camera}/<ms>.png` instance images the reference
already reads, cama/reproject.py:217-226):

  * SRE (semantic reprojection error): mean distance in pixels from each
    reprojected map point to the nearest ground-truth mask pixel, capped at
    `max_radius` (points farther than the cap contribute the cap).
  * precision: fraction of reprojected points within `tolerance` px of the
    mask.
  * recall: fraction of ground-truth mask pixels within `tolerance` px of a
    reprojected point.
  * F1 = 2PR / (P + R).

TPU-native formulation — no distance transform is materialized.  Distance to
a mask is computed by iterated 3x3 max-dilation:

    dist(p) = sum_{d=0}^{D-1} [ p not in dilate^d(mask) ]

which is the Chebyshev (chessboard) distance capped at D, an upper-bound-tight
analogue of the EDT that is pure dense VPU work + point gathers.  Reductions
over frames are plain sums, so the whole evaluation psums cleanly across a
frame-sharded mesh.
"""
from __future__ import annotations

from functools import partial

import os

import numpy as np

import jax
import jax.numpy as jnp


@jax.jit
def dilate3x3(mask):
    """One round of 8-neighborhood binary dilation ([..., H, W] bool)."""
    m = mask
    n = jnp.pad(m, [(0, 0)] * (m.ndim - 2) + [(1, 1), (1, 1)], constant_values=False)
    out = m
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            out = out | n[..., dy:dy + m.shape[-2], dx:dx + m.shape[-1]]
    return out


_EDT_INF = 1e4  # farther than any image diagonal; squared stays finite in f32


def _nearest_dist_rows(mask):
    """[..., H, W] bool -> float32 distance along axis -2 to the nearest True
    in the same column (1e4 where the column is empty)."""
    m = jnp.moveaxis(mask, -2, 0)  # [H, ..., W]
    # derive the scan carry from the mask so its varying-axis type matches
    # under shard_map (a constant init is 'unvarying' and scan rejects the
    # carry mismatch when the rows vary over a mesh axis)
    init = jnp.full(m.shape[1:], _EDT_INF, jnp.float32) + 0.0 * m[0].astype(jnp.float32)

    def step(carry, row):
        d = jnp.where(row, 0.0, carry + 1.0)
        return d, d

    _, fwd = jax.lax.scan(step, init, m)
    _, bwd = jax.lax.scan(step, init, m, reverse=True)
    return jnp.moveaxis(jnp.minimum(fwd, bwd), 0, -2)


@partial(jax.jit, static_argnames=("radius",))
def squared_edt_within(mask, radius):
    """Squared Euclidean distance transform, EXACT wherever the true distance
    is <= radius (farther pixels carry overestimates >= radius^2, so
    `min(sqrt(d2), radius)` equals the capped exact distance everywhere).

    Same column scan as squared_edt, but the row reduction only considers
    source columns within +-radius — O(H*W*radius) instead of O(H*W^2).
    Every consumer of the transform caps at max_radius/tolerance, which is
    tens of pixels while W is ~10^3 (see _frame_metrics_euclidean)."""
    D0 = _nearest_dist_rows(mask) ** 2
    best = D0
    for dx in range(1, radius + 1):
        for s in (dx, -dx):
            best = jnp.minimum(best, _shift_cols(D0, s, _EDT_INF ** 2)
                               + float(dx * dx))
    return best.astype(jnp.float32)


@partial(jax.jit, static_argnames=("block",))
def squared_edt(mask, block=8):
    """Exact squared Euclidean distance transform ([..., H, W] bool -> f32).

    Two separable passes: (1) nearest-True scan along each column (exact,
    because min_y' (y-y')^2 is attained at the nearest y'), (2) a min-plus
    reduction along rows — D[y,x] = min_x' ((x-x')^2 + d_col[y,x']^2) —
    evaluated in row blocks so the [W, W] parabola table broadcasts in
    bounded memory.  Matches scipy.ndimage.distance_transform_edt**2 of ~mask
    (see tests/test_map_metrics.py)."""
    H, W = mask.shape[-2], mask.shape[-1]
    D0 = _nearest_dist_rows(mask) ** 2
    x = jnp.arange(W, dtype=jnp.float32)
    d2 = (x[:, None] - x[None, :]) ** 2  # [W(out), W(src)]
    flat = D0.reshape((-1, W))
    pad = (-flat.shape[0]) % block
    flat = jnp.pad(flat, ((0, pad), (0, 0)))

    def one_block(rows):  # [block, W]
        return jnp.min(rows[:, None, :] + d2[None], axis=-1)

    out = jax.lax.map(one_block, flat.reshape((-1, block, W)))
    out = out.reshape((-1, W))[: flat.shape[0] - pad]
    return out.reshape(mask.shape).astype(jnp.float32)


@partial(jax.jit, static_argnames=("max_radius", "tolerance", "distance"))
def frame_metrics(gt_mask, vu, keep, max_radius, tolerance, distance="chebyshev"):
    """Per-(frame-)camera metric partials.

    Args:
        gt_mask: [C, H, W] bool ground-truth mask (already at output size)
        vu:      [C, P, 2] float32 projected (v, u)
        keep:    [C, P] bool
        max_radius: int — SRE distance cap (dilation rounds)
        tolerance:  int — precision/recall hit radius
        distance: 'chebyshev' (iterated 8-neighborhood dilation, cheapest) or
            'euclidean' (exact separable squared-EDT — the papers' pixel
            distance; quantifies the Chebyshev approximation)

    Returns dict of scalars: sre_sum, n_points, n_hit (precision numerator),
    gt_total, gt_covered (recall terms).
    """
    return _frame_metrics_impl(gt_mask, vu, keep, max_radius, tolerance,
                               distance)


@partial(jax.jit, static_argnames=("max_radius", "tolerance", "distance"))
def frame_metrics_chunk(gt_mask, vu, keep, fv, max_radius, tolerance,
                        distance="chebyshev"):
    """Batched frame_metrics over a whole projection chunk in ONE dispatch.

    Args mirror frame_metrics with a leading frame axis plus a validity
    weight:
        gt_mask: [K, C, H, W] bool (zeros for rows without GT)
        vu/keep: [K, C, P, 2] / [K, C, P]
        fv:      [K] float32 — 1.0 where the row is a real evaluated frame,
                 0.0 padding (invalid frame / GT masks absent)

    Returns frame_metrics' dict with each entry summed over the valid rows.
    Rationale: the per-frame eager call costs one device dispatch per frame
    (~30 ms through this environment's tunneled runtime — larger than the
    metric compute itself); batching over the chunk amortizes it K-fold and
    is exactly how sharded_map_metrics already shapes the computation.
    """
    p = frame_metrics_rows(gt_mask, vu, keep, max_radius, tolerance, distance)
    z = fv.astype(jnp.float32)
    return {k2: jnp.sum(v * z) for k2, v in p.items()}


@partial(jax.jit, static_argnames=("max_radius", "tolerance", "distance"))
def frame_metrics_rows(gt_mask, vu, keep, max_radius, tolerance,
                       distance="chebyshev"):
    """Per-ROW frame_metrics over a batch: [K, ...] inputs -> dict of [K]
    partials (no reduction).  The multi-scene batch path groups rows by
    scene on the host, so it needs the per-row values; frame_metrics_chunk
    is this plus an fv-weighted sum."""
    return jax.vmap(
        lambda g, v, k: _frame_metrics_impl(g, v, k, max_radius, tolerance,
                                            distance)
    )(gt_mask, vu, keep)


def _unpack_bits(packed, width):
    """Device-side np.packbits inverse: [..., Wp] uint8 (big-endian bit
    order) -> [..., width] bool, slicing off packbits' zero padding."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    out = bits.reshape(packed.shape[:-1] + (-1,))
    return out[..., :width].astype(bool)


@partial(jax.jit, static_argnames=("width", "max_radius", "tolerance",
                                   "distance"))
def frame_metrics_chunk_packed(gt_packed, vu, keep, fv, width, max_radius,
                               tolerance, distance="chebyshev"):
    """frame_metrics_chunk fed by host-bitpacked masks ([K, C, H, W/8] uint8
    via np.packbits(axis=-1)): 8x less host->device traffic, which is the
    binding cost when the device link is a tunnel (BENCH.md)."""
    gt = _unpack_bits(gt_packed, width)
    return frame_metrics_chunk(gt, vu, keep, fv, max_radius, tolerance,
                               distance)


@partial(jax.jit, static_argnames=("width", "max_radius", "tolerance",
                                   "distance"))
def frame_metrics_rows_packed(gt_packed, vu, keep, width, max_radius,
                              tolerance, distance="chebyshev"):
    """frame_metrics_rows fed by host-bitpacked masks (see
    frame_metrics_chunk_packed): [K, ...] -> dict of [K] per-row partials."""
    gt = _unpack_bits(gt_packed, width)
    return frame_metrics_rows(gt, vu, keep, max_radius, tolerance, distance)


@partial(jax.jit, static_argnames=("width", "height", "k1"))
def _project_compact_chunk_eval(points, valid, A, B, fv, width, height,
                                lo, hi, k1):
    """Chunked projection with crop-first compaction (the overlay two-stage
    kernel's stage 1+2, ops/geometry.crop_compact_project_idx): per frame,
    points inside the camera-independent crop box compact to k1 survivors
    BEFORE the six per-camera projections, so the downstream per-point
    metric work (distance gathers, point-raster scatters, vote gathers —
    all O(points)) runs over k1 instead of P.  keep requires the crop box,
    so the kept-point set — and therefore every metric — is identical to
    the full-P projection's.

    Returns (vu [K, C, k1, 2], keep [K, C, k1], sel [K, k1] int32); sel
    indexes the original point axis so callers compact any per-point array
    (e.g. instance ids for association votes) with one gather."""
    from cama_tpu.ops.geometry import crop_compact_project_idx

    def per_frame(args):
        Af, Bf, f = args
        return crop_compact_project_idx(points, valid, Af, Bf, f,
                                        width, height, lo, hi, k1)

    return jax.lax.map(per_frame, (A, B, fv))


@partial(jax.jit, static_argnames=("width", "height", "k1"))
def _project_compact_scenes(points, valid, A, B, fv, width, height,
                            lo, hi, k1):
    """Scene-batched _project_compact_chunk_eval: [S, ...] stacked tensors
    -> (vu [S, K, C, k1, 2], keep [S, K, C, k1], sel [S, K, k1]) in one
    dispatch.  k1 is the fleet-wide maximum of the members' crop-survivor
    sizings (each member's own k1 bounds its survivors, so the max is safe
    for every scene; padding points are invalid and never selected)."""
    from cama_tpu.ops.geometry import crop_compact_project_idx

    def one_scene(p, v, a, b, f):
        def per_frame(args):
            Af, Bf, ff = args
            return crop_compact_project_idx(p, v, Af, Bf, ff,
                                            width, height, lo, hi, k1)

        return jax.lax.map(per_frame, (a, b, f))

    return jax.vmap(one_scene)(points, valid, A, B, fv)


@partial(jax.jit, static_argnames=("width", "height"))
def _project_scenes(points, valid, A, B, fv, width, height, lo, hi):
    """Scene-batched projection: [S, ...] stacked tensors -> vu [S, K, C, P,
    2], keep [S, K, C, P] in one dispatch (the metric analogue of
    pipeline._overlay_chunk_batched)."""
    from cama_tpu.ops.geometry import project_frames

    return jax.vmap(
        lambda p, v, a, b, f: project_frames(p, v, a, b, f, width, height,
                                             lo, hi)
    )(points, valid, A, B, fv)


@partial(jax.jit, static_argnames=("shape",))
def _scatter_ids(idx, vals, shape):
    """Rebuild a dense id stack from COO (flat index, value) pairs; padding
    entries carry idx == prod(shape) and are dropped."""
    size = 1
    for s in shape:
        size *= s
    buf = jnp.zeros((size,), vals.dtype)
    buf = buf.at[idx].set(vals, mode="drop")
    return buf.reshape(shape)


def device_ids(ids_b):
    """Upload a chunk's GT instance-id stack link-efficiently.

    Lane-geometry GT typically paints a few percent of pixels, and the
    host->device link (not device compute) bounds metric throughput on
    tunneled runtimes — so sparse COO upload (6 B/nonzero: int32 index +
    uint16 id, scattered on device) wins whenever it moves fewer bytes than
    the dense uint16 stack; otherwise upload dense.  COO budgets round up to
    powers of two so the scatter compiles once per bucket, not per frame."""
    ids_b = np.ascontiguousarray(ids_b)
    if ids_b.dtype != np.uint16:
        if ids_b.max(initial=0) >= 65536:  # not an assert: -O must not let
            # out-of-range ids wrap into other instances' votes silently
            raise ValueError("instance ids exceed uint16")
        ids_b = ids_b.astype(np.uint16)
    flat = np.flatnonzero(ids_b)
    # compare what each path actually moves: the COO budget is padded to a
    # power of two (>= 1024) for compile reuse, so decide on the padded size
    budget = 1 << max(10, (len(flat) - 1).bit_length() if len(flat) else 0)
    if 6 * budget < 2 * ids_b.size:
        idx = np.full((budget,), ids_b.size, np.int32)
        vals = np.zeros((budget,), np.uint16)
        idx[: len(flat)] = flat
        vals[: len(flat)] = ids_b.flat[flat]
        return _scatter_ids(jnp.asarray(idx), jnp.asarray(vals), ids_b.shape)
    return jnp.asarray(ids_b)


def _dist_rounds(max_radius, tolerance, distance):
    """Radius the GT distance field must be exact within, per metric family
    (chebyshev has always run tolerance+1 rounds so the dilation geometry
    serves both the capped distance sum and the hit test; euclidean's
    squared-EDT only needs exactness to the larger of the two caps)."""
    if distance == "euclidean":
        return max(max_radius, tolerance)
    return max(max_radius, tolerance + 1)


def _dist_field(gt_mask, rounds, distance):
    """GT distance field the per-point metric gathers sample — a pure
    function of the masks + caps, so the resident evaluation path computes
    it ONCE per chunk and keeps it in HBM across evaluations
    (MapEvaluator._eval_scene_resident).

    chebyshev: per-pixel not-covered count over `rounds` dilation passes
    (dist[p] = min(chessboard distance to mask, rounds)) — gathering the
    evolving mask at every round instead costs `rounds` random gathers per
    point, measured ~10x the dense dilation itself on TPU at production
    shapes.  uint8: rounds < 256 holds for any sane pixel cap and quarters
    the resident bytes vs an f32 field.
    euclidean: squared_edt_within's output (f32; overestimates beyond
    `rounds` never change a capped consumer — see squared_edt_within)."""
    if distance == "euclidean":
        return squared_edt_within(gt_mask, rounds)
    assert rounds < 256, "distance cap exceeds the uint8 resident field"
    dist_map = jnp.zeros(gt_mask.shape, jnp.uint8)
    m = gt_mask
    for _ in range(rounds):
        dist_map = dist_map + (~m).astype(jnp.uint8)
        m = dilate3x3(m)
    return dist_map


def _vote_field(gt_ids, tolerance, assignment):
    """Per-pixel GT instance vote map (0 = no instance within tolerance) —
    instance_votes_chunk's pre-gather state, split out so the resident path
    can keep it device-resident (it too is a pure function of the GT ids +
    tolerance)."""
    ids = gt_ids.astype(jnp.int32)
    if assignment == "nearest":
        d2, nid = nearest_id_within(ids, int(tolerance))
        vm = jnp.where(d2 <= float(tolerance) ** 2, nid, 0)
    else:
        vm = dilate_ids(ids, tolerance)
    return vm.astype(gt_ids.dtype)


def _frame_metrics_from_field(gt_mask, dist_field, vu, keep, max_radius,
                              tolerance, distance):
    """One frame's metric partials given a precomputed GT distance field
    (chebyshev uint8 count or euclidean f32 squared-EDT — _dist_field).
    This is the consume half of _frame_metrics_impl; the resident path
    vmaps it over a chunk against HBM-resident fields.

    Point sums go through a scatter-add COUNT raster, not per-point
    gathers: sre_sum == Σ_pixels count·dist because every kept point at a
    pixel contributes that pixel's field value.  The 3.1 M random gathers
    per chunk this replaces were the serve dispatch's single largest cost
    (~41 ms vs ~2 ms of dense multiply-reduce at production shapes), and
    the count raster doubles as the recall point-raster, deleting the
    second scatter.  For chebyshev every sum is integer-valued (counts ×
    integer capped distances, magnitudes ≪ 2^24), so f32 accumulation is
    EXACT and the regrouping is bit-identical to the per-point sum.  For
    euclidean, sre_sum terms are irrational (sqrt) and count·value differs
    from value-added-count-times in the last ulp — within 1e-6 relative of
    the per-point path (tests pin both statements)."""
    C, H, W = gt_mask.shape
    vi, ui = _clip_pixels(vu, H, W)
    cnt = _point_count_raster(vi, ui, keep, H, W)  # [C, H, W] f32
    pr = cnt > 0
    if distance == "euclidean":
        dist = jnp.minimum(jnp.sqrt(dist_field), float(max_radius))
        hit = dist_field <= float(tolerance) ** 2
        radius = max(max_radius, tolerance)
        covered = gt_mask & (squared_edt_within(pr, radius)
                             <= float(tolerance) ** 2)
    else:
        # the uint8 field caps at rounds >= tolerance+1, so the <= tolerance
        # hit test is unaffected by the cap
        dist = jnp.minimum(dist_field, jnp.uint8(max_radius)
                           ).astype(jnp.float32)
        hit = dist_field <= tolerance
        # recall: dilate the projected point raster by `tolerance`,
        # intersect gt
        for _ in range(tolerance):
            pr = dilate3x3(pr)
        covered = gt_mask & pr
    return {
        "sre_sum": jnp.sum(cnt * dist),
        "n_points": jnp.sum(cnt),
        "n_hit": jnp.sum(cnt * hit.astype(jnp.float32)),
        "gt_total": jnp.sum(gt_mask).astype(jnp.float32),
        "gt_covered": jnp.sum(covered).astype(jnp.float32),
    }


def _frame_metrics_impl(gt_mask, vu, keep, max_radius, tolerance, distance):
    rounds = _dist_rounds(max_radius, tolerance, distance)
    field = _dist_field(gt_mask, rounds, distance)
    return _frame_metrics_from_field(gt_mask, field, vu, keep, max_radius,
                                     tolerance, distance)


def _clip_pixels(vu, H, W):
    """[..., P, 2] float (v, u) -> integer pixel indices clipped into image."""
    vi = jnp.clip(vu[..., 0].astype(jnp.int32), 0, H - 1)
    ui = jnp.clip(vu[..., 1].astype(jnp.int32), 0, W - 1)
    return vi, ui


def _gather_at(img, vi, ui):
    """Per-camera gather: img [C, H, W] at (vi, ui) [C, P] -> [C, P]."""
    return jax.vmap(lambda m, v, u: m[v, u])(img, vi, ui)


def _point_count_raster(vi, ui, keep, H, W):
    """Scatter-add kept points into a [C, H, W] f32 count raster.  f32 is
    exact for any realistic count (< 2^24 points per pixel); one add-scatter
    feeds every point-weighted metric sum AND (count > 0) the recall
    raster."""

    def one(vi_c, ui_c, keep_c):
        buf = jnp.zeros((H * W + 1,), jnp.float32)
        idx = jnp.where(keep_c, vi_c * W + ui_c, H * W)
        buf = buf.at[idx].add(1.0, mode="drop")
        return buf[:-1].reshape(H, W)

    return jax.vmap(one)(vi, ui, keep)


def frame_metrics_host(gt_mask, vu, keep, max_radius, tolerance,
                       distance="chebyshev"):
    """NumPy/SciPy mirror of frame_metrics — the evaluation host backend.

    Same semantics as the device implementation: 'chebyshev' uses the exact
    chessboard distance transform (scipy distance_transform_cdt == the
    device's iterated 8-neighborhood dilation count, integer-exact) capped
    at rounds=max(max_radius, tolerance+1); 'euclidean' uses the exact EDT.
    Exists so evaluation runs on accelerator-less hosts and in fresh
    processes without waiting on the minutes-scale remote compile of the
    metric programs (MapEvaluator(backend='host'))."""
    from scipy import ndimage

    gt_mask = np.asarray(gt_mask, bool)
    C, H, W = gt_mask.shape
    vi = np.clip(np.asarray(vu)[..., 0].astype(np.int32), 0, H - 1)
    ui = np.clip(np.asarray(vu)[..., 1].astype(np.int32), 0, W - 1)
    keep = np.asarray(keep, bool)
    kf = keep.astype(np.float32)

    # projected-point raster per camera (for recall)
    pr = np.zeros((C, H, W), bool)
    for c in range(C):
        pr[c, vi[c][keep[c]], ui[c][keep[c]]] = True

    if distance == "euclidean":
        def dist_to(mask_c):  # float distance to nearest True, inf if none
            if not mask_c.any():
                return np.full((H, W), np.inf, np.float32)
            return ndimage.distance_transform_edt(~mask_c).astype(np.float32)

        sre_sum = n_hit = 0.0
        gt_covered = 0.0
        for c in range(C):
            d = dist_to(gt_mask[c])
            d_pts = d[vi[c], ui[c]]
            sre_sum += float(np.sum(np.minimum(d_pts, float(max_radius)) * kf[c]))
            n_hit += float(np.sum((d_pts <= float(tolerance)) * kf[c]))
            dp = dist_to(pr[c])
            gt_covered += float(np.sum(gt_mask[c] & (dp <= float(tolerance))))
    else:
        rounds = max(max_radius, tolerance + 1)

        def cheb_to(mask_c, cap):  # capped chessboard distance to True
            if not mask_c.any():
                return np.full((H, W), cap, np.int32)
            d = ndimage.distance_transform_cdt(~mask_c, metric="chessboard")
            return np.minimum(d, cap).astype(np.int32)

        sre_sum = n_hit = 0.0
        gt_covered = 0.0
        for c in range(C):
            d = cheb_to(gt_mask[c], rounds)
            d_pts = d[vi[c], ui[c]]
            sre_sum += float(np.sum(np.minimum(d_pts, max_radius) * kf[c]))
            n_hit += float(np.sum((d_pts <= tolerance) * kf[c]))
            dp = cheb_to(pr[c], tolerance + 1)
            gt_covered += float(np.sum(gt_mask[c] & (dp <= tolerance)))

    return {
        "sre_sum": sre_sum,
        "n_points": float(kf.sum()),
        "n_hit": n_hit,
        "gt_total": float(gt_mask.sum()),
        "gt_covered": gt_covered,
    }


def instance_votes_host(gt_ids, vu, keep, tolerance):
    """Host mirror of instance_votes_chunk for ONE frame with the 'nearest'
    assignment: [C, H, W] instance ids -> [C, P] vote ids (0 = no instance
    within tolerance).  scipy's exact Euclidean feature transform
    (return_indices) IS the nearest-instance assignment; tie-breaking
    between exactly equidistant instances may pick a different (still
    deterministic) winner than the device kernel on the tie set itself —
    association is a majority vote per map instance, so aggregate metrics
    agree."""
    from scipy import ndimage

    ids = np.asarray(gt_ids)
    C, H, W = ids.shape
    vi = np.clip(np.asarray(vu)[..., 0].astype(np.int32), 0, H - 1)
    ui = np.clip(np.asarray(vu)[..., 1].astype(np.int32), 0, W - 1)
    votes = np.zeros(vi.shape, np.int32)
    for c in range(C):
        if not (ids[c] > 0).any():
            continue
        d, (iy, ix) = ndimage.distance_transform_edt(
            ids[c] == 0, return_indices=True)
        vote_map = np.where(d <= float(tolerance), ids[c][iy, ix], 0)
        votes[c] = vote_map[vi[c], ui[c]].astype(np.int32)
    return votes


# ---------------------------------------------------------------------------
# instance-level association metrics (lane_ins ids, not just binary masks)
# ---------------------------------------------------------------------------


def _nearest_rows_id(ids):
    """[..., H, W] int instance image -> (dist, id) of the nearest nonzero
    pixel along axis -2 in the same column (dist 1e4 / id 0 where the column
    is empty).  Ties between the upper and lower neighbor go to the upper
    (forward-scan) one."""
    m = jnp.moveaxis(ids, -2, 0)  # [H, ..., W]
    fg0 = m[0] > 0
    # derive the scan carry from the data (shard_map varying-axis typing —
    # see _nearest_dist_rows)
    init_d = jnp.full(m.shape[1:], _EDT_INF, jnp.float32) + 0.0 * fg0.astype(jnp.float32)
    init_i = jnp.zeros(m.shape[1:], m.dtype) + 0 * m[0]

    def step(carry, row):
        d, i = carry
        fg = row > 0
        nd = jnp.where(fg, 0.0, d + 1.0)
        ni = jnp.where(fg, row, i)
        return (nd, ni), (nd, ni)

    _, (fd, fi) = jax.lax.scan(step, (init_d, init_i), m)
    _, (bd, bi) = jax.lax.scan(step, (init_d, init_i), m, reverse=True)
    take_f = fd <= bd
    d = jnp.where(take_f, fd, bd)
    i = jnp.where(take_f, fi, bi)
    return jnp.moveaxis(d, 0, -2), jnp.moveaxis(i, 0, -2)


@partial(jax.jit, static_argnames=("block",))
def nearest_id_edt(ids, block=8):
    """Exact Euclidean feature transform of an instance-id image:
    ([..., H, W] int, 0 = background) -> (d2 [..., H, W] f32 squared distance
    to the nearest labeled pixel, id [..., H, W] of that pixel).

    Same separable construction as squared_edt, but the row-blocked min-plus
    reduction takes an argmin and gathers the column pass's ids through it —
    so every pixel knows WHICH instance is nearest, not just how far.  Ties
    resolve deterministically (smaller source column; upper row within a
    column)."""
    W = ids.shape[-1]
    D0, I0 = _nearest_rows_id(ids)
    D0 = D0 ** 2
    x = jnp.arange(W, dtype=jnp.float32)
    d2 = (x[:, None] - x[None, :]) ** 2  # [W(out), W(src)]
    flat_d = D0.reshape((-1, W))
    flat_i = I0.reshape((-1, W))
    pad = (-flat_d.shape[0]) % block
    flat_d = jnp.pad(flat_d, ((0, pad), (0, 0)))
    flat_i = jnp.pad(flat_i, ((0, pad), (0, 0)))

    def one_block(args):  # ([block, W] dists, [block, W] ids)
        rows_d, rows_i = args
        tot = rows_d[:, None, :] + d2[None]  # [block, W(out), W(src)]
        src = jnp.argmin(tot, axis=-1)  # first minimum -> smallest column
        best = jnp.take_along_axis(tot, src[..., None], axis=-1)[..., 0]
        bid = jnp.take_along_axis(rows_i, src, axis=-1)
        return best, bid

    out_d, out_i = jax.lax.map(
        one_block, (flat_d.reshape((-1, block, W)), flat_i.reshape((-1, block, W))))
    n = D0.reshape((-1, W)).shape[0]
    out_d = out_d.reshape((-1, W))[:n].reshape(ids.shape).astype(jnp.float32)
    out_i = out_i.reshape((-1, W))[:n].reshape(ids.shape)
    return out_d, out_i


def _shift_cols(a, dx, fill):
    """a[..., x] -> a[..., x + dx], vacated columns filled with `fill`."""
    if dx == 0:
        return a
    pad = jnp.full_like(a[..., :abs(dx)], fill)
    if dx > 0:
        return jnp.concatenate([a[..., dx:], pad], axis=-1)
    return jnp.concatenate([pad, a[..., :dx]], axis=-1)


@partial(jax.jit, static_argnames=("radius",))
def nearest_id_within(ids, radius):
    """(d2, id) of the nearest labeled pixel — EXACT for every pixel whose
    true distance is <= radius; farther pixels may carry overestimates.

    Same column pass as nearest_id_edt, but the row reduction only scans
    source columns within +-radius: any candidate with total d2 <= radius^2
    necessarily has |dx| <= radius, so inside the tolerance mask the result
    (including the smaller-source-column tie-break, enforced by strict-<
    updates in ascending dx order) is identical to the full transform —
    tests pin this.  O(H*W*radius) instead of the full EDT's O(H*W^2) row
    reduction: the association path only ever masks to d2 <= tolerance^2,
    and tolerance is a few pixels while W is ~10^3."""
    D0, I0 = _nearest_rows_id(ids)
    D0 = D0 ** 2
    best_d, best_i = None, None
    for dx in range(-radius, radius + 1):
        cand_d = _shift_cols(D0, dx, _EDT_INF ** 2) + float(dx * dx)
        cand_i = _shift_cols(I0, dx, 0)
        if best_d is None:
            best_d, best_i = cand_d, cand_i
        else:
            take = cand_d < best_d  # strict: smaller source column wins ties
            best_d = jnp.where(take, cand_d, best_d)
            best_i = jnp.where(take, cand_i, best_i)
    return best_d, best_i


def dilate_ids(ids, rounds):
    """Max-dilate an instance-id image (0 = background) with the SAME
    8-neighborhood dilate3x3 uses, so instance voting and the binary
    precision/recall metrics share one tolerance geometry (Chebyshev disc).
    Where two instances are within 2*rounds px of each other the larger id
    wins in the overlap — kept for the 'chebyshev' association mode;
    nearest_id_edt is the exact assignment frame_instance_pairs now uses."""
    out = jnp.asarray(ids)
    for _ in range(rounds):
        n = jnp.pad(out, [(0, 0)] * (out.ndim - 2) + [(1, 1), (1, 1)])
        m = out
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                if dy == 1 and dx == 1:
                    continue
                m = jnp.maximum(
                    m, n[..., dy:dy + out.shape[-2], dx:dx + out.shape[-1]]
                )
        out = m
    return out


@partial(jax.jit, static_argnames=("tolerance", "assignment"))
def instance_votes_chunk(gt_ids, vu, keep, tolerance, assignment="nearest"):
    """Device half of association voting, batched over a projection chunk:
    for each kept projected point, the GT instance id it votes for (0 = no
    GT instance within `tolerance` px).

    gt_ids: [K, C, H, W] int (0 = background); vu/keep: [K, C, P, 2]/[K, C, P]
    Returns [K, C, P] int32 vote ids (host filters by keep + row validity).
    One dispatch per chunk — the eager per-frame path paid a full EDT
    dispatch per frame.
    """
    H, W = gt_ids.shape[-2], gt_ids.shape[-1]
    vi, ui = _clip_pixels(vu, H, W)
    ids = gt_ids.astype(jnp.int32)
    if assignment == "nearest":
        d2, nid = nearest_id_within(ids, int(tolerance))
        gt_d = jnp.where(d2 <= float(tolerance) ** 2, nid, 0)
    else:
        gt_d = dilate_ids(ids, tolerance)
    votes = jax.vmap(_gather_at)(gt_d, vi, ui)  # [K, C, P]
    # votes are ids drawn from gt_ids, so they fit its dtype — returning in
    # it halves the device->host bytes for the common uint16 GT stacks
    return votes.astype(gt_ids.dtype)


@partial(jax.jit, static_argnames=("max_radius", "tolerance", "distance",
                                   "assignment"))
def _metrics_and_votes_chunk(gt_ids, vu, keep, fv, max_radius, tolerance,
                             distance, assignment):
    """Fused chunk dispatch for evaluate_scene_all: binary SRE/P/R partials
    and instance votes from one traced program (gt ids are uploaded once and
    the two metric families share it on device)."""
    p = frame_metrics_chunk(gt_ids > 0, vu, keep, fv, max_radius, tolerance,
                            distance)
    votes = instance_votes_chunk(gt_ids, vu, keep, tolerance, assignment)
    return p, votes


# ---------------------------------------------------------------------------
# fused resident-field evaluation (round 5): projection + metric gathers in
# ONE dispatch per chunk, sampling GT-derived distance/vote fields that are
# computed once and stay device-resident across evaluations
# ---------------------------------------------------------------------------


def _eval_core(points, valid, A, B, fvb, dist_field, gt_mask, vote_field,
               width, height, lo, hi, k1, max_radius, tolerance, distance):
    """Shared trace of the fused evaluation chunk: project (crop-compacted
    to k1 when engaged), then sample the GT fields.  fvb [K] bool gates BOTH
    the projection's frame_valid and the metric row weights — a row is live
    only when its frame is valid AND its GT masks exist, exactly the rows
    the chunked path weighted by fv.

    Returns (partials dict of scalars, votes [K, C, P'] or None,
    keep [K, C, P'], sel [K, P'] int32 or None)."""
    from cama_tpu.ops.geometry import crop_compact_project_idx, project_frames

    if k1 is not None:
        def per_frame(args):
            Af, Bf, f = args
            return crop_compact_project_idx(points, valid, Af, Bf, f,
                                            width, height, lo, hi, k1)

        vu, keep, sel = jax.lax.map(per_frame, (A, B, fvb))
    else:
        vu, keep = project_frames(points, valid, A, B, fvb, width, height,
                                  lo, hi)
        sel = None
    rows = jax.vmap(
        lambda g, d, v, k: _frame_metrics_from_field(
            g, d, v, k, max_radius, tolerance, distance)
    )(gt_mask, dist_field, vu, keep)
    z = fvb.astype(jnp.float32)
    partials = {k2: jnp.sum(v * z) for k2, v in rows.items()}
    votes = None
    if vote_field is not None:
        H, W = gt_mask.shape[-2], gt_mask.shape[-1]
        vi, ui = _clip_pixels(vu, H, W)
        votes = jax.vmap(_gather_at)(vote_field, vi, ui).astype(
            vote_field.dtype)
    return partials, votes, keep, sel


@partial(jax.jit, static_argnames=("width", "height", "k1", "max_radius",
                                   "tolerance", "distance", "assignment",
                                   "want_votes"))
def _eval_chunk_build(points, valid, A, B, fvb, gt_ids, width, height, lo, hi,
                      k1, max_radius, tolerance, distance, assignment,
                      want_votes):
    """First-visit fused chunk: derive the GT fields from the uploaded ids
    AND evaluate, in one dispatch.  Returns the evaluation outputs plus the
    derived fields (dist_field, gt mask bitpacked on device, vote field or
    None) — jit outputs stay in HBM, so the caller retains them as the
    resident cache with zero extra transfer."""
    gt_mask = gt_ids > 0
    dist_fd = _dist_field(gt_mask, _dist_rounds(max_radius, tolerance,
                                                distance), distance)
    vote_fd = (_vote_field(gt_ids, tolerance, assignment)
               if want_votes else None)
    partials, votes, keep, sel = _eval_core(
        points, valid, A, B, fvb, dist_fd, gt_mask, vote_fd,
        width, height, lo, hi, k1, max_radius, tolerance, distance)
    gtp = jnp.packbits(gt_mask, axis=-1)
    return partials, votes, keep, sel, dist_fd, gtp, vote_fd


@partial(jax.jit, static_argnames=("width", "height", "k1", "max_radius",
                                   "tolerance", "distance"))
def _eval_chunk_serve(points, valid, A, B, fvb, dist_field, gtp, vote_field,
                      width, height, lo, hi, k1, max_radius, tolerance,
                      distance):
    """Steady-state fused chunk: everything heavy (points, GT fields) is
    already device-resident; the host uploads only this chunk's A/B/fvb
    (a few KB).  One dispatch per chunk — the pre-resident path paid a
    projection dispatch, a metric dispatch, AND the bitpacked mask upload
    per chunk per evaluation."""
    gt_mask = _unpack_bits(gtp, width)
    return _eval_core(points, valid, A, B, fvb, dist_field, gt_mask,
                      vote_field, width, height, lo, hi, k1, max_radius,
                      tolerance, distance)


def frame_instance_pairs(gt_ids, vu, keep, point_inst, tolerance,
                         assignment="nearest"):
    """Per-frame (map_instance_id, gt_instance_id) pairs for every kept
    projected point: the raw material for association voting.

    gt_ids: [C, H, W] integer GT instance image (0 = background)
    vu/keep: [C, P, 2] / [C, P] projections;  point_inst: [P] map instance ids
    assignment: 'nearest' (exact — each point votes for the Euclidean-nearest
        GT instance within `tolerance` px, via nearest_id_edt) or 'chebyshev'
        (id max-dilation; larger id wins where instances overlap — the
        round-2 approximation, kept for comparison).
    Returns (mi [N], gi [N]) numpy arrays (gi = 0 where no GT instance is
    within tolerance).
    """
    g_at = np.asarray(instance_votes_chunk(
        jnp.asarray(gt_ids)[None], jnp.asarray(vu)[None],
        jnp.asarray(keep)[None], tolerance, assignment))[0]
    keep_np = np.asarray(keep)
    mi = np.broadcast_to(np.asarray(point_inst)[None, :], keep_np.shape)[keep_np]
    return mi.astype(np.int64), g_at[keep_np].astype(np.int64)


def instance_association(pairs_mi, pairs_gi, gt_ids_visible=None):
    """Majority-vote association + quality metrics over accumulated pairs.

    gt_ids_visible: optional set of GT instance ids actually present in the
    (undilated) masks — the recall denominator.  Defaults to the ids seen in
    the gathered votes (an underestimate of the denominator when a GT
    instance's map twin was culled before projection).

    Returns dict:
      instance_precision — fraction of visible map instances whose majority
        vote lands on a real GT instance (not background)
      instance_recall    — fraction of GT instance ids claimed by >=1 map
        instance's majority vote
      mean_purity        — mean over map instances of (votes for the winner /
        total votes), background included in the denominator
      n_map_instances / n_gt_instances
    """
    mi = np.asarray(pairs_mi)
    gi = np.asarray(pairs_gi)
    if len(mi) == 0:
        return {"instance_precision": 0.0, "instance_recall": 0.0,
                "mean_purity": 0.0, "n_map_instances": 0, "n_gt_instances": 0}
    gt_total = (set(gt_ids_visible) if gt_ids_visible is not None
                else set(np.unique(gi[gi > 0]).tolist()))
    matched_gt = set()
    purities = []
    n_matched = 0
    for m in np.unique(mi):
        votes = gi[mi == m]
        ids, counts = np.unique(votes, return_counts=True)
        # majority among non-background; ties resolve to the smaller id
        fg = ids > 0
        if fg.any():
            k = np.argmax(counts[fg])
            winner, wcount = int(ids[fg][k]), int(counts[fg][k])
        else:
            winner, wcount = 0, 0
        purities.append(wcount / len(votes))
        if winner > 0:
            n_matched += 1
            matched_gt.add(winner)
    n_map = len(np.unique(mi))
    return {
        "instance_precision": n_matched / n_map if n_map else 0.0,
        "instance_recall": len(matched_gt) / len(gt_total) if gt_total else 0.0,
        "mean_purity": float(np.mean(purities)) if purities else 0.0,
        "n_map_instances": n_map,
        "n_gt_instances": len(gt_total),
    }


def reduce_metrics(partials):
    """Sum per-frame partial dicts -> final metric dict."""
    total = {}
    for p in partials:
        for k, v in p.items():
            total[k] = total.get(k, 0.0) + float(v)
    n_pts = total.get("n_points", 0.0)
    gt_tot = total.get("gt_total", 0.0)
    precision = total["n_hit"] / n_pts if n_pts else 0.0
    recall = total["gt_covered"] / gt_tot if gt_tot else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "SRE": total.get("sre_sum", 0.0) / n_pts if n_pts else float("nan"),
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "n_points": n_pts,
        "gt_pixels": gt_tot,
    }


class MapEvaluator:
    """Scene-level SRE/precision/recall/F1 over reprojected map elements."""

    def __init__(self, tolerance=5, max_radius=20, distance="chebyshev",
                 backend="device", compact="auto", resident="auto"):
        import weakref

        from cama_tpu.profiling import PhaseTimers

        self.tolerance = int(tolerance)
        self.max_radius = int(max_radius)
        self.distance = distance
        if compact not in ("auto", "off"):
            raise ValueError(f"unknown compact {compact!r}")
        if resident not in ("auto", "off"):
            raise ValueError(f"unknown resident {resident!r}")
        # 'auto': full-scene device evaluations keep the GT-derived distance
        # and vote fields in HBM (keyed by the GT store's content key) and
        # run ONE fused projection+metric dispatch per chunk — the steady
        # state uploads only A/B matrices.  Fields are pure functions of the
        # cached GT masks + caps, so results are identical; tests pin it.
        # 'off' forces the per-evaluation upload+transform path.
        self.resident = resident
        # pipeline -> {"bytes": int, "chunks": {(source, s): entry}} — weak
        # keys so retired pipelines release their HBM fields with them
        self._resident_fields = weakref.WeakKeyDictionary()
        # 'auto': when the scene's counting pass engaged the overlay path's
        # crop-first two-stage split (pipeline.crop_compact_k — wide/long-
        # range scenes where most points fall outside the per-frame crop),
        # the device projections compact to the k1 crop survivors before the
        # per-point metric gathers/scatters run, cutting that work P/k1-fold.
        # The kept-point SET is unchanged (keep requires the crop box), so
        # every metric is unchanged.  'off' forces full-P projections.
        self.compact = compact
        # observability (SURVEY.md §5): per-phase wall-clock like the
        # pipeline's — print evaluator.timers.report() after a run to see
        # where an evaluation spent its time (GT load vs dispatch vs fetch)
        self.timers = PhaseTimers()
        # compiled sharded steps keyed by (mesh layout + device ids, shapes)
        # — never id(mesh): a GC'd mesh's id can be recycled by a
        # differently-shaped successor
        self._sharded_steps = {}
        if backend not in ("device", "host"):
            raise ValueError(f"unknown backend {backend!r}")
        # 'host': NumPy/SciPy projections + metrics (frame_metrics_host,
        # instance_votes_host) — accelerator-less evaluation, and fresh
        # processes skip the minutes-scale remote compile of the metric
        # programs.  Covers the full scene surface with the default
        # 'nearest' assignment; the 'dilate' assignment stays device-only.
        self.backend = backend

    def _chunk_has_gt(self, pipeline, idxs):
        """Any lane_ins PNG present for any (frame, camera) in this chunk —
        the same existence gate instance_loader applies per mask."""
        scene = pipeline.scene
        for idx in idxs:
            if idx is None:
                continue
            for cam in scene.camera_list:
                ms = scene.sync_ms[cam][idx]
                if os.path.exists(os.path.join(
                        scene.clip_path, f"lane_ins_{cam}", f"{ms}.png")):
                    return True
        return False

    def instance_loader(self, pipeline, camera, image_idx):
        """Load + nearest-remap a `lane_ins_{camera}` instance-id PNG to the
        output size, mirroring the reference's undistort-remap with
        INTER_NEAREST (cama/reproject.py:222-226). Returns [H, W] int ids
        (0 = background) or None.  Served from the per-clip GT mask store
        (pipeline.gt_mask_cache) after the first decode — the PNG decode +
        remap host cost is the evaluation analogue of the base-image floor
        the frame cache removes."""
        import cv2

        scene = pipeline.scene
        ms = scene.sync_ms[camera][image_idx]
        path = f"{scene.clip_path}/lane_ins_{camera}/{ms}.png"
        if not os.path.exists(path):  # absent masks are routine (not every
            return None               # clip ships GT) — no cv2 WARN spam
        c = scene.camera_list.index(camera)
        cache = pipeline.gt_mask_cache()
        if cache is not None:
            cached = cache.get(image_idx, c)
            if cached is not None:
                return cached  # read-only mmap view; callers copy into stacks
        raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
        if raw is None:
            return None
        h, w = scene.output_size
        mapx, mapy = pipeline.remaps.get(
            camera, scene.K_orig[c], scene.d[c], scene.K_scaled[c], (h, w)
        )
        ids = cv2.remap(raw, mapx, mapy, interpolation=cv2.INTER_NEAREST)
        if cache is not None:
            # own=True: the freshly-remapped ids are never mutated (metric
            # consumers stack/copy); skips the store's defensive copy
            cache.put(image_idx, c, ids.astype(np.uint16, copy=False),
                      own=True)
        return ids

    def mask_loader(self, pipeline, camera, image_idx):
        """Binary-mask view of instance_loader. Returns [H, W] bool or None."""
        ids = self.instance_loader(pipeline, camera, image_idx)
        return None if ids is None else ids > 0

    def _iter_chunk_projections(self, pipeline, source, frames):
        """Chunked device projection shared by every scene-level metric:
        yields (image_idxs, vu [K, C, P', 2], keep [K, C, P'], sel) per
        chunk, where image_idxs[kk] is the frame index for chunk row kk, or
        None for rows that are invalid frames / not in the requested
        `frames` set.  Memory stays bounded at pipeline.chunk frames; metric
        consumers batch their device work over the whole chunk (one
        dispatch each).

        P' is the full point axis P with sel=None, or — when compact='auto'
        engaged the crop-first compaction (_project_compact_chunk_eval) —
        the k1 crop-survivor count with sel a device [K, k1] int32 gather
        index into the original point axis (padding rows carry keep False).
        The kept-point set is identical either way."""
        import jax.numpy as jnp

        from cama_tpu.ops.geometry import project_frames

        fm, A, B, fv, F = pipeline._chunked_AB(source)
        k1 = None
        if self.backend == "device":
            points, cls, valid = pipeline.device_points(source)
            if self.compact == "auto":
                k1 = pipeline.crop_compact_k(source)
        h, w = pipeline.scene.output_size
        pending = None if frames is None else set(frames)
        for s in range(0, len(fv), pipeline.chunk):
            if pending is not None and not pending:
                return  # all requested frames served — stop dispatching
            sl = slice(s, s + pipeline.chunk)
            idxs = []
            for k in range(s, min(s + pipeline.chunk, len(fv))):
                if k >= F or not fm.frame_valid[k]:
                    idxs.append(None)
                    continue
                image_idx = int(fm.frame_indices[k])
                if frames is not None and image_idx not in frames:
                    idxs.append(None)
                    continue
                idxs.append(image_idx)
            if pending is not None:
                # skip whole chunks with no requested frame BEFORE paying the
                # device projection for them (quick-look reports on long clips)
                if not any(i is not None for i in idxs):
                    continue
                pending.difference_update(i for i in idxs if i is not None)
            if self.backend == "host":
                # skip GT-less chunks BEFORE the synchronous f64 projection:
                # absent masks are routine, and unlike the async device
                # dispatch this einsum is real blocking host work whose
                # output _chunk_gt would discard (cheap existence checks,
                # the same gate instance_loader applies)
                if not self._chunk_has_gt(pipeline, idxs):
                    continue
                from cama_tpu.pipeline import (
                    _host_project_chunk,
                    _host_project_compact_chunk,
                )

                fp = pipeline.scene.flat[source]
                with self.timers.phase("eval_host"):
                    if self.compact == "auto":
                        # unconditional on host: no compile shapes to size,
                        # padding is local to the chunk, and wide scenes cut
                        # the f64 per-point work by the crop ratio
                        vu_c, keep_c, sel_c = _host_project_compact_chunk(
                            fp.points, fp.valid, A[sl], B[sl], fv[sl], w, h,
                            pipeline._crop_lo, pipeline._crop_hi)
                    else:
                        vu_c, keep_c = _host_project_chunk(
                            fp.points, fp.valid, A[sl], B[sl], fv[sl], w, h,
                            pipeline._crop_lo, pipeline._crop_hi)
                        sel_c = None
            elif k1 is not None:
                vu_c, keep_c, sel_c = _project_compact_chunk_eval(
                    points, valid,
                    jnp.asarray(A[sl]), jnp.asarray(B[sl]), jnp.asarray(fv[sl]),
                    w, h, pipeline._crop_lo, pipeline._crop_hi, k1,
                )
            else:
                vu_c, keep_c = project_frames(
                    points, valid,
                    jnp.asarray(A[sl]), jnp.asarray(B[sl]), jnp.asarray(fv[sl]),
                    w, h, pipeline._crop_lo, pipeline._crop_hi,
                )
                sel_c = None
            idxs += [None] * (vu_c.shape[0] - len(idxs))
            yield idxs, vu_c, keep_c, sel_c

    def _iter_frame_projections(self, pipeline, source, frames):
        """Per-frame adapter over _iter_chunk_projections: yields
        (image_idx, vu [C, P', 2], keep [C, P']) for each valid frame (P'
        may be the compacted k1 axis — kept-point set identical)."""
        for idxs, vu_c, keep_c, _sel in self._iter_chunk_projections(
                pipeline, source, frames):
            for kk, image_idx in enumerate(idxs):
                if image_idx is not None:
                    yield image_idx, vu_c[kk], keep_c[kk]

    def _load_all_cameras(self, pipeline, image_idx):
        """Instance-id images for every camera, or None if any is missing."""
        ids = []
        for camera in pipeline.scene.camera_list:
            m = self.instance_loader(pipeline, camera, image_idx)
            if m is None:
                return None
            ids.append(m)
        return np.stack(ids)

    def _chunk_gt(self, pipeline, idxs):
        """GT instance-id stacks for one projection chunk.

        Returns (ids_b [K, C, H, W] uint16 — zeros for rows without GT,
        fv [K] float32 row validity, evaluated frame-index list), or
        (None, None, []) when no row in the chunk has GT masks (the chunk's
        metric dispatch is skipped entirely).  uint16 holds any id cv2 can
        read from a lane_ins PNG (8- or 16-bit) and halves upload bytes on
        the dense path."""
        ids_b = None
        fv = np.zeros((len(idxs),), np.float32)
        evaluated = []
        for kk, image_idx in enumerate(idxs):
            if image_idx is None:
                continue
            ids = self._load_all_cameras(pipeline, image_idx)
            if ids is None:
                continue
            if ids_b is None:
                ids_b = np.zeros((len(idxs),) + ids.shape, np.uint16)
            ids_b[kk] = ids
            fv[kk] = 1.0
            evaluated.append((kk, image_idx))
        return ids_b, fv, evaluated

    # resident-field HBM budget per evaluator: beyond it, later chunks still
    # run the fused single-dispatch build but their fields are not retained
    # (a 200-frame production scene's fields are ~3 GB at 540x960x6; the
    # default keeps long scenes from crowding out the overlay pipeline)
    RESIDENT_BUDGET_MB = float(os.environ.get("CAMA_EVAL_RESIDENT_MB", 2048))

    def _chunk_layout(self, pipeline, source):
        """Chunk row layout for a full-scene pass: yields (s, idxs) where
        idxs[kk] is the frame index for row kk or None (invalid frame /
        padding) — the same layout _iter_chunk_projections derives."""
        fm, A, B, fv, F = pipeline._chunked_AB(source)
        for s in range(0, len(fv), pipeline.chunk):
            idxs = []
            for k in range(s, min(s + pipeline.chunk, len(fv))):
                if k >= F or not fm.frame_valid[k]:
                    idxs.append(None)
                else:
                    idxs.append(int(fm.frame_indices[k]))
            yield s, idxs

    def _eval_scene_resident(self, pipeline, source, frames, instances,
                             assignment):
        """Fused resident-field evaluation (the device steady state).

        Per chunk, ONE dispatch projects the scene points and samples
        GT-derived fields that live in HBM: a capped distance field (uint8
        chebyshev count / f32 squared-EDT) for SRE + precision, the
        bitpacked GT mask for recall, and — when instances are requested —
        the per-pixel nearest-instance vote field.  The fields are pure
        functions of the cached GT masks and the evaluator's caps, built
        once per (pipeline, chunk) by a fused build dispatch and keyed by
        the GT store's content key, so regenerated masks invalidate them
        exactly when they invalidate the store.  A warm evaluation therefore
        uploads only each chunk's A/B/fvb (a few KB) instead of re-uploading
        masks and re-running the distance transforms — the round-4 profile's
        binding stages (VERDICT #2).

        Persisting the fields to the on-disk GT store was considered and
        rejected: on the tunneled runtime the host->device link binds, and a
        dense uint8 distance field is 8x the bytes of the bitpacked masks
        the cold path already uploads — a fresh process is better off
        rebuilding fields on device (one fused dispatch) than uploading
        them.

        Returns the result dict, or None when the path doesn't apply
        (host backend, frames filter, resident='off', or no GT store to key
        staleness by)."""
        if (self.backend != "device" or frames is not None
                or self.resident == "off"):
            return None
        cache = pipeline.gt_mask_cache()
        if cache is None:
            return None  # no content key to detect regenerated masks by
        gt_key = cache.key
        import jax.numpy as jnp

        fm, A, B, fv, F = pipeline._chunked_AB(source)
        points, cls, valid = pipeline.device_points(source)
        k1 = (pipeline.crop_compact_k(source) if self.compact == "auto"
              else None)
        h, w = pipeline.scene.output_size
        lo, hi = pipeline._crop_lo, pipeline._crop_hi
        store = self._resident_fields.get(pipeline)
        if store is None:
            store = self._resident_fields[pipeline] = {"bytes": 0,
                                                       "chunks": {}}
        budget = int(self.RESIDENT_BUDGET_MB * 1e6)

        partials, pending = [], []
        sink = {"mi": [], "gi": []}
        visible = set()
        n_evaluated = 0
        for s, idxs in self._chunk_layout(pipeline, source):
            key = (source, s)
            entry = store["chunks"].get(key)
            if entry is not None and entry["gt_key"] != gt_key:
                if not entry.get("empty"):
                    store["bytes"] -= entry["bytes"]
                entry = None  # masks regenerated: rebuild
            if (entry is not None and not entry.get("empty") and instances
                    and assignment not in entry["votes"]):
                store["bytes"] -= entry["bytes"]
                entry = None  # upgrade: rebuild with the vote field
            if entry is not None and entry.get("empty"):
                continue
            sl = slice(s, s + pipeline.chunk)
            if entry is None:
                with self.timers.phase("eval_gt_load"):
                    ids_b, fvv, evaluated = self._chunk_gt(pipeline, idxs)
                if ids_b is None:
                    store["chunks"][key] = {"gt_key": gt_key, "empty": True}
                    continue
                fvb = fvv > 0
                vis = (np.unique(ids_b[ids_b > 0]) if instances
                       else np.empty(0, np.int64))
                with self.timers.phase("eval_dispatch"):
                    p, votes, keep, sel, dist_fd, gtp, vote_fd = \
                        _eval_chunk_build(
                            points, valid, jnp.asarray(A[sl]),
                            jnp.asarray(B[sl]), jnp.asarray(fvb),
                            device_ids(ids_b), w, h, lo, hi, k1,
                            self.max_radius, self.tolerance, self.distance,
                            assignment, instances)
                nbytes = (dist_fd.nbytes + gtp.nbytes
                          + (vote_fd.nbytes if vote_fd is not None else 0))
                if store["bytes"] + nbytes <= budget:
                    entry = {
                        "gt_key": gt_key, "fvb": fvb, "evaluated": evaluated,
                        "visible": vis, "bytes": nbytes,
                        "dist": dist_fd, "gtp": gtp,
                        "votes": {assignment: vote_fd} if instances else {},
                    }
                    store["chunks"][key] = entry
                    store["bytes"] += nbytes
                else:
                    store["chunks"].pop(key, None)  # over budget: don't keep
            else:
                evaluated, vis = entry["evaluated"], entry["visible"]
                with self.timers.phase("eval_dispatch"):
                    p, votes, keep, sel = _eval_chunk_serve(
                        points, valid, jnp.asarray(A[sl]),
                        jnp.asarray(B[sl]), jnp.asarray(entry["fvb"]),
                        entry["dist"], entry["gtp"],
                        entry["votes"].get(assignment) if instances else None,
                        w, h, lo, hi, k1, self.max_radius, self.tolerance,
                        self.distance)
            partials.append(p)
            n_evaluated += len(evaluated)
            if instances:
                visible.update(int(i) for i in vis)
                self._push_votes(pipeline, source, pending, sink,
                                 (votes, keep, sel, evaluated))
        self._drain_votes(pipeline, source, pending, sink)
        with self.timers.phase("eval_fetch"):
            out = reduce_metrics(jax.device_get(partials))
        if instances:
            assoc = self._associate(sink, visible)
            out.update(assoc if assoc is not None else self._EMPTY_ASSOCIATION)
        out["frames_evaluated"] = n_evaluated
        return out

    def evaluate_scene(self, pipeline, source="cama", frames=None):
        """Run the metric over all valid frames that have GT masks.

        Projection AND metrics run chunk-by-chunk (pipeline.chunk frames per
        device dispatch) so memory stays bounded for long scenes and the
        ~30 ms/dispatch tunnel latency amortizes across the chunk; chunk
        partials are plain sums, so they reduce the same way on one chip or
        psum'd across a frame-sharded mesh (see parallel.sharded_map_metrics).
        """
        pipeline.refresh_gt_cache()  # pick up regenerated GT masks
        r = self._eval_scene_resident(pipeline, source, frames,
                                      instances=False, assignment="nearest")
        if r is not None:
            return r
        import jax.numpy as jnp

        partials = []  # device scalars: fetched once, after every chunk is
        n_evaluated = 0  # dispatched, so host GT loading overlaps device work
        for idxs, vu_c, keep_c, _sel in self._iter_chunk_projections(
                pipeline, source, frames):
            with self.timers.phase("eval_gt_load"):
                ids_b, fv, evaluated = self._chunk_gt(pipeline, idxs)
            if ids_b is None:
                continue
            if self.backend == "host":
                with self.timers.phase("eval_host"):
                    self._host_fold_metrics(partials, ids_b, vu_c, keep_c,
                                            evaluated)
            else:
                with self.timers.phase("eval_dispatch"):
                    partials.append(frame_metrics_chunk_packed(
                        jnp.asarray(np.packbits(ids_b > 0, axis=-1)), vu_c,
                        keep_c, jnp.asarray(fv), ids_b.shape[-1],
                        self.max_radius, self.tolerance, self.distance,
                    ))
            n_evaluated += len(evaluated)
        with self.timers.phase("eval_host" if self.backend == "host"
                               else "eval_fetch"):
            out = reduce_metrics(partials if self.backend == "host"
                                 else jax.device_get(partials))
        out["frames_evaluated"] = n_evaluated
        return out

    # device-vote backlog bound (chunks): enough in flight to overlap host GT
    # loading with device work, small enough that vote buffers stay O(1) in
    # scene length (a [K, C, P] uint16 + bool pair per chunk can be tens of
    # MB at production point counts)
    MAX_PENDING_CHUNKS = 4

    def _drain_votes(self, pipeline, source, pending, sink):
        """Fetch the queued chunks' device votes + keep masks in one batched
        device_get, filter per evaluated row, fold into sink['mi'/'gi'].
        pending: list of (votes_dev [K, C, P'], keep_dev [K, C, P'],
        sel_dev [K, P'] or None, evaluated) — with a compacted projection,
        sel maps each row's point axis back to scene-flat instance ids."""
        if not pending:
            return
        point_inst = np.asarray(pipeline.scene.flat[source].inst)
        with self.timers.phase("eval_fetch"):
            fetched = jax.device_get([(v, k, s) for v, k, s, _ in pending])
        for (g_at, keep_np, sel_np), (_, _, _, evaluated) in zip(fetched,
                                                                 pending):
            for kk, _image_idx in evaluated:
                k_row = keep_np[kk]
                inst_row = (point_inst if sel_np is None
                            else point_inst[sel_np[kk]])
                mi = np.broadcast_to(inst_row[None, :], k_row.shape)[k_row]
                sink["mi"].append(mi.astype(np.int64))
                sink["gi"].append(g_at[kk][k_row].astype(np.int64))
        pending.clear()

    def _push_votes(self, pipeline, source, pending, sink, item):
        """Queue one chunk's device votes, draining when the backlog bound
        is hit (keeps dispatch pipelining without unbounded buffers)."""
        pending.append(item)
        if len(pending) >= self.MAX_PENDING_CHUNKS:
            self._drain_votes(pipeline, source, pending, sink)

    @staticmethod
    def _associate(sink, visible):
        if not sink["mi"]:
            return None
        return instance_association(np.concatenate(sink["mi"]),
                                    np.concatenate(sink["gi"]),
                                    gt_ids_visible=visible)

    _EMPTY_ASSOCIATION = {"instance_precision": 0.0, "instance_recall": 0.0,
                          "mean_purity": 0.0, "n_map_instances": 0,
                          "n_gt_instances": 0}

    def _check_assignment(self, assignment):
        """Validate at method ENTRY: the in-loop location this replaces only
        fired when a GT-bearing chunk existed, so an unsupported assignment
        on a GT-less clip returned empty results silently."""
        if self.backend == "host" and assignment != "nearest":
            raise ValueError("backend='host' supports assignment='nearest'")

    def _host_fold_metrics(self, partials, ids_b, vu_c, keep_c, evaluated):
        """Host-backend per-row metric fold shared by evaluate_scene and
        evaluate_scene_all (one definition, or a future cap/distance change
        silently diverges them)."""
        for kk, _image_idx in evaluated:
            partials.append(frame_metrics_host(
                ids_b[kk] > 0, vu_c[kk], keep_c[kk],
                self.max_radius, self.tolerance, self.distance))

    def _host_fold_votes(self, pipeline, source, sink, ids_b, vu_c, keep_c,
                         evaluated, sel_c=None):
        """Host-backend voting for one chunk's evaluated rows, folded
        straight into the association sink (no device transport).  sel_c
        maps a compacted chunk's point axis back to scene-flat instance
        ids (None for full-P projections)."""
        point_inst = np.asarray(pipeline.scene.flat[source].inst)
        for kk, _image_idx in evaluated:
            votes_row = instance_votes_host(ids_b[kk], vu_c[kk], keep_c[kk],
                                            self.tolerance)
            k_row = np.asarray(keep_c[kk], bool)
            inst = (point_inst if sel_c is None
                    else point_inst[np.asarray(sel_c[kk])])
            mi = np.broadcast_to(inst[None, :], k_row.shape)[k_row]
            sink["mi"].append(mi.astype(np.int64))
            sink["gi"].append(votes_row[k_row].astype(np.int64))

    def evaluate_scene_instances(self, pipeline, source="cama", frames=None,
                                 assignment="nearest"):
        """Instance-level association quality over all valid frames with GT
        instance masks: each map instance's projected points vote on a GT
        instance id (for the Euclidean-nearest instance within tolerance by
        default — see instance_votes_chunk); reports precision/recall/purity
        (see instance_association).  One device dispatch per chunk; votes
        fetched in batched transfers every MAX_PENDING_CHUNKS chunks."""
        self._check_assignment(assignment)
        pipeline.refresh_gt_cache()  # pick up regenerated GT masks
        pending = []
        sink = {"mi": [], "gi": []}
        visible = set()
        n_evaluated = 0
        for idxs, vu_c, keep_c, sel_c in self._iter_chunk_projections(
                pipeline, source, frames):
            with self.timers.phase("eval_gt_load"):
                ids_b, fv, evaluated = self._chunk_gt(pipeline, idxs)
            if ids_b is None:
                continue
            if self.backend == "host":
                with self.timers.phase("eval_host"):
                    self._host_fold_votes(pipeline, source, sink, ids_b,
                                          vu_c, keep_c, evaluated, sel_c)
            else:
                with self.timers.phase("eval_dispatch"):
                    votes = instance_votes_chunk(
                        device_ids(ids_b), vu_c, keep_c, self.tolerance,
                        assignment)
                    self._push_votes(pipeline, source, pending, sink,
                                     (votes, keep_c, sel_c, evaluated))
            visible.update(np.unique(ids_b[ids_b > 0]).tolist())
            n_evaluated += len(evaluated)
        self._drain_votes(pipeline, source, pending, sink)
        out = self._associate(sink, visible)
        if out is None:
            return dict(self._EMPTY_ASSOCIATION, frames_evaluated=0)
        out["frames_evaluated"] = n_evaluated
        return out

    def evaluate_scene_all(self, pipeline, source="cama", frames=None,
                           assignment="nearest"):
        """Scene metrics AND instance association in ONE pass: the GT
        instance PNGs are read+remapped once, the device projections run once
        per chunk, and both metric families share a single fused device
        dispatch per chunk (_metrics_and_votes_chunk).  Vote buffers come
        back in bounded batched transfers (MAX_PENDING_CHUNKS), scalar
        partials in one trailing device_get.  Result dict is the union of
        the two single-metric methods' outputs."""
        import jax.numpy as jnp

        self._check_assignment(assignment)
        pipeline.refresh_gt_cache()  # pick up regenerated GT masks
        r = self._eval_scene_resident(pipeline, source, frames,
                                      instances=True, assignment=assignment)
        if r is not None:
            return r
        partials, pending = [], []
        sink = {"mi": [], "gi": []}
        visible = set()
        n_evaluated = 0
        for idxs, vu_c, keep_c, sel_c in self._iter_chunk_projections(
                pipeline, source, frames):
            with self.timers.phase("eval_gt_load"):
                ids_b, fv, evaluated = self._chunk_gt(pipeline, idxs)
            if ids_b is None:
                continue
            if self.backend == "host":
                with self.timers.phase("eval_host"):
                    self._host_fold_metrics(partials, ids_b, vu_c, keep_c,
                                            evaluated)
                    self._host_fold_votes(pipeline, source, sink, ids_b,
                                          vu_c, keep_c, evaluated, sel_c)
            else:
                with self.timers.phase("eval_dispatch"):
                    p, votes = _metrics_and_votes_chunk(
                        device_ids(ids_b), vu_c, keep_c, jnp.asarray(fv),
                        self.max_radius, self.tolerance, self.distance,
                        assignment,
                    )
                    partials.append(p)
                    self._push_votes(pipeline, source, pending, sink,
                                     (votes, keep_c, sel_c, evaluated))
            visible.update(np.unique(ids_b[ids_b > 0]).tolist())
            n_evaluated += len(evaluated)
        self._drain_votes(pipeline, source, pending, sink)
        with self.timers.phase("eval_host" if self.backend == "host"
                               else "eval_fetch"):
            out = reduce_metrics(partials if self.backend == "host"
                                 else jax.device_get(partials))
        assoc = self._associate(sink, visible)
        out.update(assoc if assoc is not None else self._EMPTY_ASSOCIATION)
        out["frames_evaluated"] = n_evaluated
        return out


    def evaluate_scene_batch(self, pipelines, source="cama", instances=False,
                             assignment="nearest"):
        """Fleet evaluation: EVERY scene's metric device work batched into
        one dispatch wave per chunk, riding MultiScenePipeline's stacked
        tensors (scenes pad to a common (P, F); same batching the CLI uses
        for overlay videos).  Per-scene results come from per-ROW partials
        grouped on the host, so each scene still gets its own metric dict.

        pipelines: list of ClipPipeline (same output size) or a
            MultiScenePipeline.
        instances: also run association voting per scene (one fused
            projection+votes wave per chunk).
        Returns: list aligned with the input pipelines — a result dict per
        scene, or None for scenes that lack the source or have no GT.
        """
        import jax.numpy as jnp

        from cama_tpu.pipeline import MultiScenePipeline

        if self.backend == "host":
            # the fleet path exists to batch DEVICE dispatch waves; the host
            # backend has no dispatch latency to amortize, so route per
            # scene through the host evaluators (same full surface, no
            # compile wait) instead of silently dispatching device programs
            pipes_list = (pipelines.pipelines
                          if isinstance(pipelines, MultiScenePipeline)
                          else list(pipelines))
            if not any(source in p.scene.flat for p in pipes_list):
                # same failure mode as the device route (which raises via
                # MultiScenePipeline._stacked) — not a silent all-None list
                raise ValueError(f"no member scene carries source {source!r}")
            results = []
            for p in pipes_list:
                if source not in p.scene.flat:
                    results.append(None)
                    continue
                r = (self.evaluate_scene_all(p, source, assignment=assignment)
                     if instances else self.evaluate_scene(p, source))
                results.append(r if r.get("frames_evaluated") else None)
            return results

        msp = (pipelines if isinstance(pipelines, MultiScenePipeline)
               else MultiScenePipeline(pipelines, source=source))
        # _stacked, not _source_state: the latter also runs the overlay
        # COUNTING pass per member (k / 2-bit decisions the metric path
        # never uses — F/chunk device dispatches per scene wasted)
        members = msp.members(source)
        fms, Fs, pts, cls_, valid, A, B, fv = msp._stacked(source)
        ptsj, validj = jnp.asarray(pts), jnp.asarray(valid)
        pipes = [msp.pipelines[i] for i in members]
        for p in pipes:
            p.refresh_gt_cache()  # pick up regenerated GT masks
        h, w = pipes[0].scene.output_size
        lo, hi = pipes[0]._crop_lo, pipes[0]._crop_hi
        S = len(pipes)
        K = msp.chunk
        P = ptsj.shape[1]
        inst_pad = [np.pad(np.asarray(p.scene.flat[source].inst),
                           (0, P - len(p.scene.flat[source].inst)))
                    for p in pipes] if instances else None
        # fleet-wide two-stage: compact to the members' largest crop-survivor
        # sizing when EVERY member's counting pass engaged the split (mixed
        # or unsized fleets stay full-P) — same already-known-only rule as
        # the solo path (pipeline.crop_compact_k never dispatches counting)
        k1 = None
        if self.compact == "auto":
            ks = [p.crop_compact_k(source) for p in pipes]
            if ks and all(k is not None for k in ks):
                k1 = max(ks)
                if k1 * 2 > P:
                    k1 = None

        sums = [dict() for _ in range(S)]
        counts = [0] * S
        sinks = [{"mi": [], "gi": []} for _ in range(S)]
        visible = [set() for _ in range(S)]
        pending = []  # (rows_dev dict, votes_dev|None, keep_dev, slots)

        def drain():
            if not pending:
                return
            with self.timers.phase("eval_fetch"):
                fetched = jax.device_get(pending)
            for rows, votes, keep_p, cidx, p_dim, slots in fetched:
                keep_np = (None if keep_p is None else
                           np.unpackbits(keep_p, axis=-1)[..., :p_dim]
                           .astype(bool))
                for r, (mi_s, kk) in enumerate(slots):
                    for k2, v in rows.items():
                        sums[mi_s][k2] = sums[mi_s].get(k2, 0.0) + float(v[r])
                    counts[mi_s] += 1
                    if votes is not None:
                        k_row = keep_np[r]
                        m = inst_pad[mi_s]
                        if cidx is not None:  # compacted: map back through
                            m = m[cidx[r]]    # the row's selection indices
                        sinks[mi_s]["mi"].append(np.broadcast_to(
                            m[None, :], k_row.shape)[k_row].astype(np.int64))
                        sinks[mi_s]["gi"].append(
                            votes[r][k_row].astype(np.int64))
            pending.clear()

        for s in range(0, fv.shape[1], K):
            sl = slice(s, s + K)
            with self.timers.phase("eval_dispatch"):
                if k1 is not None:
                    vu, keep, cidx_c = _project_compact_scenes(
                        ptsj, validj, jnp.asarray(A[:, sl]),
                        jnp.asarray(B[:, sl]), jnp.asarray(fv[:, sl]),
                        w, h, lo, hi, k1)
                else:
                    vu, keep = _project_scenes(
                        ptsj, validj, jnp.asarray(A[:, sl]),
                        jnp.asarray(B[:, sl]),
                        jnp.asarray(fv[:, sl]), w, h, lo, hi)
                    cidx_c = None
            # rows with complete GT, across all scenes of this chunk
            gt_rows, slots = [], []
            with self.timers.phase("eval_gt_load"):
                for mi_s, (fm, F) in enumerate(zip(fms, Fs)):
                    for kk in range(min(K, fv.shape[1] - s)):
                        fidx = s + kk
                        if fidx >= F or not fm.frame_valid[fidx]:
                            continue
                        ids = self._load_all_cameras(
                            pipes[mi_s], int(fm.frame_indices[fidx]))
                        if ids is None:
                            continue
                        gt_rows.append(np.asarray(ids, np.uint16))
                        slots.append((mi_s, kk))
            if not gt_rows:
                continue
            # pad the row batch to a fixed multiple for compile reuse
            pad = (-len(gt_rows)) % K
            ids_b = np.stack(gt_rows + [np.zeros_like(gt_rows[0])] * pad)
            sel = np.asarray([mi_s * vu.shape[1] + kk for mi_s, kk in slots]
                             + [0] * pad, np.int32)
            with self.timers.phase("eval_dispatch"):
                vu_f = vu.reshape((-1,) + vu.shape[2:])[sel]
                keep_f = keep.reshape((-1,) + keep.shape[2:])[sel]
                rows = frame_metrics_rows_packed(
                    jnp.asarray(np.packbits(ids_b > 0, axis=-1)), vu_f,
                    keep_f, w, self.max_radius, self.tolerance, self.distance)
                votes = keep_p = cidx_f = None
                if instances:
                    votes = instance_votes_chunk(
                        device_ids(ids_b), vu_f, keep_f, self.tolerance,
                        assignment)
                    # keep crosses the link bitpacked (8x fewer bytes);
                    # skipped when only the scalar partials are needed
                    keep_p = jnp.packbits(keep_f, axis=-1)
                    if cidx_c is not None:  # per-row selection indices for
                        cidx_f = cidx_c.reshape(  # the vote drain's inst map
                            (-1,) + cidx_c.shape[2:])[sel]
            if instances:
                for (mi_s, _kk), ids in zip(slots, gt_rows):
                    visible[mi_s].update(np.unique(ids[ids > 0]).tolist())
            pending.append((rows, votes, keep_p, cidx_f,
                            int(keep_f.shape[-1]), slots))
            if len(pending) >= self.MAX_PENDING_CHUNKS:
                drain()
        drain()

        results = [None] * len(msp.pipelines)
        for mi_s, gi in enumerate(members):
            if counts[mi_s] == 0:
                continue
            out = reduce_metrics([sums[mi_s]])
            if instances:
                assoc = self._associate(sinks[mi_s], visible[mi_s])
                out.update(assoc if assoc is not None
                           else self._EMPTY_ASSOCIATION)
            out["frames_evaluated"] = counts[mi_s]
            results[gi] = out
        return results

    def evaluate_scene_batch_sharded(self, pipelines, mesh, source="cama"):
        """Fleet evaluation with the scene batch SHARDED over a
        ('scenes', 'frames') jax mesh: each device owns whole scenes' point
        tensors plus a frame shard, per-scene metric partials come back as
        [S] vectors with a psum over the frames axis only
        (parallel.sharded_scene_batch_metrics) — SURVEY.md §2.4's 'scenes
        for multi-scene sites' DP row as a real multi-chip program.

        Binary metrics only (association voting keeps the single-device
        fleet path); results match evaluate_scene_batch per scene.  The
        scene axis pads to mesh.shape['scenes'] with all-invalid dummy
        scenes, frame chunks pad to a multiple of mesh.shape['frames'].

        pipelines: list of ClipPipeline (same output size) or a
            MultiScenePipeline.
        Returns: list aligned with the input pipelines — a result dict per
        scene, or None for scenes lacking the source or GT.
        """
        import jax.numpy as jnp

        from cama_tpu.parallel import sharded_scene_batch_metrics

        if self.backend == "host":
            raise ValueError(
                "evaluate_scene_batch_sharded is a multi-device program; "
                "backend='host' has no mesh to shard over — use "
                "evaluate_scene_batch (which routes host per scene) or "
                "backend='device'")
        from cama_tpu.pipeline import MultiScenePipeline

        msp = (pipelines if isinstance(pipelines, MultiScenePipeline)
               else MultiScenePipeline(pipelines, source=source))
        members = msp.members(source)
        fms, Fs, pts, cls_, valid, A, B, fv = msp._stacked(source)
        pipes = [msp.pipelines[i] for i in members]
        for p in pipes:
            p.refresh_gt_cache()  # pick up regenerated GT masks
        h, w = pipes[0].scene.output_size
        lo, hi = pipes[0]._crop_lo, pipes[0]._crop_hi
        S = len(pipes)
        n_scene_shards = mesh.shape["scenes"]
        n_frame_shards = mesh.shape["frames"]
        Sp = -(-S // n_scene_shards) * n_scene_shards
        # frame-chunk rows per dispatch: the fleet chunk, padded to shard
        K = max(msp.chunk, n_frame_shards)
        K = -(-K // n_frame_shards) * n_frame_shards

        def padS(a):
            return np.pad(a, [(0, Sp - S)] + [(0, 0)] * (a.ndim - 1))

        pts_p, valid_p = padS(pts), padS(valid)
        A_p, B_p, fv_p = padS(A), padS(B), padS(fv)
        padF = (-fv_p.shape[1]) % K  # frame axis to a chunk multiple
        if padF:
            A_p = np.pad(A_p, [(0, 0), (0, padF)] + [(0, 0)] * (A_p.ndim - 2))
            A_p[:, -padF:] = np.eye(4)  # keep pad matrices well-formed
            B_p = np.pad(B_p, [(0, 0), (0, padF)] + [(0, 0)] * (B_p.ndim - 2))
            fv_p = np.pad(fv_p, [(0, 0), (0, padF)])

        # fleet-wide crop compaction, same consult-only rule as the other
        # forms (pipeline.crop_compact_k never dispatches counting)
        k1 = None
        if self.compact == "auto":
            ks = [p.crop_compact_k(source) for p in pipes]
            if ks and all(k is not None for k in ks):
                k1 = max(ks)
                if k1 * 2 > pts.shape[1]:
                    k1 = None
        # key the compiled step by the mesh's SHAPE + device ids, not id():
        # a garbage-collected mesh's id can be reused by a differently-laid-
        # out successor, which would silently serve a step compiled for the
        # old axis extents
        mesh_key = (tuple(mesh.shape.items()),
                    tuple(d.id for d in mesh.devices.flat))
        step_key = (mesh_key, w, h, self.max_radius, self.tolerance,
                    self.distance, k1)
        step = self._sharded_steps.get(step_key)
        if step is None:
            step = self._sharded_steps[step_key] = sharded_scene_batch_metrics(
                mesh, w, h, self.max_radius, self.tolerance, self.distance,
                k1=k1)

        sums = [dict() for _ in range(S)]
        counts = [0] * S
        C = len(pipes[0].scene.camera_list)
        # upload the fleet point tensors ONCE — they are identical for every
        # chunk, and re-transferring ~S x 3 MB per chunk through the ~30 ms
        # tunneled link would dominate the dispatch wave
        ptsj, validj = jnp.asarray(pts_p), jnp.asarray(valid_p)
        for s in range(0, fv_p.shape[1], K):
            # host GT rows for every (scene, frame-in-chunk); row validity =
            # frame valid AND complete GT (GT-less rows contribute nothing,
            # matching evaluate_scene_batch's skip)
            gt = np.zeros((Sp, K, C, h, w), bool)
            rv = np.zeros((Sp, K), np.float32)
            any_gt = False
            with self.timers.phase("eval_gt_load"):
                for mi_s, (fm, F) in enumerate(zip(fms, Fs)):
                    for kk in range(K):
                        fidx = s + kk
                        if fidx >= F or not fm.frame_valid[fidx]:
                            continue
                        ids = self._load_all_cameras(
                            pipes[mi_s], int(fm.frame_indices[fidx]))
                        if ids is None:
                            continue
                        gt[mi_s, kk] = ids > 0
                        rv[mi_s, kk] = 1.0
                        counts[mi_s] += 1
                        any_gt = True
            if not any_gt:
                continue
            with self.timers.phase("eval_dispatch"):
                sl = slice(s, s + K)
                p = step(ptsj, validj,
                         jnp.asarray(gt),
                         jnp.asarray(A_p[:, sl], np.float32),
                         jnp.asarray(B_p[:, sl], np.float32),
                         jnp.asarray(rv > 0), lo, hi)
            with self.timers.phase("eval_fetch"):
                p = jax.device_get(p)
            for mi_s in range(S):
                for k2, v2 in p.items():
                    sums[mi_s][k2] = sums[mi_s].get(k2, 0.0) + float(v2[mi_s])

        results = [None] * len(msp.pipelines)
        for mi_s, gi in enumerate(members):
            if counts[mi_s] == 0:
                continue
            out = reduce_metrics([sums[mi_s]])
            out["frames_evaluated"] = counts[mi_s]
            results[gi] = out
        return results


def main(argv=None):
    """Map-quality evaluation script (the CAMAv2 release notes' "evaluation
    scripts (SRE, precision, recall, F1-score)", README.md:19-20)."""
    import argparse
    import json

    from cama_tpu.pipeline import ClipPipeline

    parser = argparse.ArgumentParser(description="SRE / precision / recall / F1 map evaluation")
    parser.add_argument("--clip", required=True, help="clip directory")
    parser.add_argument("--source", default="cama", choices=["cama", "nuscenes"])
    parser.add_argument("--tolerance", type=int, default=5, help="hit radius (px)")
    parser.add_argument("--max-radius", type=int, default=20, help="SRE distance cap (px)")
    parser.add_argument("--distance", default="chebyshev",
                        choices=["chebyshev", "euclidean"],
                        help="point->mask metric: chebyshev (dilation rounds, "
                             "cheapest) or euclidean (exact EDT)")
    parser.add_argument("--instances", action="store_true",
                        help="also report instance-level association metrics")
    parser.add_argument("--backend", default="device",
                        choices=["device", "host"],
                        help="'host' = NumPy/SciPy evaluation (no "
                             "accelerator, no compile wait); full surface "
                             "incl. --instances with the default 'nearest' "
                             "assignment")
    parser.add_argument("--compact", default="auto",
                        choices=["auto", "off"],
                        help="'auto' (default) bounds per-point metric work "
                             "to the per-frame crop survivors on long-range "
                             "scenes (metrics identical); 'off' forces "
                             "full-P projections")
    args = parser.parse_args(argv)

    pipe = ClipPipeline(clip_path=args.clip)
    ev = MapEvaluator(tolerance=args.tolerance, max_radius=args.max_radius,
                      distance=args.distance, backend=args.backend,
                      compact=args.compact)
    if args.instances:  # one pass computes both metric families
        result = ev.evaluate_scene_all(pipe, args.source)
    else:
        result = ev.evaluate_scene(pipe, args.source)
    import math

    # NaN (no frames/points evaluated) must serialize as null — bare NaN
    # tokens are not valid JSON and break strict consumers (jq etc.)
    print(json.dumps({
        k: (None if isinstance(v, float) and not math.isfinite(v)
            else round(v, 4) if isinstance(v, float) else v)
        for k, v in result.items()}))


if __name__ == "__main__":
    main()
