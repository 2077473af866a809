"""Pallas TPU kernel: single-pass fused project + dedup + compact.

The production two-stage overlay kernel (pipeline._overlay_chunk_two_stage)
spends its device time moving points it is about to throw away: at 1M points
the measured split is ~1.1 ms for the P-wide stage-1 sort, ~2.1 ms for the
k1 gather + 6-camera re-projection, and ~2.2 ms for the six k1-wide
dedup-compaction sorts, against ~0.9 ms of actual scatter+dilate raster work
(BENCH.md round-5 device lane).  Every sort in that chain exists only to
implement a STABLE COMPACTION — "move the kept points to the front without
reordering them" — which a sequential single pass does in O(P).

This kernel is that single pass.  Per frame, one launch streams the point
set tile-by-tile through VMEM exactly once and emits the final compacted
paint list:

  1. crop test + all-camera projection on the MXU ([4,4] and [C*4,4] against
     [4, TILE], like ops/pallas_project.py — points-minor layout so the
     128-lane axis is the point axis),
  2. per-camera keep masks, integer pixel encodings, and the
     consecutive-duplicate suppression of ops.raster._encode_effective
     (successor kept & same pixel) on the VPU — original-adjacency
     semantics, with the tile-boundary successor handled by deferring each
     tile's last lane to the next grid step (carried in SMEM),
  3. stable compaction of the union survivor rows via one-hot matmuls on
     the MXU (the classic TPU compaction idiom: destination = running
     cumsum, permutation matrix × payload) — run as a SINGLE bf16 pass by
     splitting each 24-bit encoding into three bytes (each exact in bf16;
     each output row has at most one nonzero term, accumulated in f32, so
     the product and sum are exact) and reassembling after the dot,
  4. a bump-offset store of each tile's survivors at a dynamic ROW offset
     of the output list, which lives ENTIRELY in VMEM across grid steps
     (grid steps run sequentially on a TensorCore, so the running offset in
     SMEM is race-free; dynamic sublane-axis stores are the one dynamic
     indexing form Mosaic supports everywhere — lane-axis dynamic stores
     and dynamic-offset DMA both fail to compile on this runtime, probed
     round 5).

Output is a [K, 8] float32 "union list": column c holds enc+1 for camera c
(0 = not kept by that camera), rows are crop∪image survivors in original
point order — so a row index IS the paint priority, and
`rasterize_from_union` feeds it straight into the existing
ops.raster.rasterize_from_compact scatter.  Suppression differences vs the
two-stage path (which dedups adjacency in the crop-compacted subsequence,
not original adjacency) cannot change the raster: a suppressed point's
pixel is always repainted by its suppressor, which has higher paint
priority either way.  `fused_compact_mirror` is the XLA reference
implementation (identical output contract AND identical contraction shapes,
so the projection arithmetic matches bit-for-bit) used by the CPU tests and
any backend where the kernel is unavailable.

Reference anchor: the reprojection protocol being accelerated is
/root/reference/cama/reproject.py:118-205 (crop box, projection, masks);
the paint-order contract is cv2 draw order (reproject.py:207-233).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cama_tpu.ops.raster import MAX_CLS

TILE = 8192   # points per grid step (HBM stream granularity)
SUB = 128     # one-hot compaction block (M is [SUB, SUB]; compaction work
              # scales as TILE*SUB, so the smallest MXU-native block wins)
N_COLS = 8    # payload columns: C cameras + zero padding to a full f32 tile
VMEM_K_LIMIT = 262144  # union list rows the VMEM accumulator can hold (8 MB)


def _cumsum_lanes(x, n):
    """Inclusive cumsum along the lane axis of a [1, n] int32 vector via
    log2(n) rotate-and-masked-add passes (Mosaic has no cumsum lowering)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    s = 1
    while s < n:
        x = x + jnp.where(lane >= s, pltpu.roll(x, shift=s, axis=1), 0)
        s *= 2
    return x


def _kernel(pm_ref, am_ref, bounds_ref, pts_ref, valid_ref, cls_ref,
            out_ref, cnt_ref,
            pend_keep, pend_pix, pend_enc, goff,
            *, n_cam, width, height):
    """One point tile: project, dedup, compact, bump-append into out_ref.

    pm_ref:     [C*4, 4] stacked world->pixel matrices (row-padded)
    am_ref:     [4, 4]   world->chassis
    bounds_ref: [2, 4]   crop lo/hi rows (xyz + pad)
    pts_ref:    [4, TILE] homogeneous world points
    valid_ref:  [1, TILE] int32 validity (1/0)
    cls_ref:    [1, TILE] int32 class ids
    out_ref:    [K_pad, N_COLS] f32 union list — VMEM-resident across the
                whole grid (constant index_map), appended at dynamic row
                offsets
    cnt_ref:    [1, 1] int32 union survivor count (written at the last step)
    scratch: pend_{keep,pix,enc} SMEM [N_COLS] i32, goff SMEM [1] i32.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        goff[0] = 0
        for c in range(N_COLS):
            pend_keep[c] = 0
            pend_pix[c] = -1
            pend_enc[c] = 0

    pts = pts_ref[:]                                   # [4, TILE]
    xyz = jax.lax.dot(am_ref[:], pts, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    lo = bounds_ref[0, :]
    hi = bounds_ref[1, :]
    in_crop = (
        (xyz[0, :] >= lo[0]) & (xyz[0, :] <= hi[0])
        & (xyz[1, :] >= lo[1]) & (xyz[1, :] <= hi[1])
        & (xyz[2, :] >= lo[2]) & (xyz[2, :] <= hi[2])
    )[None, :]                                         # [1, TILE]

    proj = jax.lax.dot(pm_ref[:], pts, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # [C*4, TILE]
    valid = valid_ref[:] > 0                           # [1, TILE]
    cls_i = cls_ref[:]                                 # [1, TILE] i32

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    not_last_lane = lane < (TILE - 1)

    # ---- per-camera masks, pixel codes, original-adjacency dedup ----
    keep_c, pix_c, enc1_c, eff_c = [], [], [], []
    union = None
    for c in range(n_cam):
        x = proj[4 * c + 0, :][None, :]
        y = proj[4 * c + 1, :][None, :]
        z = proj[4 * c + 2, :][None, :]
        mask_z = z > 0
        safe_z = jnp.where(mask_z, z, 1.0)
        u = x / safe_z
        v = y / safe_z
        keep = (mask_z & (u >= 0) & (u < width) & (v >= 0) & (v < height)
                & in_crop & valid)
        vi = v.astype(jnp.int32)
        ui = u.astype(jnp.int32)
        pix = jnp.where(keep, vi * width + ui, -1)
        enc1 = pix * MAX_CLS + cls_i + 1               # valid lanes: >= 1
        # successor (original order): lane i+1; lane TILE-1 wraps to lane 0
        # but is excluded below (deferred to the next tile via pend).
        # Mosaic's dynamic_rotate only handles 32-bit lanes — roll the i32
        # form of the keep mask, not the i1 vector.
        succ_keep = pltpu.roll(keep.astype(jnp.int32), shift=TILE - 1,
                               axis=1) == 1
        succ_pix = pltpu.roll(pix, shift=TILE - 1, axis=1)
        eff = keep & jnp.logical_not(succ_keep & (succ_pix == pix))
        eff = eff & not_last_lane
        keep_c.append(keep)
        pix_c.append(pix)
        enc1_c.append(enc1)
        eff_c.append(eff)
        union = eff if union is None else (union | eff)

    # ---- resolve the deferred last lane of the PREVIOUS tile ----
    # (scalar reads must be 32-bit on Mosaic: bool vectors can't be squeezed)
    keep_i = [k.astype(jnp.int32) for k in keep_c]
    pend_u = jnp.int32(0)
    pend_vals = []
    for c in range(n_cam):
        k0 = keep_i[c][0, 0] == 1
        p0 = pix_c[c][0, 0]
        eff_p = (pend_keep[c] == 1) & jnp.logical_not(k0 & (p0 == pend_pix[c]))
        pend_vals.append(jnp.where(eff_p, pend_enc[c], 0).astype(jnp.float32))
        pend_u = pend_u | eff_p.astype(jnp.int32)
    pend_row = jnp.concatenate(
        [v.reshape(1, 1) for v in pend_vals]
        + [jnp.zeros((1, N_COLS - n_cam), jnp.float32)], axis=1)  # [1, N_COLS]

    g = goff[0]

    @pl.when(pend_u > 0)
    def _():
        out_ref[pl.ds(g, 1), :] = pend_row

    # ---- stash THIS tile's last lane as the next tile's pend ----
    # (safe even on the final tile: the wrapper pads with >=1 invalid lane,
    # so the final tile's last lane is never a kept point)
    for c in range(n_cam):
        pend_keep[c] = keep_i[c][0, TILE - 1]
        pend_pix[c] = pix_c[c][0, TILE - 1]
        pend_enc[c] = enc1_c[c][0, TILE - 1]

    # ---- stable compaction: one-hot matmul per SUB block ----
    # Payload enc values are < 2^24 (guarded in the wrapper), so they split
    # exactly into three 8-bit components, each exact in bf16 — which lets
    # the one-hot compaction run as a SINGLE bf16 MXU pass instead of the
    # 6-pass f32 (HIGHEST) emulation (measured 0.84 ms/frame at 1M points).
    # Column layout: byte b of camera c lives at column 8*b + c.
    enc_eff = [jnp.where(eff_c[c], enc1_c[c], 0) for c in range(n_cam)]
    payload_rows = []
    for b in range(3):
        for c in range(n_cam):
            payload_rows.append(
                ((enc_eff[c] >> (8 * b)) & 0xFF).astype(jnp.float32))
        payload_rows += [jnp.zeros((1, TILE), jnp.float32)] * (N_COLS - n_cam)
    payload = jnp.concatenate(payload_rows, axis=0).astype(jnp.bfloat16)
    # [3*N_COLS, TILE], lane-major — contracted via transpose-rhs dot_general
    # so no [TILE, 3*N_COLS] relayout is ever materialized

    cs = _cumsum_lanes(union.astype(jnp.int32), TILE)  # [1, TILE]
    total = cs[0, TILE - 1]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    for s in range(TILE // SUB):
        sl = slice(s * SUB, (s + 1) * SUB)
        c0 = cs[0, s * SUB - 1] if s else jnp.int32(0)
        cnt = cs[0, (s + 1) * SUB - 1] - c0
        d_rel = cs[:, sl] - c0 - 1                     # [1, SUB]
        # M[d, i] = 1 iff block-lane i is a union survivor destined to
        # block-row d; each output row has at most one nonzero term, M is
        # exactly 0/1 and every payload component is an integer < 256 —
        # all exact in bf16, accumulated in f32 — so the single-pass bf16
        # matmul is exact.  Reassemble the three bytes afterwards.
        M = ((row_iota == d_rel) & union[:, sl]).astype(jnp.bfloat16)
        blk3 = jax.lax.dot_general(
            M, payload[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [SUB, 3*N_COLS]
        blk = (blk3[:, 0:N_COLS] + 256.0 * blk3[:, N_COLS:2 * N_COLS]
               + 65536.0 * blk3[:, 2 * N_COLS:3 * N_COLS])      # [SUB, N_COLS]

        @pl.when(cnt > 0)
        def _(blk=blk, c0=c0):
            out_ref[pl.ds(g + pend_u + c0, SUB), :] = blk

    goff[0] = g + pend_u + total

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        cnt_ref[0, 0] = g + pend_u + total


@partial(jax.jit, static_argnames=("width", "height", "k_cap", "interpret"))
def fused_compact_project(points4_T, valid, cls, A, B, width, height,
                          crop_lo, crop_hi, k_cap, interpret=None):
    """Single-pass fused overlay front end for ONE frame.

    Args:
        points4_T: [4, P] float32 homogeneous world points
        valid:     [P] bool
        cls:       [P] int32 class ids (< ops.raster.MAX_CLS)
        A:         [4, 4] float32 world->chassis
        B:         [C, 3, 4] float32 world->pixel per camera (C <= 8)
        width/height: static output image size
        crop_lo/crop_hi: [3] float32 chassis crop box (inclusive)
        k_cap:     static union-survivor budget (from count_union_chunk);
                   count > k_cap means overflow — fall back to a dense path,
                   same contract as ops.raster.compact_points.
    Returns:
        vals [k_cap, 8] float32 — column c = enc+1 for camera c on the union
            survivor rows (original point order = paint priority),
            0 = not kept; rows >= count are garbage (mask by count).
        count [] int32 — true union survivor total.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    P0 = points4_T.shape[1]
    C = B.shape[0]
    if C > N_COLS:
        raise ValueError(f"fused kernel supports <= {N_COLS} cameras, got {C}")
    if width * height * MAX_CLS >= 1 << 24:
        # enc values must be exact both in the f32 union list and in the
        # kernel's 3-byte compaction split
        raise ValueError(
            f"output {width}x{height} overflows the 24-bit pixel encoding; "
            f"use the two-stage kernel")
    # the output list lives in VMEM for the whole launch; SUB of headroom
    # lets the last block write a full [SUB, N_COLS] slab without clamping
    k_pad = k_cap + SUB
    if k_pad > VMEM_K_LIMIT:
        raise ValueError(
            f"k_cap {k_cap} exceeds the VMEM union-list budget "
            f"({VMEM_K_LIMIT - SUB}); use the two-stage kernel for this scene")
    # pad so P % TILE == 0 AND the global last lane is invalid (the kernel
    # defers each tile's last lane to the next step; a kept point in the
    # very last lane would otherwise be dropped)
    pad = (-(P0 + 1)) % TILE + 1
    points4_T = jnp.pad(points4_T, ((0, 0), (0, pad)))
    valid = jnp.pad(valid, (0, pad))
    cls = jnp.pad(cls.astype(jnp.int32), (0, pad))
    P = P0 + pad

    B4 = jnp.concatenate([B, jnp.zeros((C, 1, 4), B.dtype)], axis=1)
    pm = B4.reshape(C * 4, 4)
    bounds = jnp.stack(
        [jnp.concatenate([jnp.asarray(crop_lo, jnp.float32), jnp.zeros(1, jnp.float32)]),
         jnp.concatenate([jnp.asarray(crop_hi, jnp.float32), jnp.zeros(1, jnp.float32)])])

    vals, count = pl.pallas_call(
        partial(_kernel, n_cam=C, width=width, height=height),
        grid=(P // TILE,),
        in_specs=[
            pl.BlockSpec((C * 4, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k_pad, N_COLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_pad, N_COLS), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((N_COLS,), jnp.int32),                 # pend_keep
            pltpu.SMEM((N_COLS,), jnp.int32),                 # pend_pix
            pltpu.SMEM((N_COLS,), jnp.int32),                 # pend_enc
            pltpu.SMEM((1,), jnp.int32),                      # goff
        ],
        interpret=interpret,
    )(pm, A, bounds, points4_T,
      valid.astype(jnp.int32)[None, :], cls[None, :])
    return vals[:k_cap], count[0, 0]


def fused_compact_mirror(points, valid, cls, A, B, width, height,
                         crop_lo, crop_hi, k_cap):
    """XLA reference for fused_compact_project — identical output contract,
    implemented with the existing sort-based compaction.  Uses the KERNEL's
    exact contraction shapes ([4,4]@[4,P] and [C*4,4]@[4,P] HIGHEST dots)
    so the f32 projection arithmetic matches the kernel bit-for-bit; tests
    assert bit-equality in interpret mode and on the chip."""
    from cama_tpu.ops.raster import _encode_effective

    P = points.shape[0]
    C = B.shape[0]
    p4T = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1).T
    xyz = jax.lax.dot(A, p4T, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    in_crop = ((xyz[0] >= crop_lo[0]) & (xyz[0] <= crop_hi[0])
               & (xyz[1] >= crop_lo[1]) & (xyz[1] <= crop_hi[1])
               & (xyz[2] >= crop_lo[2]) & (xyz[2] <= crop_hi[2]))
    B4 = jnp.concatenate([B, jnp.zeros((C, 1, 4), B.dtype)], axis=1)
    proj = jax.lax.dot(B4.reshape(C * 4, 4), p4T,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    xyw = proj.reshape(C, 4, P)
    z = xyw[:, 2]
    mask_z = z > 0
    safe_z = jnp.where(mask_z, z, 1.0)
    u = xyw[:, 0] / safe_z
    v = xyw[:, 1] / safe_z
    keep = (mask_z & (u >= 0) & (u < width) & (v >= 0) & (v < height)
            & in_crop[None, :] & valid[None, :])
    vu = jnp.stack([v, u], axis=-1)                    # [C, P, 2]
    enc, eff = _encode_effective(vu, keep, jnp.broadcast_to(cls, (C, P)),
                                 width, height)
    enc1 = jnp.where(eff, enc + 1, 0)                  # [C, P]
    union = eff.any(axis=0)
    order = jnp.arange(P, dtype=jnp.int32)
    skey = jax.lax.sort(jnp.where(union, order, P + order))[:k_cap]
    ok = skey < P
    idx = jnp.where(ok, skey, 0)
    vals = jnp.where(ok[None, :], enc1[:, idx], 0).astype(jnp.float32)
    vals8 = jnp.concatenate(
        [vals, jnp.zeros((N_COLS - C, k_cap), jnp.float32)], axis=0)
    return vals8.T, union.sum().astype(jnp.int32)


@partial(jax.jit, static_argnames=("width", "height"))
def count_union_chunk(points, valid, cls, A, B, frame_valid,
                      crop_lo, crop_hi, width, height):
    """Max union-survivor count over a chunk of frames — sizes k_cap for the
    fused kernel, same role as pipeline._count_chunk for the two-stage path
    (sort-free, so the counting program compiles fast).  Uses the kernel's
    contraction shapes so borderline keep bits agree with what the kernel
    will actually emit."""
    from cama_tpu.ops.raster import _encode_effective

    P = points.shape[0]
    p4T = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1).T

    def per_frame(args):
        Af, Bf, fv = args
        C = Bf.shape[0]
        xyz = jax.lax.dot(Af, p4T, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        in_crop = ((xyz[0] >= crop_lo[0]) & (xyz[0] <= crop_hi[0])
                   & (xyz[1] >= crop_lo[1]) & (xyz[1] <= crop_hi[1])
                   & (xyz[2] >= crop_lo[2]) & (xyz[2] <= crop_hi[2]))
        B4 = jnp.concatenate([Bf, jnp.zeros((C, 1, 4), Bf.dtype)], axis=1)
        proj = jax.lax.dot(B4.reshape(C * 4, 4), p4T,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        xyw = proj.reshape(C, 4, P)
        z = xyw[:, 2]
        mask_z = z > 0
        safe_z = jnp.where(mask_z, z, 1.0)
        u = xyw[:, 0] / safe_z
        v = xyw[:, 1] / safe_z
        keep = (mask_z & (u >= 0) & (u < width) & (v >= 0) & (v < height)
                & in_crop[None, :] & valid[None, :] & fv)
        vu = jnp.stack([v, u], axis=-1)
        _, eff = _encode_effective(
            vu, keep, jnp.broadcast_to(cls, (C, P)), width, height)
        return eff.any(axis=0).sum().astype(jnp.int32)

    return jax.lax.map(per_frame, (A, B, frame_valid)).max()


def rasterize_from_union(vals, count, n_cam, width, height, prio_offset=0):
    """Dense packed raster from the fused kernel's union list: convert to the
    compact_points value convention (-1 = absent) and reuse the existing
    scatter + dilation (ops.raster.rasterize_from_compact).  Row index is
    the paint priority — identical winners to the per-camera compact path.
    prio_offset biases priorities for point-sharded partial rasters (shards
    are contiguous point slices and the kernel's compaction is stable, so
    shard_index * k_cap keeps the global paint order under pmax)."""
    from cama_tpu.ops.raster import rasterize_from_compact

    K = vals.shape[0]
    live = jnp.arange(K, dtype=jnp.int32)[:, None] < count
    enc1 = vals.astype(jnp.int32)
    cvals = jnp.where(live & (enc1 > 0), enc1 - 1, -1)[:, :n_cam].T  # [C, K]
    return rasterize_from_compact(cvals, width, height,
                                  prio_offset=prio_offset)
