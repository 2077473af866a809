"""Multi-chip scale-out over a jax.sharding.Mesh.

The reference is a single-threaded CPU loop (SURVEY.md §2.4); the TPU-native
equivalents here are:

  * data parallelism over the FRAME axis ("frames" mesh axis): each device
    owns a shard of the clip's frames — the analogue of the reference's outer
    frame loop (cama/dataset.py:88);
  * sequence-parallel-style sharding over the POINT axis ("points" mesh
    axis): the densified polyline point tensor is split across devices, each
    rasterizes a partial overlay, and partial rasters combine with a
    `jax.lax.pmax` collective — valid because the packed raster encodes paint
    priority, so elementwise max across shards == global last-drawn-wins;
  * scene-level metric accumulators reduced with `psum` across the whole mesh.

Collectives ride ICI within a slice; there is no host round-trip anywhere in
the step.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cama_tpu.ops.geometry import crop_compact_project, project_frames
from cama_tpu.ops.raster import (
    MAX_CLS,
    compact_points,
    packed_to_cls,
    rasterize_from_compact,
    rasterize_packed_fast,
)


def make_mesh(n_frames_axis=None, n_points_axis=1, devices=None):
    """Build a ('frames', 'points') mesh.  Defaults to all devices on the
    frames axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_frames_axis is None:
        n_frames_axis = len(devices) // n_points_axis
    n = n_frames_axis * n_points_axis
    arr = np.array(devices[:n]).reshape(n_frames_axis, n_points_axis)
    return Mesh(arr, ("frames", "points"))


def make_scene_mesh(n_scenes_axis=None, n_frames_axis=1, devices=None):
    """Build a ('scenes', 'frames') mesh: data parallelism over the SCENE
    batch axis (SURVEY.md §2.4's DP row names 'scenes for multi-scene sites'
    as the scale-out shape — exactly where MultiScenePipeline's stacked
    tensors and the fleet evaluator batch), with optional frame-axis DP
    inside each scene shard.  Defaults to all devices on the scenes axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_scenes_axis is None:
        n_scenes_axis = len(devices) // n_frames_axis
    n = n_scenes_axis * n_frames_axis
    arr = np.array(devices[:n]).reshape(n_scenes_axis, n_frames_axis)
    return Mesh(arr, ("scenes", "frames"))


def sharded_multi_scene_step(mesh, width, height, k, two_bit=False):
    """Jitted multi-device SCENE-BATCHED overlay step — the sharded form of
    pipeline._overlay_chunk_batched (the CLI's batch_scenes device program):

        (points [S,P,3], valid [S,P], cls [S,P], A [S,F,4,4],
         B [S,F,C,3,4], frame_valid [S,F], crop_lo, crop_hi)
          -> cls rasters [S, F, C, H, W] uint8 (2-bit packed when two_bit)

    The scene axis shards over 'scenes' (each device owns whole scenes'
    point tensors — no cross-device combine is needed because scenes are
    independent), and each scene's frame axis shards over 'frames'.  S must
    divide by mesh.shape['scenes'], F by mesh.shape['frames'].  Every
    per-scene shard runs the SAME compact kernel as the single-device
    batched path on its full local point set, so rasters are bit-identical
    to _overlay_chunk_batched (asserted by __graft_entry__'s 'scenes-dp'
    dryrun tier and tests/test_parallel.py)."""
    # deferred: pipeline imports this module (pad_to_multiple) at load time
    from cama_tpu.pipeline import _overlay_chunk_compact

    def step(points, valid, cls, A, B, frame_valid, crop_lo, crop_hi):
        def one(p, v, c, a, b, f):
            return _overlay_chunk_compact(p, v, c, a, b, f, crop_lo, crop_hi,
                                          width, height, k, two_bit)

        return jax.vmap(one)(points, valid, cls, A, B, frame_valid)

    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(
                P("scenes", None, None),  # points
                P("scenes", None),  # valid
                P("scenes", None),  # cls
                P("scenes", "frames", None, None),  # A
                P("scenes", "frames", None, None, None),  # B
                P("scenes", "frames"),  # frame_valid
                P(), P(),
            ),
            out_specs=P("scenes", "frames", None, None, None),
        )
    )


def _metric_projection(points, valid, Af, Bf, fv, width, height,
                       crop_lo, crop_hi, k1):
    """One frame's projection for a sharded metric step: full-P, or crop-
    compacted to k1 survivors when sizing is provided (the evaluator's
    two-stage — keep requires the crop box, so metric sums are unchanged;
    see eval/map_metrics._project_compact_chunk_eval)."""
    if k1 is not None:
        from cama_tpu.ops.geometry import crop_compact_project_idx

        vu, keep, _ = crop_compact_project_idx(
            points, valid, Af, Bf, fv, width, height, crop_lo, crop_hi, k1)
        return vu, keep
    vu, keep = project_frames(points, valid, Af[None], Bf[None], fv[None],
                              width, height, crop_lo, crop_hi)
    return vu[0], keep[0]


def sharded_scene_batch_metrics(mesh, width, height, max_radius, tolerance,
                                distance="chebyshev", k1=None):
    """Sharded FLEET evaluation step (the multi-device form of
    eval.map_metrics.evaluate_scene_batch's per-chunk device work): scenes
    shard over 'scenes', each scene's frame rows over 'frames'; per-scene
    partial sums reduce over the frames axis only (scene results must stay
    per-scene — a psum over 'scenes' would fuse unrelated scenes' metrics).

        (points [S,P,3], valid [S,P], gt [S,F,C,H,W] bool, A [S,F,4,4],
         B [S,F,C,3,4], frame_valid [S,F], crop_lo, crop_hi)
          -> {metric: [S] float32} per-scene partial sums (replicated on the
             frames axis)
    """
    from cama_tpu.eval.map_metrics import frame_metrics

    def step(points, valid, gt, A, B, frame_valid, crop_lo, crop_hi):
        def per_scene(p, v, gt_s, A_s, B_s, fv_s):
            def per_frame(args):
                gt_f, Af, Bf, fv = args
                vu, keep = _metric_projection(p, v, Af, Bf, fv, width,
                                              height, crop_lo, crop_hi, k1)
                m = frame_metrics(gt_f, vu, keep, max_radius,
                                  tolerance, distance)
                z = fv.astype(jnp.float32)  # GT-less rows contribute nothing
                return {k2: v2 * z for k2, v2 in m.items()}

            partials = jax.lax.map(per_frame, (gt_s, A_s, B_s, fv_s))
            return {k2: v2.sum() for k2, v2 in partials.items()}

        local = jax.vmap(per_scene)(points, valid, gt, A, B, frame_valid)
        return {k2: jax.lax.psum(v2, axis_name="frames")
                for k2, v2 in local.items()}

    keys = ["sre_sum", "n_points", "n_hit", "gt_total", "gt_covered"]
    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(
                P("scenes", None, None),  # points
                P("scenes", None),  # valid
                P("scenes", "frames", None, None, None),  # gt
                P("scenes", "frames", None, None),  # A
                P("scenes", "frames", None, None, None),  # B
                P("scenes", "frames"),  # frame_valid
                P(), P(),
            ),
            out_specs={k2: P("scenes") for k2 in keys},
        )
    )


def pad_to_multiple(arr, multiple, axis=0, fill=0):
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


def sharded_map_metrics(mesh, width, height, max_radius, tolerance,
                        distance="chebyshev", k1=None):
    """Multi-device SRE/precision/recall partials: frames sharded over the
    'frames' axis (gt masks + frame matrices per shard), partial sums psum'd
    into replicated scene totals — the north-star "SRE/F1 as on-device
    reductions over reprojected masks" (BASELINE.json).

    Step signature:
        (points [P,3], valid [P], gt [F,C,H,W] bool, A [F,4,4], B [F,C,3,4],
         frame_valid [F], crop_lo, crop_hi)
          -> dict of replicated scalars (sre_sum, n_points, n_hit, gt_total,
             gt_covered)
    """
    from cama_tpu.eval.map_metrics import frame_metrics

    def step(points, valid, gt, A, B, frame_valid, crop_lo, crop_hi):
        def per_frame(args):
            gt_f, Af, Bf, fv = args
            vu, keep = _metric_projection(points, valid, Af, Bf, fv, width,
                                          height, crop_lo, crop_hi, k1)
            p = frame_metrics(gt_f, vu, keep, max_radius, tolerance,
                              distance)
            # masked-out frames contribute nothing
            z = fv.astype(jnp.float32)
            return {k: v * z for k, v in p.items()}

        partials = jax.lax.map(per_frame, (gt, A, B, frame_valid))
        return {k: jax.lax.psum(v.sum(), axis_name="frames") for k, v in partials.items()}

    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(
                P(), P(),  # points, valid replicated (metrics need all points)
                P("frames", None, None, None),  # gt masks
                P("frames", None, None),  # A
                P("frames", None, None, None),  # B
                P("frames"),  # frame_valid
                P(), P(),
            ),
            out_specs={k: P() for k in
                       ["sre_sum", "n_points", "n_hit", "gt_total", "gt_covered"]},
        )
    )


def sharded_overlay_step(mesh, width, height, kernel="fast", k=2048, k1=None):
    """Build the jitted multi-device step:
        (points, valid, cls, A, B, frame_valid, crop_lo, crop_hi)
          -> (cls_rasters [F, C, H, W] uint8 sharded over frames,
              painted_per_class [MAX_CLS] int32 replicated psum)

    F must divide by mesh.shape['frames']; P by mesh.shape['points'].

    kernel: 'fast' (scatter-max + dilation, sort-free), 'compact' (per-shard
    dedup+sort-compact to `k` entries, K-entry scatter), 'two_stage'
    (crop-first compaction to `k1` survivors per shard before the six
    per-camera compactions — the long-range-scene kernel), or 'fused' (the
    production single-pass Pallas kernel, ops/fused_compact.py, on each
    local point shard; `k` caps the per-shard union list).  Cross-shard
    paint order stays globally correct in all four: 'fast' offsets
    priorities by the shard's first point index; the compacting kernels
    offset by shard_index * k (shards are contiguous point slices and every
    compaction is stable, so any inter-shard order consistent with the
    slice order is the sequential order).  A shard-boundary duplicate pixel
    that single-device dedup would drop paints identically under pmax — the
    successor's higher priority wins the same pixel — so class rasters are
    bit-identical to the single-device paths (tests/test_parallel.py).
    """
    if kernel == "two_stage" and k1 is None:
        raise ValueError("two_stage needs k1 (per-shard crop-survivor budget)")

    def step(points, valid, cls, A, B, frame_valid, crop_lo, crop_hi):
        # local shards: points [P/p, 3]; A [F/f, 4, 4]; B [F/f, C, 3, 4]
        shard_offset = jax.lax.axis_index("points") * points.shape[0]

        def per_frame(args):
            Af, Bf, fv = args
            if kernel == "fused":
                from cama_tpu.ops.fused_compact import (
                    fused_compact_project,
                    rasterize_from_union,
                )

                p4T = jnp.concatenate(
                    [points, jnp.ones_like(points[:, :1])], axis=-1).T
                vals, cnt = fused_compact_project(
                    p4T, valid & fv, cls, Af, Bf, width, height,
                    crop_lo, crop_hi, k)
                packed = rasterize_from_union(
                    vals, cnt, B.shape[1], width, height,
                    prio_offset=jax.lax.axis_index("points") * k)
                return jax.lax.pmax(packed, axis_name="points")
            if kernel == "two_stage":
                # stage 1+2 on the local point shard (shared helper keeps the
                # precision-sensitive math identical to the single-device
                # kernel); stable compactions preserve paint order
                vu_sel, keep, cls_sel = crop_compact_project(
                    points, valid, cls, Af, Bf, fv, width, height,
                    crop_lo, crop_hi, k1,
                )
                vals, _ = compact_points(vu_sel, keep, cls_sel, width, height, k)
                packed = rasterize_from_compact(
                    vals, width, height,
                    prio_offset=jax.lax.axis_index("points") * k,
                )
                return jax.lax.pmax(packed, axis_name="points")
            vu, keep = project_frames(
                points, valid, Af[None], Bf[None], fv[None], width, height,
                crop_lo, crop_hi,
            )
            if kernel == "compact":
                vals, _ = compact_points(vu[0], keep[0], cls, width, height, k)
                packed = rasterize_from_compact(
                    vals, width, height,
                    prio_offset=jax.lax.axis_index("points") * k,
                )
            else:
                packed = rasterize_packed_fast(
                    vu[0], keep[0], cls, width, height, prio_offset=shard_offset
                )
            # combine partial rasters across the point shards: packed values
            # are paint priorities, so elementwise max == sequential order
            packed = jax.lax.pmax(packed, axis_name="points")
            return packed

        packed = jax.lax.map(per_frame, (A, B, frame_valid))  # [F/f, C, H, W]
        rasters = packed_to_cls(packed)
        counts = jnp.zeros((MAX_CLS,), jnp.int32)
        painted = packed >= 0
        counts = counts.at[jnp.where(painted, packed % MAX_CLS, MAX_CLS)].add(1, mode="drop")
        counts = jax.lax.psum(counts, axis_name="frames")
        # already identical across 'points' members after pmax; psum would
        # multiply-count, so divide is avoided by only reducing over 'frames'
        return rasters, counts

    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(
                P("points", None),  # points
                P("points"),  # valid
                P("points"),  # cls
                P("frames", None, None),  # A
                P("frames", None, None, None),  # B
                P("frames"),  # frame_valid
                P(),  # crop_lo
                P(),  # crop_hi
            ),
            out_specs=(P("frames", None, None, None), P()),
            # the fused kernel's pallas_call does not annotate its outputs'
            # varying-across-mesh axes; skip the static vma check (the
            # pmax/psum combines define the cross-shard semantics explicitly)
            **({"check_vma": False} if kernel == "fused" else {}),
        )
    )
