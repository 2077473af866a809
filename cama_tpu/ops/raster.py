"""On-device overlay rasterization with deterministic paint order.

The reference paints filled radius-2 circles per projected point with
cv2.circle in instance-major order, later circles overwriting earlier ones
(cama/reproject.py:246-257).  A naive parallel scatter loses that order, so we
scatter-MAX a packed priority value instead:

    packed = point_flat_index * NUM_CLS + class_id

Point flat index is monotone in (instance, point) order, so per-pixel max ==
"last drawn wins" — exactly cv2's overwrite semantics — while staying one
fixed-shape `scatter_max` per image.  The circle footprint is cv2's radius-2
disk, a 13-pixel diamond (probed from OpenCV, see tests/test_raster.py), and
circles clip at image borders like cv2 does.

Color lookup at composite time replicates the reference quirk that any class
other than "lane_marking" renders with the "Crosswalk_Line" color
(cama/reproject.py:251-252).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# cv2.circle(radius=2, thickness=-1) footprint: (dy, dx) offsets
CIRCLE_R2_OFFSETS = np.array(
    [(-2, 0)]
    + [(-1, dx) for dx in (-1, 0, 1)]
    + [(0, dx) for dx in (-2, -1, 0, 1, 2)]
    + [(1, dx) for dx in (-1, 0, 1)]
    + [(2, 0)],
    dtype=np.int32,
)  # [13, 2]

MAX_CLS = 8  # packing stride; class ids must stay below this


@partial(jax.jit, static_argnames=("width", "height"))
def rasterize_packed(vu, keep, cls, width, height, prio_offset=0):
    """Rasterize one frame-camera batch of points into packed int32 buffers.

    Args:
        vu:   [..., P, 2] float32 (v, u) projected coordinates
        keep: [..., P] bool
        cls:  [P] int32 class ids (< MAX_CLS)
        width/height: static ints
        prio_offset: global index of this batch's first point — lets
            point-sharded partial rasters keep globally correct paint order
            (combined later with elementwise max)

    Returns:
        packed [..., height, width] int32; -1 where unpainted, else
        (prio_offset + point_index) * MAX_CLS + class_id of the topmost
        (last-drawn) point.
    """
    P = vu.shape[-2]
    vi = vu[..., 0].astype(jnp.int32)  # reference: points.astype(np.int32)
    ui = vu[..., 1].astype(jnp.int32)
    prio = (prio_offset + jnp.arange(P, dtype=jnp.int32)) * MAX_CLS + cls  # [P]
    prio = jnp.broadcast_to(prio, vu.shape[:-1])

    offs = jnp.asarray(CIRCLE_R2_OFFSETS)  # [13, 2]
    yy = vi[..., None] + offs[:, 0]  # [..., P, 13]
    xx = ui[..., None] + offs[:, 1]
    inside = (yy >= 0) & (yy < height) & (xx >= 0) & (xx < width) & keep[..., None]
    flat_idx = yy * width + xx
    # route dropped samples to a dump slot past the image
    flat_idx = jnp.where(inside, flat_idx, height * width)

    def one_image(idx2d, pr2d):
        buf = jnp.full((height * width + 1,), -1, dtype=jnp.int32)
        buf = buf.at[idx2d.reshape(-1)].max(
            jnp.broadcast_to(pr2d[..., None], idx2d.shape).reshape(-1),
            mode="drop",
        )
        return buf[:-1].reshape(height, width)

    batch_shape = vu.shape[:-2]
    idx_flat = flat_idx.reshape((-1,) + flat_idx.shape[-2:])
    prio_flat = prio.reshape((-1, P))
    out = jax.vmap(one_image)(idx_flat, prio_flat)
    return out.reshape(batch_shape + (height, width))


def _plus_dilate(img):
    """One round of max-dilation with the 3x3 plus stencil; out-of-image
    contributions are -1 (no paint), matching cv2's border clipping."""
    n = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), constant_values=-1)
    return jnp.maximum(
        img,
        jnp.maximum(
            jnp.maximum(n[..., :-2, 1:-1], n[..., 2:, 1:-1]),
            jnp.maximum(n[..., 1:-1, :-2], n[..., 1:-1, 2:]),
        ),
    )


@partial(jax.jit, static_argnames=("width", "height"))
def rasterize_packed_fast(vu, keep, cls, width, height, prio_offset=0):
    """Same output as `rasterize_packed`, restructured for the TPU:

    The radius-2 cv2 disk is exactly the L1 ball {|dy|+|dx| <= 2}, i.e. two
    successive dilations by the 3x3 plus stencil.  So instead of scattering 13
    samples per point (scatter is the TPU's weakest op), scatter each point's
    packed priority ONCE at its center pixel and then run two rounds of
    plus-shaped max-dilation — dense VPU work.  max-dilation of the
    center-scatter == per-pixel max over covering points == last-drawn-wins.
    """
    P = vu.shape[-2]
    vi = vu[..., 0].astype(jnp.int32)
    ui = vu[..., 1].astype(jnp.int32)
    prio = (prio_offset + jnp.arange(P, dtype=jnp.int32)) * MAX_CLS + cls
    prio = jnp.broadcast_to(prio, vu.shape[:-1])
    # in-image guard: a kept point with an out-of-image center would alias
    # vi*width+ui onto a wrong in-image pixel (the 13-sample path clips each
    # offset individually, so this keeps the "same output" contract even for
    # callers whose keep mask lacks the in-bounds test)
    inside = (vi >= 0) & (vi < height) & (ui >= 0) & (ui < width)
    flat_idx = jnp.where(keep & inside, vi * width + ui, height * width)

    def one_image(idx1d, pr1d):
        buf = jnp.full((height * width + 1,), -1, dtype=jnp.int32)
        buf = buf.at[idx1d].max(pr1d, mode="drop")
        return buf[:-1].reshape(height, width)

    batch_shape = vu.shape[:-2]
    out = jax.vmap(one_image)(flat_idx.reshape(-1, P), prio.reshape(-1, P))
    out = _plus_dilate(_plus_dilate(out))
    return out.reshape(batch_shape + (height, width))


@jax.jit
def packed_to_cls(packed):
    """Packed raster -> compact uint8 class raster (0 = unpainted, else
    class_id + 1).  This is what crosses device->host for video compositing:
    4x smaller than the packed buffer."""
    painted = packed >= 0
    return jnp.where(painted, (packed % MAX_CLS) + 1, 0).astype(jnp.uint8)


@jax.jit
def pack_cls_2bit(cls_raster):
    """uint8 class raster (values 0..3) -> 2-bit packed [..., W/4] uint8.

    Device->host overlay bytes drop 4x — decisive when the host link is thin
    (tunneled TPU) and still free bandwidth on PCIe.  Values >= 4 would alias;
    callers with more than 3 classes must use the uint8 raster instead.
    Widths that aren't a multiple of 4 are zero-padded (unpack_cls_2bit slices
    back to the true width).
    """
    x = cls_raster.astype(jnp.uint8)
    pad = (-x.shape[-1]) % 4
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    a = x[..., 0::4] | (x[..., 1::4] << 2) | (x[..., 2::4] << 4) | (x[..., 3::4] << 6)
    return a


def unpack_cls_2bit(packed2, width):
    """Host-side inverse of pack_cls_2bit (NumPy)."""
    p = np.asarray(packed2)
    out = np.empty(p.shape[:-1] + (p.shape[-1] * 4,), np.uint8)
    out[..., 0::4] = p & 3
    out[..., 1::4] = (p >> 2) & 3
    out[..., 2::4] = (p >> 4) & 3
    out[..., 3::4] = (p >> 6) & 3
    return out[..., :width]


def _encode_effective(vu, keep, cls, width, height):
    """Shared by compact_points and effective_counts: per-point pixel+class
    encoding and the consecutive-duplicate suppression mask.

    Returns (enc [..., P] int32 with -1 at suppressed/dropped points,
    eff [..., P] bool)."""
    vi = vu[..., 0].astype(jnp.int32)
    ui = vu[..., 1].astype(jnp.int32)
    enc = (vi * width + ui) * MAX_CLS + cls
    enc = jnp.where(keep, enc, -1)
    # consecutive-duplicate suppression: successor kept & same pixel
    pix = enc // MAX_CLS
    dup = jnp.concatenate(
        [keep[..., 1:] & keep[..., :-1] & (pix[..., 1:] == pix[..., :-1]),
         jnp.zeros_like(keep[..., :1])],
        axis=-1,
    )
    eff = keep & ~dup
    return jnp.where(eff, enc, -1), eff


@partial(jax.jit, static_argnames=("width", "height"))
def effective_counts(vu, keep, cls, width, height):
    """Effective (deduped) kept-point counts — compact_points' `counts`
    WITHOUT the sort.  The counting pass only needs these numbers, and the
    P-wide lax.sort is the expensive compile (minutes through a
    remote-compile tunnel for a 42 k-point scene); a count-only program must
    not pay it."""
    _, eff = _encode_effective(vu, keep, cls, width, height)
    return eff.sum(axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("width", "height", "k"))
def compact_points(vu, keep, cls, width, height, k):
    """Compact kept projected points into fixed-size sparse buffers, in paint
    order — the scatter-free device path for video overlays.

    Encodes each kept point as (v * width + u) * MAX_CLS + cls, drops points
    whose successor is kept and lands on the same pixel (densified polylines
    step sub-pixel, so ~90 % of entries are such duplicates — the successor's
    higher paint priority covers the identical stencil, so the result is
    bit-identical), and stable-sorts survivors to the front per
    (frame, camera) (the sort key embeds the point index, so paint order
    survives).  The host then draws circles with one order-preserving fancy
    assignment (paint_sparse_host) — exact cv2 semantics with no scatter_max
    on device and k*4 bytes per camera on the link instead of a dense raster.

    Returns:
        vals [..., k] int32 (-1 padding past the kept count)
        counts [...] int32 — effective (deduped) kept totals; count > k means
        overflow and the caller must fall back to the dense path.
    """
    P = vu.shape[-2]
    enc, eff = _encode_effective(vu, keep, cls, width, height)
    order = jnp.arange(P, dtype=jnp.int32)
    key = jnp.where(eff, order, P + order)  # kept first, original order kept
    batch = vu.shape[:-2]
    skey, sval = jax.lax.sort_key_val(
        key.reshape((-1, P)), enc.reshape((-1, P)), dimension=-1
    )
    k_eff = min(k, P)
    vals = sval[:, :k_eff]
    if k > P:  # budget larger than the point count: pad with empty slots
        vals = jnp.pad(vals, ((0, 0), (0, k - P)), constant_values=-1)
    vals = vals.reshape(batch + (k,))
    counts = eff.sum(axis=-1).astype(jnp.int32)
    return vals, counts


@partial(jax.jit, static_argnames=("width", "height"))
def rasterize_from_compact(vals, width, height, prio_offset=0):
    """Dense packed raster from compact_points output: scatter only the
    deduped survivors (index within `vals` is ascending paint order, so it
    serves as the priority), then the two-round plus dilation.

    vals: [..., K] int32; returns packed [..., H, W] int32 (same contract as
    rasterize_packed, with priorities renumbered — class and paint order are
    preserved, absolute priority values differ).
    prio_offset: base paint priority — point-sharded callers pass
    shard_index * K so partial rasters combine with elementwise max in
    globally correct order (shards are contiguous point slices).
    """
    K = vals.shape[-1]
    ok = vals >= 0
    pix = jnp.where(ok, vals // MAX_CLS, height * width)
    prio = (prio_offset + jnp.arange(K, dtype=jnp.int32)) * MAX_CLS + jnp.where(
        ok, vals % MAX_CLS, 0)
    prio = jnp.where(ok, prio, -1)

    def one_image(idx1d, pr1d):
        buf = jnp.full((height * width + 1,), -1, dtype=jnp.int32)
        buf = buf.at[idx1d].max(pr1d, mode="drop")
        return buf[:-1].reshape(height, width)

    batch = vals.shape[:-1]
    out = jax.vmap(one_image)(pix.reshape((-1, K)), prio.reshape((-1, K)))
    out = _plus_dilate(_plus_dilate(out))
    return out.reshape(batch + (height, width))


def compact_points_host(vu, keep, cls, width, height, k):
    """NumPy mirror of compact_points — same encoding, consecutive-duplicate
    suppression, and paint order (kept points in original point order), so
    paint_sparse_host draws identical overlays from either producer.  The
    adaptive sparse lane serves chunks through this while a background warm
    is in flight (a device dispatch would hard-block behind the compile).

    vu [..., P, 2] float32, keep [..., P] bool, cls [P] ->
    (vals [..., k] int32 with -1 padding, counts [...] int32; counts > k
    signals overflow exactly like the device kernel)."""
    vu = np.asarray(vu)
    keep = np.asarray(keep, bool)
    cls = np.asarray(cls)
    vi = vu[..., 0].astype(np.int32)
    ui = vu[..., 1].astype(np.int32)
    enc = (vi * width + ui) * MAX_CLS + cls
    enc = np.where(keep, enc, -1)
    pix = enc // MAX_CLS
    dup = np.concatenate(
        [keep[..., 1:] & keep[..., :-1] & (pix[..., 1:] == pix[..., :-1]),
         np.zeros_like(keep[..., :1])],
        axis=-1,
    )
    eff = keep & ~dup
    counts = eff.sum(axis=-1).astype(np.int32)
    batch = keep.shape[:-1]
    P = keep.shape[-1]
    vals = np.full(batch + (k,), -1, np.int32)
    flat_eff = eff.reshape(-1, P)
    flat_enc = enc.reshape(-1, P)
    flat_vals = vals.reshape(-1, k)
    for r in range(flat_eff.shape[0]):
        kept = flat_enc[r][flat_eff[r]]
        n = min(len(kept), k)
        flat_vals[r, :n] = kept[:n]
    return vals, counts


def paint_sparse_host(image_bgr, vals, count, color_table, width):
    """Paint compacted points onto a host image with exact cv2.circle paint
    order: stencil indices are laid out point-major, so NumPy's sequential
    fancy-assignment (last duplicate wins) reproduces draw order."""
    n = int(count)
    if n <= 0:
        return image_bgr
    v = np.asarray(vals[:n])
    enc = v[v >= 0]
    if len(enc) == 0:
        return image_bgr
    cls = enc % MAX_CLS
    pix = enc // MAX_CLS
    py = pix // width
    px = pix % width
    h, w = image_bgr.shape[:2]
    offs = CIRCLE_R2_OFFSETS
    yy = py[:, None] + offs[None, :, 0]  # [n, 13] point-major
    xx = px[:, None] + offs[None, :, 1]
    ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    flat = (yy * w + xx)[ok]
    colors = np.broadcast_to(color_table[cls][:, None, :], (len(enc), len(offs), 3))[ok]
    image_bgr.reshape(-1, 3)[flat] = colors
    return image_bgr


def build_color_table(class_names, color_maps=None):
    """Per-class BGR color rows honoring the non-lane_marking fallback."""
    from cama_tpu.ops.lift import COLOR_MAPS

    color_maps = color_maps or COLOR_MAPS
    rows = []
    for name in class_names:
        eff = name if name == "lane_marking" else "Crosswalk_Line"
        rgb = color_maps[eff]
        rows.append(rgb[::-1])  # BGR, matching cv2 drawing on BGR images
    return np.asarray(rows, dtype=np.uint8)


@jax.jit
def composite_overlay(image_bgr, packed, color_table):
    """Paint packed raster onto an image: image[painted] = color[cls]."""
    painted = packed >= 0
    cls = jnp.where(painted, packed % MAX_CLS, 0)
    colors = color_table[cls]
    return jnp.where(painted[..., None], colors, image_bgr)


@partial(jax.jit, static_argnames=("rows", "cols"))
def composite_mosaic_device(base, cls_raster, color_table, grid,
                            rows=2, cols=3):
    """Fully device-side frame compositing: paint + 3x2 mosaic placement in
    ONE program, so the host touches a single [rows*h, cols*w, 3] frame.

    base:       [C, h, w, 3] uint8 undistorted camera images
    cls_raster: [C, h, w] uint8 class rasters (0 = unpainted, else class+1 —
                the pipeline's link format after packed_to_cls)
    color_table:[K, 3] uint8 BGR rows (build_color_table)
    grid:       [C] int32 mosaic slot per camera (row*cols + col)

    Paint semantics are byte-identical to the host compositor
    (tests/test_raster.py): painted pixels take color_table[(cls-1) % K],
    the rest keep the base pixel.  Intended for hosts with fast device
    links (PCIe/local TPU) where uploading base pixels is cheap and the
    host core is better spent on encode; through a slow tunneled link the
    upload dominates and the host compositor wins (BENCH.md) — which is
    why this stays opt-in (`ClipPipeline.mosaic_device`)."""
    painted = cls_raster > 0
    colors = color_table[(cls_raster.astype(jnp.int32) - 1) % MAX_CLS]
    imgs = jnp.where(painted[..., None], colors, base)
    slots = jnp.zeros((rows * cols,) + imgs.shape[1:], imgs.dtype)
    slots = slots.at[grid].set(imgs)
    _C, h, w, _3 = base.shape
    return (slots.reshape(rows, cols, h, w, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(rows * h, cols * w, 3))


def composite_overlay_host(image_bgr, packed, color_table):
    """NumPy composite (for the host video path)."""
    packed = np.asarray(packed)
    painted = packed >= 0
    out = np.array(image_bgr, copy=True)
    out[painted] = color_table[packed[painted] % MAX_CLS]
    return out


def rasterize_exact_host(image_bgr, vu_list, class_names, color_table=None):
    """Reference-exact host rasterization via cv2 (used by golden tests and as
    a CPU fallback): draws circles in order with cv2.circle.

    vu_list: [(class_name, vu [P, 2] float)] per instance, already masked.
    """
    import cv2

    from cama_tpu.ops.lift import COLOR_MAPS

    img = np.array(image_bgr, copy=True)
    for cls_name, vu in vu_list:
        pts = np.asarray(vu).astype(np.int32)
        eff = cls_name if cls_name == "lane_marking" else "Crosswalk_Line"
        color = tuple(COLOR_MAPS[eff][::-1].tolist())
        for v, u in pts:
            cv2.circle(img, (int(u), int(v)), 2, color, -1)
    return img
