"""Pallas TPU kernel: fused 6-camera reprojection over point tiles.

One launch per frame covers ALL cameras and ALL map points (the north-star
kernel of BASELINE.json): each grid step loads a (4, TILE) block of
homogeneous world points into VMEM once and contracts it on the MXU against
the stacked per-camera projection matrices — [C*4, 4] @ [4, TILE] — instead
of re-reading the point tensor per camera.  Crop-box test, perspective
divide, and bounds masks run on the VPU in the same kernel, writing (v, u)
rows and a keep mask per camera.

Layout note: everything is points-minor ([rows, P]) so the 128-lane axis is
the big point axis; a [P, 12] layout would pad 12 -> 128 lanes and blow VMEM.

Numerics match ops.geometry.project_frames (float32, Precision.HIGHEST);
tests assert exact keep-mask agreement in interpret mode.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048  # points per grid step; P must be a multiple (scene compiler pads)


def _kernel(pm_ref, am_ref, bounds_ref, pts_ref, valid_ref, vu_ref, keep_ref,
            *, n_cam, width, height):
    """One point-tile for all cameras.

    pm_ref:     [n_cam * 4, 4] stacked projection matrices (row-padded)
    am_ref:     [4, 4]   world->chassis
    bounds_ref: [2, 4]   crop lo/hi rows (xyz + pad)
    pts_ref:    [4, TILE] homogeneous world points
    valid_ref:  [1, TILE] float32 validity (1/0)
    vu_ref:     [n_cam * 2, TILE] output rows (v, u) per camera
    keep_ref:   [n_cam, TILE] output keep mask (float32 1/0)
    """
    pts = pts_ref[:]  # [4, TILE]

    # chassis-frame crop: [4, 4] @ [4, TILE] on the MXU, masks on the VPU.
    # precision=HIGHEST is load-bearing: the TPU MXU defaults to bfloat16
    # passes, which costs ~4 px at image scale (measured in
    # tools/bench_pallas.py) and flips borderline keep bits
    xyz_ch = jax.lax.dot(am_ref[:], pts, precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
    lo = bounds_ref[0, :]
    hi = bounds_ref[1, :]
    in_crop = (
        (xyz_ch[0, :] >= lo[0]) & (xyz_ch[0, :] <= hi[0])
        & (xyz_ch[1, :] >= lo[1]) & (xyz_ch[1, :] <= hi[1])
        & (xyz_ch[2, :] >= lo[2]) & (xyz_ch[2, :] <= hi[2])
    )

    # all cameras at once: [C*4, 4] @ [4, TILE]
    proj = jax.lax.dot(pm_ref[:], pts, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    valid = valid_ref[0, :] > 0

    vu_rows = []
    keep_rows = []
    for c in range(n_cam):
        x = proj[4 * c + 0, :]
        y = proj[4 * c + 1, :]
        z = proj[4 * c + 2, :]
        mask_z = z > 0
        safe_z = jnp.where(mask_z, z, 1.0)
        u = x / safe_z
        v = y / safe_z
        keep = (
            mask_z & (u >= 0) & (u < width) & (v >= 0) & (v < height)
            & in_crop & valid
        )
        vu_rows += [v, u]
        keep_rows.append(keep.astype(jnp.float32))
    vu_ref[:] = jnp.stack(vu_rows, axis=0)
    keep_ref[:] = jnp.stack(keep_rows, axis=0)


@partial(jax.jit, static_argnames=("width", "height", "interpret"))
def project_frame_pallas(points4_T, valid, A, B, width, height,
                         crop_lo=None, crop_hi=None, interpret=None):
    """Project one frame's points into all cameras with the fused kernel.

    Args:
        points4_T: [4, P] float32 homogeneous world points (P % TILE == 0)
        valid:     [P] bool
        A:         [4, 4] float32 world->chassis
        B:         [C, 3, 4] float32 world->pixel per camera
        crop_lo/crop_hi: [3] float32 chassis crop box (defaults to the
            reference CROP_BOX)
    Returns:
        vu [C, P, 2] float32, keep [C, P] bool — matching project_frames
        (keep bit-identical on the real chip; vu within ~1e-4 px, the MXU
        HIGHEST-precision decomposition's rounding — see tools/bench_pallas.py).
    """
    if interpret is None:
        # Mosaic only targets TPU ('axon' is the tunneled TPU platform);
        # everywhere else (the virtual-CPU test mesh) the kernel runs in the
        # interpreter with identical semantics
        interpret = jax.default_backend() not in ("tpu", "axon")
    P0 = points4_T.shape[1]
    C = B.shape[0]
    pad = (-P0) % TILE
    if pad:
        points4_T = jnp.pad(points4_T, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, (0, pad))
    P = P0 + pad

    B4 = jnp.concatenate([B, jnp.zeros((C, 1, 4), B.dtype)], axis=1)  # [C, 4, 4]
    pm = B4.reshape(C * 4, 4)

    if crop_lo is None or crop_hi is None:
        from cama_tpu.ops.geometry import crop_bounds

        crop_lo, crop_hi = crop_bounds()
    bounds = jnp.stack(
        [jnp.concatenate([jnp.asarray(crop_lo), jnp.zeros(1, jnp.float32)]),
         jnp.concatenate([jnp.asarray(crop_hi), jnp.zeros(1, jnp.float32)])]
    )

    vu_rows, keep_rows = pl.pallas_call(
        partial(_kernel, n_cam=C, width=width, height=height),
        grid=(P // TILE,),
        in_specs=[
            pl.BlockSpec((C * 4, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C * 2, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C * 2, P), jnp.float32),
            jax.ShapeDtypeStruct((C, P), jnp.float32),
        ],
        interpret=interpret,
    )(pm, A, bounds, points4_T, valid.astype(jnp.float32)[None, :])

    vu = vu_rows.reshape(C, 2, P).transpose(0, 2, 1)[:, :P0]
    keep = keep_rows[:, :P0] > 0
    return vu, keep
