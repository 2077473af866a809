"""Per-frame reprojection geometry, TPU-first.

The reference's hot loop (cama/dataset.py:78-126 + cama/reproject.py:108-205)
does, per frame: seek+SLERP a pose, invert it, then per instance and per
camera: 4x4 @ 4xN transform, crop mask, K @ P projection, bounds mask.  Here
the whole scene is one fixed-shape computation:

  host (float64, tiny):  pose seek indices + SLERP -> chassis2world[F]
                         -> compose crop matrices A[F,4,4] and projection
                         matrices B[F,C,3,4] = K_scaled @ T_cam<-chassis @ A
  device (float32, bulk): einsum over ALL frames x cameras x points at once
                         (or in frame chunks), producing (v,u) + keep masks.

Matrix composition stays in float64 on host because pose chains are
precision-critical; the per-point bulk math is float32 on the MXU/VPU, which
keeps reprojection within ~0.01 px of the reference's float64 NumPy (verified
in tests/test_geometry.py against the reference implementation).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from functools import partial

from cama_tpu.ops.lift import CROP_BOX
from cama_tpu.se3.trajectory import apply_seek, seek_indices

_P = jax.lax.Precision.HIGHEST


@dataclass
class FrameMatrices:
    """Host-composed per-frame matrices feeding the device pipeline."""

    A: np.ndarray  # [F, 4, 4] world -> chassis (crop frame)
    B: np.ndarray  # [F, C, 3, 4] world -> scaled pixel (pre-division)
    frame_valid: np.ndarray  # [F] bool (pose seek succeeded)
    frame_indices: np.ndarray  # [F] int (image index in the sync table)
    chassis2world_f32: np.ndarray  # [F, 4, 4] float32 (reference-parity cast)


def compose_frame_matrices(
    trajectory,
    frame_times,
    chassis2cam,
    K_scaled,
    t_max_diff=0.5,
    start_index=1,
):
    """Seek chassis2world at each frame time and build A/B (host, float64).

    Mirrors the reference chain: seek+SLERP (cama/dataset.py:91-92), cast to
    float32 (reference parity, dataset.py:92), invert, then fold the static
    chassis->camera extrinsic and scaled K into one 3x4 per camera.

    Args:
        trajectory: se3.Trajectory holding chassis2world poses
        frame_times: [Nall] seconds (sync table of the main camera); frames
            before `start_index` are skipped like the reference (dataset.py:88)
        chassis2cam: [C, 4, 4] float64
        K_scaled:    [C, 3, 3] float64 (already rescaled to output size)
    """
    frame_times = np.asarray(frame_times, dtype=np.float64)[start_index:]
    frame_indices = np.arange(len(frame_times)) + start_index
    T_all = trajectory.as_transform(True)
    ts = trajectory.timestamps[:, 0]
    idx = seek_indices(ts, frame_times, t_max_diff, interpolate=True)
    c2w = apply_seek(T_all, idx).astype(np.float32)  # reference casts to f32
    valid = idx["valid"]

    # world->chassis: reference uses np.linalg.inv on the float32 matrix
    # (cama/dataset.py:99); replicate that bit pattern, then promote
    with np.errstate(all="ignore"):
        w2c_f32 = np.linalg.inv(np.where(valid[:, None, None], c2w, np.eye(4, dtype=np.float32)))
    A = w2c_f32.astype(np.float64)

    chassis2cam = np.asarray(chassis2cam, dtype=np.float64)
    K_scaled = np.asarray(K_scaled, dtype=np.float64)
    # K_tilde [C, 3, 4]: pinhole projection of homogeneous camera-frame points
    K_tilde = np.concatenate([K_scaled, np.zeros((len(K_scaled), 3, 1))], axis=-1)
    # B[f, c] = K_tilde[c] @ chassis2cam[c] @ A[f]
    B = np.einsum("cij,cjk,fkl->fcil", K_tilde, chassis2cam, A)
    return FrameMatrices(
        A=A,
        B=B,
        frame_valid=valid,
        frame_indices=frame_indices,
        chassis2world_f32=c2w,
    )


def crop_bounds(crop=None):
    crop = crop or CROP_BOX
    lo = np.array([crop["x_min"], crop["y_min"], crop["z_min"]], dtype=np.float32)
    hi = np.array([crop["x_max"], crop["y_max"], crop["z_max"]], dtype=np.float32)
    return lo, hi


@partial(jax.jit, static_argnames=("width", "height"))
def project_frames(points, valid, A, B, frame_valid, width, height, crop_lo, crop_hi):
    """Project all points into all frames x cameras in one device pass.

    NOTE: pipeline._host_project_chunk is the NumPy f64 mirror of this exact
    formula-and-mask chain (the adaptive host lane), and validate's
    host-exact harness pins both against the reference — any change to the
    crop test, mask ordering, or division here must be mirrored there or the
    >=99.9 % host/device pixel-agreement contract silently erodes.

    Args:
        points:      [P, 3] float32 world-frame points
        valid:       [P] bool padding mask
        A:           [F, 4, 4] float32 world->chassis
        B:           [F, C, 3, 4] float32 world->pixel (pre-division)
        frame_valid: [F] bool
        width/height: static ints of the OUTPUT image (post-rescale)
        crop_lo/hi:  [3] float32 chassis-frame crop box (inclusive)

    Returns:
        vu:   [F, C, P, 2] float32 (v, u) — row, col, like the reference's
              project_to_image output (cama/reproject.py:203-204)
        keep: [F, C, P] bool — crop & z>0 & in-bounds & valid & frame_valid
    """
    p4 = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1)  # [P,4]

    # chassis-frame crop (cama/reproject.py:118-131, inclusive bounds)
    xyz_ch = jnp.einsum("fij,pj->fpi", A[:, :3, :], p4, precision=_P)  # [F,P,3]
    in_crop = jnp.all((xyz_ch >= crop_lo) & (xyz_ch <= crop_hi), axis=-1)  # [F,P]

    # projection (cama/reproject.py:187-205)
    xyw = jnp.einsum("fcij,pj->fcpi", B, p4, precision=_P)  # [F,C,P,3]
    z = xyw[..., 2]
    mask_z = z > 0
    safe_z = jnp.where(mask_z, z, 1.0)
    u = xyw[..., 0] / safe_z
    v = xyw[..., 1] / safe_z
    in_img = (u >= 0) & (u < width) & (v >= 0) & (v < height)

    keep = (
        mask_z
        & in_img
        & in_crop[:, None, :]
        & valid[None, None, :]
        & frame_valid[:, None, None]
    )
    vu = jnp.stack([v, u], axis=-1)
    return vu, keep


def crop_compact_project_idx(points, valid, Af, Bf, fv, width, height,
                             crop_lo, crop_hi, k1):
    """Two-stage stage 1+2 for ONE frame: camera-independent crop compaction
    to `k1` survivors (stable -> paint order preserved), then per-camera
    projection of only the survivors.  Shared by the single-device
    _overlay_chunk_two_stage, the sharded two_stage kernel, and the
    evaluator's compacted projection so the precision-sensitive math exists
    once.

    Returns (vu_sel [C, k1, 2], keep [C, k1], idx [k1] int32) — idx indexes
    the original point axis (stable original order; padding rows carry idx 0
    with keep False), so callers can compact any per-point array (class ids,
    instance ids) with one gather.
    """
    P = points.shape[0]
    p4 = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1)
    xyz_ch = jnp.einsum("ij,pj->pi", Af[:3, :], p4, precision=_P)
    sel = jnp.all((xyz_ch >= crop_lo) & (xyz_ch <= crop_hi), axis=-1) & valid & fv
    order = jnp.arange(P, dtype=jnp.int32)
    skey = jax.lax.sort(jnp.where(sel, order, P + order))[:k1]
    sel_valid = skey < P
    idx = jnp.where(sel_valid, skey, 0)
    pts_sel = points[idx]

    p4s = jnp.concatenate([pts_sel, jnp.ones_like(pts_sel[:, :1])], axis=-1)
    xyw = jnp.einsum("cij,pj->cpi", Bf, p4s, precision=_P)
    z = xyw[..., 2]
    mask_z = z > 0
    safe_z = jnp.where(mask_z, z, 1.0)
    u = xyw[..., 0] / safe_z
    v = xyw[..., 1] / safe_z
    keep = (
        mask_z & (u >= 0) & (u < width) & (v >= 0) & (v < height)
        & sel_valid[None, :]
    )
    return jnp.stack([v, u], axis=-1), keep, idx


def crop_compact_project(points, valid, cls, Af, Bf, fv, width, height,
                         crop_lo, crop_hi, k1):
    """crop_compact_project_idx with the class ids gathered through the
    selection (the overlay kernels' shape: vu_sel, keep, cls_sel [k1])."""
    vu, keep, idx = crop_compact_project_idx(
        points, valid, Af, Bf, fv, width, height, crop_lo, crop_hi, k1)
    return vu, keep, cls[idx]


# ---------------------------------------------------------------------------
# Host-exact golden path: replicates the reference's per-frame NumPy chain
# (mixed f32/f64 promotion included) for pixel-exactness verification.
# ---------------------------------------------------------------------------


def project_frame_exact(points_f32_or_f64, A_f32, chassis2cam, K_scaled, width, height,
                        crop=None):
    """One frame, all cameras, NumPy with the reference's exact dtype chain:
    float32 world2chassis @ float64-promoted homogeneous points, crop, then
    per-camera float64 extrinsic + K, divide, mask.  Returns per-camera
    (vu [Pi, 2] float64 arrays, keep masks) without padding.

    points: [P, 3]; A_f32: [4, 4] float32; chassis2cam: [C, 4, 4] float64;
    K_scaled: [C, 3, 3] float64.
    """
    crop = crop or CROP_BOX
    pts = np.asarray(points_f32_or_f64)
    ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=-1)  # promotes to f64
    chassis = (A_f32 @ ph.T).T[:, :3]
    m = (
        (chassis[:, 0] >= crop["x_min"]) & (chassis[:, 0] <= crop["x_max"])
        & (chassis[:, 1] >= crop["y_min"]) & (chassis[:, 1] <= crop["y_max"])
        & (chassis[:, 2] >= crop["z_min"]) & (chassis[:, 2] <= crop["z_max"])
    )
    out = []
    for c in range(len(chassis2cam)):
        ch_h = np.concatenate([chassis, np.ones((len(chassis), 1))], axis=-1)
        cam = (chassis2cam[c] @ ch_h.T).T[:, :3]
        proj = (K_scaled[c] @ cam.T).T
        mask_z = proj[:, 2] > 0
        with np.errstate(all="ignore"):
            div = proj / proj[:, 2:]
        keep = (
            m & mask_z & (div[:, 2] > 0)
            & (div[:, 0] >= 0) & (div[:, 0] < width)
            & (div[:, 1] >= 0) & (div[:, 1] < height)
        )
        out.append((div[:, [1, 0]], keep))
    return out
