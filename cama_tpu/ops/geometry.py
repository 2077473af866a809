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


# ---------------------------------------------------------------------------
# Double-f32 (compensated) arithmetic for the bit-exact device lane: TPU has
# no f64, but error-free transformations give each dot product a (value,
# error) pair accurate to ~eps32^2 relative — tight enough that ambiguity
# flags fire only on genuine boundary-sitters instead of the ~20 % of points
# a Σ|terms| interval bound sweeps up under cancellation.  All ops below are
# elementwise VPU f32 (IEEE round-to-nearest); nothing routes through the
# bf16 MXU passes, which would break the exactness of TwoSum/TwoProd.
# ---------------------------------------------------------------------------


def _b(x):
    """Pin an intermediate so the compiler cannot rewrite it.  XLA:CPU runs
    with fast-math ON by default: LLVM freely reassociates float chains and
    contracts mul+add into fma — either silently destroys an error-free
    transform, whose correctness depends on each op being IEEE-rounded
    exactly as written (observed: TwoSum of two exact f32s returning a
    value 4e-3 off at vectorized [3,4] shapes, bit-exact at [1,4]).  With
    every elementary op barriered the optimizer sees only opaque single
    ops, and a single op is correctly rounded under fast-math too.  The
    TPU compiler needs none of this, but the barriers are harmless there
    and the exact lane must hold on every backend the tests run on."""
    return jax.lax.optimization_barrier(x)


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (s = fl(a+b))."""
    s = _b(a + b)
    bb = _b(s - a)
    e = _b(_b(a - _b(s - bb)) + _b(b - bb))
    return s, e


def _two_prod(a, b):
    """Dekker TwoProd via 12-bit splitting: p + e == a * b exactly."""
    def split(x):
        c = _b(jnp.float32(4097.0) * x)  # 2^12 + 1
        hi = _b(c - _b(c - x))
        return hi, _b(x - hi)

    p = _b(a * b)
    ah, al = split(a)
    bh, bl = split(b)
    e = _b(_b(_b(_b(_b(ah * bh) - p) + _b(ah * bl)) + _b(al * bh))
           + _b(al * bl))
    return p, e


def _df_dot4(row, p4, row_lo=None):
    """Compensated 4-term dot (Ogita-Rump-Oishi Dot2): returns (s, e) with
    s + e == Σ row[...,j]*p4[...,j] to ~eps32^2 relative accuracy.
    row/p4 broadcast against each other with a trailing axis of 4.

    row_lo carries the f32-cast residual of a matrix that was composed in
    f64 (row_true = row + row_lo): input rounding is DATA, not arithmetic —
    no compensation can recover it after the cast, so the residual rides in
    explicitly and lands in the error channel (its products are ~eps32 of
    the main terms; plain f32 accumulation keeps the total at ~eps32^2)."""
    s = jnp.zeros(jnp.broadcast_shapes(row.shape[:-1], p4.shape[:-1]),
                  jnp.float32)
    e = s
    for j in range(4):
        pj, pe = _two_prod(row[..., j], p4[..., j])
        s, se = _two_sum(s, pj)
        e = e + (se + pe)
        if row_lo is not None:
            e = e + row_lo[..., j] * p4[..., j]
    return s, e


def _df_div(xs, xe, zs, ze):
    """Double-f32 division (x_s+x_e)/(z_s+z_e) -> (q1, q2) with one Newton
    correction: q2 captures the residual of q1 = fl(xs/zs)."""
    q1 = _b(xs / zs)
    p, pe = _two_prod(q1, zs)
    r = _b(_b(_b(_b(xs - p) - pe) + xe) - _b(q1 * ze))
    return q1, r / zs


def _df_frac_dist(q1, q2):
    """(floor, distance-to-nearest-integer-line) of the double-f32 value
    q1 + q2.  |q1| < 2^23 makes q1 - floor(q1) exact, so the fractional part
    frac + q2 carries the full compensated accuracy near 0/1."""
    fl = jnp.floor(q1)
    frac = _b(_b(q1 - fl) + q2)
    fl = fl + jnp.floor(frac)  # q2 can push across the line
    frac = _b(frac - jnp.floor(frac))
    return fl, jnp.minimum(frac, 1.0 - frac)


#: absolute bands around decision boundaries (refined-value space): a point
#: whose COMPENSATED value sits closer than this to a boundary is flagged
#: even when f32 and refined quantize identically — the band absorbs the
#: ~eps32^2 residual of the compensation and the host chain's own f64
#: rounding, with orders of magnitude to spare.  Soundness is pinned by
#: tests/test_exact_lane.py (every observed f32/f64 disagreement must carry
#: the flag) and by validate --kernel exact reaching 1.0.
AMBIGUITY_BAND_PX = 1e-4  # pixels (u/v floor + image-bounds lines)
AMBIGUITY_BAND_M = 1e-6   # meters (crop box planes, z>0 plane)


def _checked_frame(points, valid, Af, Bf, Bf_lo, fv, width, height,
                   crop_lo, crop_hi):
    """One frame of project_frames_checked: (vu [C,P,2], keep [C,P],
    amb [P]).  Pure — runs identically under jit (lax.map over frames) and
    eagerly op-by-op (the fallback when the jit compiler is caught rewriting
    float chains, see _eft_jit_faithful)."""
    band_px = jnp.float32(AMBIGUITY_BAND_PX)
    band_m = jnp.float32(AMBIGUITY_BAND_M)
    p4 = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1)
    # -------- production f32 values (what the raster consumes) --------
    xyz_ch = jnp.einsum("ij,pj->pi", Af[:3, :], p4, precision=_P)
    in_crop = jnp.all((xyz_ch >= crop_lo) & (xyz_ch <= crop_hi), axis=-1)
    xyw = jnp.einsum("cij,pj->cpi", Bf, p4, precision=_P)  # [C,P,3]
    z = xyw[..., 2]
    mask_z = z > 0
    safe_z = jnp.where(mask_z, z, 1.0)
    u = xyw[..., 0] / safe_z
    v = xyw[..., 1] / safe_z
    in_img = (u >= 0) & (u < width) & (v >= 0) & (v < height)
    keep = mask_z & in_img & in_crop[None, :] & valid[None, :] & fv

    # -------- compensated double-f32 reference values --------
    # crop coords: rows of Af [3,4] against p4 [P,4]
    cs, ce = _df_dot4(Af[:3, None, :], p4[None, :, :])  # [3,P]
    xyz_r = cs + ce
    in_crop_r = jnp.all((xyz_r.T >= crop_lo) & (xyz_r.T <= crop_hi),
                        axis=-1)
    near_crop = jnp.any(
        (jnp.abs(xyz_r.T - crop_lo) <= band_m)
        | (jnp.abs(xyz_r.T - crop_hi) <= band_m), axis=-1)

    # projection rows: Bf [C,3,4] against p4 [P,4] -> [C,3,P]; Bf_lo
    # restores the f64 composition the f32 cast of B rounded away
    ps, pe = _df_dot4(Bf[:, :, None, :], p4[None, None, :, :],
                      row_lo=Bf_lo[:, :, None, :])
    zs, zesum = ps[:, 2], pe[:, 2]
    z_r = zs + zesum
    mask_z_r = z_r > 0
    near_z = jnp.abs(z_r) <= band_m
    # guard the division away from the z~0 set (flagged anyway)
    z_ok = jnp.abs(z_r) > band_m
    zs_safe = jnp.where(z_ok, zs, 1.0)
    ze_safe = jnp.where(z_ok, zesum, 0.0)
    u1, u2 = _df_div(ps[:, 0], pe[:, 0], zs_safe, ze_safe)
    v1, v2 = _df_div(ps[:, 1], pe[:, 1], zs_safe, ze_safe)
    ufl, udist = _df_frac_dist(u1, u2)
    vfl, vdist = _df_frac_dist(v1, v2)
    u_r = u1 + u2
    v_r = v1 + v2
    in_img_r = (u_r >= 0) & (u_r < width) & (v_r >= 0) & (v_r < height)
    keep_r = (mask_z_r & in_img_r & in_crop_r[None, :]
              & valid[None, :] & fv)

    # -------- disagreement / boundary-band flags --------
    keep_flip = keep != keep_r
    either = keep | keep_r
    # pixel floor: production trunc (astype int32 == floor for the kept
    # u,v >= 0) vs refined floor; only matters where the point paints
    pix_flip = either & ((jnp.floor(u) != ufl) | (jnp.floor(v) != vfl))
    # boundary bands fire on any point that PLAUSIBLY passes the other
    # guards on the refined side (the host f64 chain sits within the
    # band of the refined value, so only banded points can flip
    # host-vs-device in either direction); ungated by `keep` — a point
    # the device rejects at u = -1e-5 can still be host-kept
    near_line = (udist <= band_px) | (vdist <= band_px)
    near_any = near_z | near_crop[None, :] | near_line
    relevant = valid[None, :] & fv
    plaus = (relevant
             & (mask_z_r | near_z)
             & (in_crop_r[None, :] | near_crop[None, :])
             & (u_r >= -1.0) & (u_r < width + 1.0)
             & (v_r >= -1.0) & (v_r < height + 1.0))
    amb_cam = keep_flip | pix_flip | (plaus & near_any)
    vu = jnp.stack([v, u], axis=-1)
    return vu, keep, jnp.any(amb_cam, axis=0)


@partial(jax.jit, static_argnames=("width", "height"))
def _project_frames_checked_jit(points, valid, A, B, B_lo, frame_valid,
                                width, height, crop_lo, crop_hi):
    def per_frame(args):
        Af, Bf, Bf_lo, fv = args
        return _checked_frame(points, valid, Af, Bf, Bf_lo, fv, width,
                              height, crop_lo, crop_hi)

    return jax.lax.map(per_frame, (A, B, B_lo, frame_valid))


_EFT_JIT_FAITHFUL = None


def _eft_jit_faithful():
    """Does THIS process's jit compiler preserve error-free transforms?

    XLA:CPU compiles with fast-math-style float licenses (and this repo's
    bench environment additionally serves CPU executables from a remote
    compile cache built with different codegen): LLVM-level reassociation
    then destroys TwoSum/TwoProd — observed as a 4-term Dot2 off by 4e-3 at
    vectorized [3,4] shapes while bit-exact at [1,4] and in eager op-by-op
    dispatch (single ops are correctly rounded under any license).  HLO
    optimization_barriers cannot stop an LLVM pass, and no supported flag
    reaches the remote compiler — so probe at runtime: run the exact input
    triple that exposed the bug through jit and compare against the f64
    truth.  On faithful compilers (the TPU backend) this passes and the
    checked projection runs fully jitted; otherwise it falls back to eager.
    """
    global _EFT_JIT_FAITHFUL
    if _EFT_JIT_FAITHFUL is None:
        row = jnp.asarray(
            [[612.9723510742188, -664.3383178710938,
              -0.1483260989189148, 5025.9521484375],
             [1.0, 2.0, 3.0, 4.0],
             [0.1, 0.2, 0.3, 0.4]], jnp.float32)
        p4 = jnp.asarray([-257.9800109863281, -243.37962341308594,
                          0.07289975136518478, 1.0], jnp.float32)
        want = float(
            np.sum(np.asarray(row[0], np.float64) * np.asarray(p4, np.float64)))
        s, e = jax.jit(_df_dot4)(row, p4)
        got = float(s[0]) + float(e[0])
        _EFT_JIT_FAITHFUL = abs(got - want) < 1e-7 * abs(want)
        if not _EFT_JIT_FAITHFUL:
            import warnings

            warnings.warn(
                "jit compiler rewrites float chains (compensated dot off by "
                f"{got - want:.2e}); the exact lane's checked projection "
                "will run eagerly on this backend")
    return _EFT_JIT_FAITHFUL


def project_frames_checked(points, valid, A, B, B_lo, frame_valid, width,
                           height, crop_lo, crop_hi):
    """project_frames + per-point AMBIGUITY flags for the bit-exact device
    lane (round-4 verdict #4: device lanes bottomed at 0.99999 agreement on
    f32 keep-mask flips at crop/bounds/pixel edges).

    Each point is projected TWICE: once with the production f32 formula
    (the values the raster consumes), and once in compensated double-f32
    (error-free transformations + the B-cast residual B_lo; ~eps32^2
    relative).  A point is flagged ambiguous when a keep-mask guard (crop
    box, z>0, image bounds) or the pixel floor DIFFERS between the two, or
    when the refined value sits within a tiny absolute band of the boundary
    (AMBIGUITY_BAND_*) — i.e. exactly the points whose f32 result could
    disagree with the reference's f64 chain.  Typical flag rate: a handful
    of points per frame.

    The exact serving lane (pipeline.iter_overlay_rasters_exact) recomputes
    ONLY the flagged points on host in the reference's f64 chain
    (project_frame_exact) and patches them before rasterizing; everything
    unflagged is quantization-identical to the f64 result, so the patched
    raster is bit-exact.  No A_lo is needed: A is the reference's f32
    inverse promoted to f64 — every entry is exactly representable in f32
    (compose_frame_matrices).

    Returns (vu [F,C,P,2], keep [F,C,P], amb [F,P]) — amb is collapsed over
    cameras because the host recompute projects a point into all six
    cameras in one call anyway.
    """
    if _eft_jit_faithful():
        return _project_frames_checked_jit(points, valid, A, B, B_lo,
                                           frame_valid, width, height,
                                           crop_lo, crop_hi)
    outs = [_checked_frame(points, valid, jnp.asarray(A[f]),
                           jnp.asarray(B[f]), jnp.asarray(B_lo[f]),
                           jnp.asarray(frame_valid[f]), width, height,
                           crop_lo, crop_hi)
            for f in range(np.asarray(A).shape[0])]
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(3))


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
