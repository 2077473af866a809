"""Batched SE(3) / SO(3) algebra, array-namespace generic.

Every function here accepts either NumPy or JAX arrays and does its math with
the matching namespace: NumPy inputs run in float64 on the host (the "exact"
path used for golden verification and tiny host-side compositions), JAX inputs
trace into jitted float32 TPU programs.  This replaces the reference's
scipy.spatial.transform.Rotation/Slerp usage (cama/pose_transformer.py:8-44)
with fully batched, jit-compatible primitives — no per-pose Python loops.

Quaternion convention: scalar-last (x, y, z, w), matching scipy so that the
on-disk TUM format (t x y z qx qy qz qw) round-trips identically.
"""
from __future__ import annotations

import numpy as np

try:  # jax is a hard dependency of the framework, soft dependency of this module
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover - jax is baked into the target env
    jax = None
    jnp = None


def _ns(*arrays):
    """Pick the array namespace: jnp if any argument is a jax array else np."""
    if jax is not None:
        for a in arrays:
            if isinstance(a, jax.Array):
                return jnp
    return np


def _mm(xp, a, b):
    """Matmul at full float32 precision.  On TPU the default matmul precision
    for f32 operands is bfloat16 passes — far too coarse for chained SE(3)
    composition — so jnp matmuls here always request Precision.HIGHEST (the
    4x4 contractions are tiny; the cost is irrelevant)."""
    if xp is jnp:
        return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    return a @ b


def inv_se3(T):
    """Invert rigid transform(s) without a general matrix inverse.

    Mirrors the reference's invT (cama/pose_transformer.py:8-21) but batched:
    accepts [..., 4, 4].
    """
    xp = _ns(T)
    T = xp.asarray(T)
    Rt = xp.swapaxes(T[..., :3, :3], -1, -2)
    t = T[..., :3, 3:]
    top = xp.concatenate([Rt, -_mm(xp, Rt, t)], axis=-1)
    bottom_row = xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype)
    bottom = xp.broadcast_to(bottom_row, top.shape[:-2] + (1, 4))
    return xp.concatenate([top, bottom], axis=-2)


def quat_normalize(q):
    xp = _ns(q)
    q = xp.asarray(q)
    return q / xp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conjugate(q):
    xp = _ns(q)
    q = xp.asarray(q)
    return xp.concatenate([-q[..., :3], q[..., 3:]], axis=-1)


def quat_multiply(p, q):
    """Hamilton product in (x, y, z, w) convention: R(p*q) = R(p) @ R(q)."""
    xp = _ns(p, q)
    p, q = xp.asarray(p), xp.asarray(q)
    px, py, pz, pw = (p[..., i] for i in range(4))
    qx, qy, qz, qw = (q[..., i] for i in range(4))
    return xp.stack(
        [
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
            pw * qw - px * qx - py * qy - pz * qz,
        ],
        axis=-1,
    )


def quat_to_matrix(q):
    """(x, y, z, w) quaternion(s) -> rotation matrix [..., 3, 3] (normalizes)."""
    xp = _ns(q)
    q = quat_normalize(xp.asarray(q))
    x, y, z, w = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = xp.stack(
        [
            xp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            xp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            xp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return m


def matrix_to_quat(m):
    """Rotation matrix [..., 3, 3] -> (x, y, z, w) quaternion.

    Vectorized Shepperd-style extraction (the same candidate-selection scheme
    scipy's Rotation.from_matrix uses): build the 4 candidate quaternions,
    pick by the largest of (m00, m11, m22, trace), normalize.  No
    canonicalization (sign of w follows the selected branch, like scipy).
    """
    xp = _ns(m)
    m = xp.asarray(m)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # candidate for "largest diagonal is i" branch, i in {0,1,2}, plus trace branch
    q0 = xp.stack([1 - tr + 2 * m00, m10 + m01, m20 + m02, m21 - m12], axis=-1)
    q1 = xp.stack([m01 + m10, 1 - tr + 2 * m11, m21 + m12, m02 - m20], axis=-1)
    q2 = xp.stack([m02 + m20, m12 + m21, 1 - tr + 2 * m22, m10 - m01], axis=-1)
    q3 = xp.stack([m21 - m12, m02 - m20, m10 - m01, 1 + tr], axis=-1)
    cand = xp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]

    decision = xp.stack([m00, m11, m22, tr], axis=-1)
    choice = xp.argmax(decision, axis=-1)
    q = xp.take_along_axis(cand, choice[..., None, None].astype(xp.int64 if xp is np else jnp.int32), axis=-2)[
        ..., 0, :
    ]
    return quat_normalize(q)


def rotvec_to_quat(rv):
    """Axis-angle vector(s) [..., 3] -> quaternion (x, y, z, w)."""
    xp = _ns(rv)
    rv = xp.asarray(rv)
    angle = xp.linalg.norm(rv, axis=-1)
    half = 0.5 * angle
    small = angle < 1e-3
    # sin(a/2)/a with series fallback (scipy uses 0.5 - a^2/48 + a^4/3840)
    scale_series = 0.5 - angle**2 / 48.0 + angle**4 / 3840.0
    safe_angle = xp.where(small, xp.ones_like(angle), angle)
    scale = xp.where(small, scale_series, xp.sin(half) / safe_angle)
    xyz = rv * scale[..., None]
    w = xp.cos(half)[..., None]
    return xp.concatenate([xyz, w], axis=-1)


def quat_to_rotvec(q):
    """Quaternion (x, y, z, w) -> axis-angle vector, angle in [0, pi]."""
    xp = _ns(q)
    q = quat_normalize(xp.asarray(q))
    # canonicalize: w >= 0 so the returned angle is the short way around
    q = xp.where(q[..., 3:4] < 0, -q, q)
    norm_xyz = xp.linalg.norm(q[..., :3], axis=-1)
    angle = 2.0 * xp.arctan2(norm_xyz, q[..., 3])
    small = angle < 1e-3
    # angle/sin(angle/2) with series fallback (scipy: 2 + angle^2/12 + 7 a^4/2880)
    scale_series = 2.0 + angle**2 / 12.0 + 7.0 * angle**4 / 2880.0
    safe_sin = xp.where(small, xp.ones_like(angle), xp.sin(angle / 2.0))
    scale = xp.where(small, scale_series, angle / safe_sin)
    return q[..., :3] * scale[..., None]


def quat_slerp(q0, q1, t):
    """Spherical interpolation, scipy.Slerp-equivalent construction:
    q(t) = q0 * exp(t * log(q0^-1 * q1)), which takes the short path because
    quat_to_rotvec returns angles in [0, pi].
    """
    xp = _ns(q0, q1)
    q_rel = quat_multiply(quat_conjugate(q0), q1)
    rv = quat_to_rotvec(q_rel)
    t = xp.asarray(t)
    return quat_multiply(q0, rotvec_to_quat(rv * t[..., None]))


def slerp_transform(T0, T1, ratio):
    """Interpolate between two (or two batches of) 4x4 transforms.

    Matches reference SlerpTransform semantics (cama/pose_transformer.py:24-44):
    the whole matrix is lerped elementwise (so translation and bottom row lerp)
    and the rotation block is replaced by the slerped rotation.
    """
    xp = _ns(T0, T1)
    T0, T1 = xp.asarray(T0), xp.asarray(T1)
    ratio = xp.asarray(ratio)
    r = ratio[..., None, None]
    out = T0 * (1.0 - r) + T1 * r
    q0 = matrix_to_quat(T0[..., :3, :3])
    q1 = matrix_to_quat(T1[..., :3, :3])
    rot = quat_to_matrix(quat_slerp(q0, q1, ratio))
    if xp is jnp:
        out = out.at[..., :3, :3].set(rot)
    else:
        out = np.array(out)
        out[..., :3, :3] = rot
    return out


_AXES = {"x": 0, "y": 1, "z": 2}


def _single_axis_quat(xp, axis, angle):
    zeros = xp.zeros_like(angle)
    half = angle / 2.0
    s, c = xp.sin(half), xp.cos(half)
    comps = [zeros, zeros, zeros, c]
    comps[axis] = s
    return xp.stack(comps, axis=-1)


def from_euler(seq, angles, degrees=False):
    """Euler angles -> quaternion (x, y, z, w), scipy-compatible.

    Uppercase seq = intrinsic (rotating frame), lowercase = extrinsic (fixed).
    """
    xp = _ns(angles)
    angles = xp.asarray(angles)
    if angles.ndim == 1:
        angles_b = angles[None, :]
        squeeze = True
    else:
        angles_b = angles
        squeeze = False
    if degrees:
        angles_b = angles_b * (np.pi / 180.0)
    intrinsic = seq == seq.upper()
    axes = [_AXES[c] for c in seq.lower()]
    qs = [_single_axis_quat(xp, ax, angles_b[..., i]) for i, ax in enumerate(axes)]
    if intrinsic:
        q = quat_multiply(quat_multiply(qs[0], qs[1]), qs[2])
    else:
        q = quat_multiply(quat_multiply(qs[2], qs[1]), qs[0])
    return q[0] if squeeze else q


def as_euler(m, seq, degrees=False):
    """Rotation matrix [..., 3, 3] -> Euler angles for any 3-char seq.

    Uppercase = intrinsic, lowercase = extrinsic.  Uses the duality
    intrinsic(abc) == reversed(extrinsic(cba)) to reduce to one extraction.
    Matches scipy away from gimbal lock; at lock the third angle is set to 0
    (scipy's convention).
    """
    xp = _ns(m)
    m = xp.asarray(m)
    intrinsic = seq == seq.upper()
    s = seq.lower()
    if not intrinsic:
        s = s[::-1]
    i, j, k3 = _AXES[s[0]], _AXES[s[1]], _AXES[s[2]]
    proper = s[0] == s[2]

    if proper:
        k = 3 - i - j  # the unused axis
        eps = 1.0 if (j - i) % 3 == 1 else -1.0
        beta = xp.arccos(xp.clip(m[..., i, i], -1.0, 1.0))
        safe = xp.abs(xp.abs(m[..., i, i]) - 1.0) > 1e-7
        alpha = xp.arctan2(m[..., j, i], -eps * m[..., k, i])
        gamma = xp.arctan2(m[..., i, j], eps * m[..., i, k])
        # gimbal lock: beta ~ 0 or pi -> set gamma = 0, fold into alpha
        lock_alpha = xp.arctan2(eps * m[..., k, j], m[..., j, j])
        alpha = xp.where(safe, alpha, lock_alpha)
        gamma = xp.where(safe, gamma, xp.zeros_like(gamma))
    else:
        k = k3
        eps = 1.0 if (j - i) % 3 == 1 else -1.0
        sy = eps * m[..., i, k]
        beta = xp.arctan2(sy, xp.sqrt(xp.clip(m[..., i, i] ** 2 + m[..., i, j] ** 2, 0.0, None)))
        safe = xp.abs(xp.abs(sy) - 1.0) > 1e-7
        alpha = xp.arctan2(-eps * m[..., j, k], m[..., k, k])
        gamma = xp.arctan2(-eps * m[..., i, j], m[..., i, i])
        # Tait-Bryan lock: the alpha/gamma coupling flips sign with the pole
        # (sin(beta) = +-1) — verified against scipy at both poles for all
        # six sequences (tests/test_se3_core.py)
        lock_alpha = xp.arctan2(xp.sign(sy) * m[..., j, i], m[..., j, j])
        alpha = xp.where(safe, alpha, lock_alpha)
        gamma = xp.where(safe, gamma, xp.zeros_like(gamma))

    out = xp.stack([alpha, beta, gamma], axis=-1)
    if not intrinsic:
        out = out[..., ::-1]
    if degrees:
        out = out * (180.0 / np.pi)
    return out


def rel_to_abs(rel):
    """Cumulative compose: abs[0] = I, abs[n] = rel[0] @ ... @ rel[n-1].

    Mirrors reference __relative2absolute (cama/pose_transformer.py:198-207).
    Uses an O(log N) associative scan on JAX arrays, a plain loop on NumPy.
    Returns [N+1, 4, 4] for input [N, 4, 4].
    """
    xp = _ns(rel)
    rel = xp.asarray(rel)
    eye = xp.eye(4, dtype=rel.dtype)
    if xp is jnp:
        prefix = jax.lax.associative_scan(lambda a, b: _mm(jnp, a, b), rel)
        return xp.concatenate([eye[None], prefix], axis=0)
    out = [np.array(eye)]
    for T in rel:
        out.append(out[-1] @ T)
    return np.stack(out)


def abs_to_rel(abs_T):
    """rel[i] = inv(abs[i+1]) @ abs[i] — reference convention
    (cama/pose_transformer.py:183-196). Returns [N-1, 4, 4]."""
    xp = _ns(abs_T)
    return _mm(xp, inv_se3(abs_T[1:]), abs_T[:-1])
