"""Golden tests for cama_tpu.se3.core against scipy (the reference's rotation
backend, cama/pose_transformer.py:3-4) in float64, plus jax-path consistency."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R
from scipy.spatial.transform import Slerp

from cama_tpu.se3 import core

RNG = np.random.default_rng(0)


def random_quats(n):
    q = RNG.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def random_transforms(n, scale=10.0):
    T = np.tile(np.eye(4), (n, 1, 1))
    T[:, :3, :3] = R.from_quat(random_quats(n)).as_matrix()
    T[:, :3, 3] = RNG.normal(size=(n, 3)) * scale
    return T


def test_inv_se3_matches_numpy_inverse():
    T = random_transforms(64)
    np.testing.assert_allclose(core.inv_se3(T), np.linalg.inv(T), atol=1e-9)
    # single (unbatched) input
    np.testing.assert_allclose(core.inv_se3(T[0]), np.linalg.inv(T[0]), atol=1e-9)


def test_quat_to_matrix_matches_scipy():
    q = random_quats(256)
    np.testing.assert_allclose(core.quat_to_matrix(q), R.from_quat(q).as_matrix(), atol=1e-12)


def test_matrix_to_quat_matches_scipy():
    m = R.from_quat(random_quats(256)).as_matrix()
    ours = core.matrix_to_quat(m)
    theirs = R.from_matrix(m).as_quat()
    # sign of quaternion is only defined up to +-; compare rotations
    np.testing.assert_allclose(
        np.abs(np.sum(ours * theirs, axis=-1)), np.ones(256), atol=1e-12
    )


def test_matrix_to_quat_roundtrip_near_identity_and_pi():
    for rv in [np.zeros(3), [np.pi, 0, 0], [0, np.pi, 0], [0, 0, np.pi - 1e-8]]:
        m = R.from_rotvec(np.asarray(rv)[None]).as_matrix()
        q = core.matrix_to_quat(m)
        np.testing.assert_allclose(core.quat_to_matrix(q), m, atol=1e-9)


def test_quat_multiply_matches_scipy():
    p, q = random_quats(128), random_quats(128)
    theirs = (R.from_quat(p) * R.from_quat(q)).as_quat()
    ours = core.quat_multiply(p, q)
    np.testing.assert_allclose(np.abs(np.sum(ours * theirs, axis=-1)), 1.0, atol=1e-12)


def test_rotvec_roundtrip_matches_scipy():
    rv = RNG.normal(size=(128, 3)) * np.array([0.001, 1.0, 3.0])
    np.testing.assert_allclose(
        core.quat_to_matrix(core.rotvec_to_quat(rv)), R.from_rotvec(rv).as_matrix(), atol=1e-12
    )
    q = random_quats(128)
    np.testing.assert_allclose(core.quat_to_rotvec(q), R.from_quat(q).as_rotvec(), atol=1e-9)


def test_quat_slerp_matches_scipy_slerp():
    q = random_quats(2)
    slerp = Slerp([0.0, 1.0], R.from_quat(q))
    for ratio in [0.0, 0.1, 0.5, 0.77, 1.0]:
        theirs = slerp(ratio).as_quat()
        ours = core.quat_slerp(q[0], q[1], np.asarray(ratio))
        assert abs(np.dot(ours, theirs)) > 1 - 1e-12


def test_slerp_transform_matches_reference_semantics():
    """Reference SlerpTransform lerps the whole matrix then replaces the
    rotation block (cama/pose_transformer.py:24-44)."""
    T0, T1 = random_transforms(2)
    for ratio in [0.0, 0.25, 0.5, 1.0]:
        ours = core.slerp_transform(T0, T1, np.asarray(ratio))
        slerp = Slerp([0, 1], R.from_matrix(np.stack([T0[:3, :3], T1[:3, :3]])))
        expected = T0 * (1 - ratio) + T1 * ratio
        expected[:3, :3] = slerp(ratio).as_matrix()
        np.testing.assert_allclose(ours, expected, atol=1e-9)


@pytest.mark.parametrize("degrees", [False, True])
@pytest.mark.parametrize(
    "seq",
    [
        "xyz", "XYZ", "zxy", "ZXY", "yzx", "YZX", "xzy", "XZY", "zyx", "ZYX", "yxz", "YXZ",
        "zxz", "ZXZ", "xyx", "XYX", "yzy", "YZY", "zyz", "ZYZ", "xzx", "XZX", "yxy", "YXY",
    ],
)
def test_euler_both_ways_matches_scipy(seq, degrees):
    angles = RNG.uniform(-1.2, 1.2, size=(32, 3))
    if degrees:
        angles = np.degrees(angles)
    m_scipy = R.from_euler(seq, angles, degrees=degrees).as_matrix()
    m_ours = core.quat_to_matrix(core.from_euler(seq, angles, degrees=degrees))
    np.testing.assert_allclose(m_ours, m_scipy, atol=1e-12)

    extracted = core.as_euler(m_scipy, seq, degrees=degrees)
    theirs = R.from_matrix(m_scipy).as_euler(seq, degrees=degrees)
    np.testing.assert_allclose(extracted, theirs, atol=1e-8)


def test_rel_abs_roundtrip():
    rel = random_transforms(32)
    absT = core.rel_to_abs(rel)
    assert absT.shape == (33, 4, 4)
    np.testing.assert_allclose(absT[0], np.eye(4), atol=0)
    # reference convention: rel_back[i] = inv(abs[i+1]) @ abs[i]
    rel_back = core.abs_to_rel(absT)
    np.testing.assert_allclose(rel_back, core.inv_se3(rel), atol=1e-9)


def test_jax_paths_match_numpy():
    import jax.numpy as jnp

    T = random_transforms(16).astype(np.float32)
    np.testing.assert_allclose(core.inv_se3(jnp.asarray(T)), core.inv_se3(T), atol=1e-5)
    q = random_quats(16).astype(np.float32)
    np.testing.assert_allclose(
        core.quat_to_matrix(jnp.asarray(q)), core.quat_to_matrix(q), atol=1e-6
    )
    m = core.quat_to_matrix(q)
    qa = np.asarray(core.matrix_to_quat(jnp.asarray(m)))
    qb = core.matrix_to_quat(m)
    np.testing.assert_allclose(np.abs(np.sum(qa * qb, axis=-1)), 1.0, atol=1e-6)
    rel = random_transforms(8).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(core.rel_to_abs(jnp.asarray(rel))), core.rel_to_abs(rel), atol=1e-4
    )


def test_as_euler_gimbal_lock_both_poles():
    """Tait-Bryan lock at sin(beta) = -1 used the +1 pole's alpha formula in
    round 1, returning angles that did not reproduce the input rotation."""
    from scipy.spatial.transform import Rotation as R

    from cama_tpu.se3.core import as_euler

    rng = np.random.default_rng(0)
    for seq in ["XYZ", "XZY", "YXZ", "YZX", "ZXY", "ZYX", "xyz", "zyx"]:
        for pole in (np.pi / 2, -np.pi / 2):
            for _ in range(5):
                a, g = rng.uniform(-np.pi, np.pi, 2)
                m = R.from_euler(seq, [a, pole, g]).as_matrix()
                got = np.asarray(as_euler(m, seq))
                back = R.from_euler(seq, got).as_matrix()
                np.testing.assert_allclose(back, m, atol=1e-6,
                                           err_msg=f"{seq} pole {pole}")
