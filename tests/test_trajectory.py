"""Parity tests: cama_tpu.se3.Trajectory vs the reference PoseTransformer
(run live from /root/reference; skipped if the reference isn't mounted)."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from conftest import add_reference_to_path, reference_available
from cama_tpu.se3 import Trajectory, seek_by_timestamps
from cama_tpu.se3.codec import transforms_to_tum, tum_to_transforms

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

add_reference_to_path()
from cama.pose_transformer import PoseTransformer  # noqa: E402

RNG = np.random.default_rng(7)


def random_tum(n, t0=1600000000.0, dt=0.1):
    q = RNG.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = t0 + np.arange(n) * dt + RNG.uniform(0, 0.01, size=n)
    t.sort()
    xyz = RNG.normal(size=(n, 3)) * 20
    return np.concatenate([t[:, None], xyz, q], axis=1)


@pytest.fixture(scope="module")
def tum():
    return random_tum(50)


def make_pair(tum):
    ref = PoseTransformer()
    ref.loadarray(tum.copy())
    ours = Trajectory()
    ours.loadarray(tum.copy())
    return ref, ours


def test_loadarray_tum_and_as_transform(tum):
    ref, ours = make_pair(tum)
    np.testing.assert_allclose(ours.as_transform(True), ref.as_transform(True), atol=1e-12)
    np.testing.assert_allclose(ours.as_transform(False), ref.as_transform(False), atol=1e-12)


def test_loadarray_kitti():
    rots = R.from_quat(RNG.normal(size=(20, 4))).as_matrix()
    kitti = np.concatenate([rots, RNG.normal(size=(20, 3, 1))], axis=2).reshape(20, 12)
    ref = PoseTransformer()
    ref.loadarray(kitti.copy(), style="kitti")
    ours = Trajectory()
    ours.loadarray(kitti.copy(), style="kitti")
    np.testing.assert_allclose(ours.as_transform(True), ref.as_transform(True), atol=1e-12)
    np.testing.assert_allclose(ours.as_transform(False), ref.as_transform(False), atol=1e-12)


def test_loadarray_asl():
    n = 15
    q = RNG.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    asl = np.zeros((n, 17))
    asl[:, 0] = (1600000000 + np.arange(n) * 0.1) * 1e9
    asl[:, 1:4] = RNG.normal(size=(n, 3))
    asl[:, 4:8] = q[:, [3, 0, 1, 2]]
    ref = PoseTransformer()
    ref.loadarray(asl.copy(), style="asl")
    ours = Trajectory()
    ours.loadarray(asl.copy(), style="asl")
    np.testing.assert_allclose(ours.as_transform(True), ref.as_transform(True), atol=1e-12)
    np.testing.assert_allclose(ours.timestamps[:, 0], ref.timestamps[:, 0], atol=1e-12)


def test_normalize_and_rotate_ops(tum):
    E = np.eye(4)
    E[:3, :3] = R.from_euler("zxy", [0.3, -0.1, 0.2]).as_matrix()
    E[:3, 3] = [1.0, -2.0, 0.5]
    for op, args in [
        ("normalize2origin", ()),
        ("normalize2center", ()),
        ("left_rotate", (E,)),
        ("right_rotate", (E,)),
        ("transform", (E,)),
    ]:
        ref, ours = make_pair(tum)
        getattr(ref, op)(*args)
        getattr(ours, op)(*args)
        np.testing.assert_allclose(
            ours.as_transform(True), ref.as_transform(True), atol=1e-9, err_msg=op
        )


def test_as_representations(tum):
    ref, ours = make_pair(tum)
    np.testing.assert_allclose(
        np.abs(np.sum(ours.as_quaternions() * np.asarray(ref.as_quaternions()), axis=-1)),
        1.0,
        atol=1e-12,
    )
    np.testing.assert_allclose(ours.as_euler(True), ref.as_euler(True), atol=1e-9)
    np.testing.assert_allclose(ours.as_euler(False), ref.as_euler(False), atol=1e-9)
    np.testing.assert_allclose(ours.as_axis_angle(True), ref.as_axis_angle(True), atol=1e-9)
    np.testing.assert_allclose(ours.as_translations(True), ref.as_translations(True), atol=1e-12)
    np.testing.assert_allclose(ours.as_trans_quat()[:, :3], ref.as_trans_quat()[:, :3], atol=1e-12)


def test_dumparray_roundtrip(tum):
    ref, ours = make_pair(tum)
    a, b = ours.dumparray(), ref.dumparray()
    assert a.shape == b.shape
    np.testing.assert_allclose(a[:, :4], b[:, :4], atol=1e-12)
    np.testing.assert_allclose(np.abs(np.sum(a[:, 4:] * b[:, 4:], axis=-1)), 1.0, atol=1e-12)


def test_seek_exact_interpolated_and_invalid(tum):
    ref, ours = make_pair(tum)
    ts = tum[:, 0]
    queries = [
        ts[3],  # exact
        (ts[3] + ts[4]) / 2,  # interior
        ts[0] - 0.5e-9,  # snap-front window
        ts[10] + 1e-4,
    ]
    for q in queries:
        expected = ref.seek_by_timestamp(float(q), 0.5, interpolate=True)
        got = ours.seek_by_timestamp(float(q), 0.5, interpolate=True)
        np.testing.assert_allclose(got, expected, atol=1e-9, err_msg=f"q={q}")

    for q in [ts[-1] + 1.0, ts[0] - 1.0]:
        with pytest.raises(RuntimeError):
            ref.seek_by_timestamp(float(q), 0.5, interpolate=True)
        with pytest.raises(RuntimeError):
            ours.seek_by_timestamp(float(q), 0.5, interpolate=True)


def test_seek_nearest_mode(tum):
    ref, ours = make_pair(tum)
    ts = tum[:, 0]
    for q in [ts[5] + 0.01, ts[5] - 0.02, ts[0] - 0.03, ts[-1] + 0.04]:
        expected = ref.seek_by_timestamp(float(q), 0.5, interpolate=False)
        got = ours.seek_by_timestamp(float(q), 0.5, interpolate=False)
        np.testing.assert_allclose(got, expected, atol=1e-12, err_msg=f"q={q}")


def test_seek_many_matches_scalar_seek(tum):
    ref, ours = make_pair(tum)
    ts = tum[:, 0]
    queries = np.concatenate([ts[1:20] + RNG.uniform(0, 0.05, 19), [ts[-1] + 99.0]])
    out, valid = ours.seek_many(queries, t_max_diff=0.5, interpolate=True)
    assert not valid[-1]
    for i, q in enumerate(queries[:-1]):
        try:
            expected = ref.seek_by_timestamp(float(q), 0.5, interpolate=True)
        except RuntimeError:
            assert not valid[i]
            continue
        assert valid[i]
        np.testing.assert_allclose(out[i], expected, atol=1e-9)


def test_seek_many_gap_exceeds_tmaxdiff():
    tum = random_tum(10, dt=1.0)
    ref, ours = make_pair(tum)
    q = (tum[3, 0] + tum[4, 0]) / 2
    with pytest.raises(RuntimeError):
        ref.seek_by_timestamp(float(q), 0.5, interpolate=True)
    _, valid = ours.seek_many([q], t_max_diff=0.5, interpolate=True)
    assert not valid[0]


def test_seek_jax_path_close_to_host(tum):
    import jax.numpy as jnp

    _, ours = make_pair(tum)
    ts = tum[:, 0] - tum[0, 0]  # relative time keeps f32 viable
    T = ours.as_transform(True)
    queries = ts[1:-1] + 0.013
    host, hv = seek_by_timestamps(ts, T, queries, 0.5, interpolate=True)
    dev, dv = seek_by_timestamps(ts, jnp.asarray(T, dtype=jnp.float32), queries, 0.5, True)
    np.testing.assert_array_equal(np.asarray(dv), hv)
    np.testing.assert_allclose(np.asarray(dev), host, atol=2e-4)


def test_relative_quaternion_quirk_parity():
    """The reference inverts composed (rot, trans) pieces when building
    relative transforms (cama/pose_transformer.py:174-181) — keep that."""
    n = 6
    q = RNG.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = RNG.normal(size=(n, 3))
    ref = PoseTransformer()
    ref.from_relative_quaternion(q)
    ref.from_translation(t, absolute=False)
    ours = Trajectory()
    ours.from_relative_quaternion(q)
    ours.from_translation(t, absolute=False)
    np.testing.assert_allclose(ours.as_transform(True), ref.as_transform(True), atol=1e-12)


def test_codec_tum_roundtrip():
    tum = random_tum(12)
    T, ts = tum_to_transforms(tum)
    back = transforms_to_tum(T, ts)
    T2, ts2 = tum_to_transforms(back)
    np.testing.assert_allclose(T, T2, atol=1e-12)
    np.testing.assert_allclose(ts, ts2, atol=0)


def test_inplace_ops_invalidate_relative_cache():
    """right_rotate/transform mutate the absolute poses; relative-frame
    accessors must reflect the NEW trajectory, not a stale cache."""
    from cama_tpu.se3.core import abs_to_rel

    rng = np.random.default_rng(1)
    tum = np.zeros((6, 8))
    tum[:, 0] = np.arange(6)
    tum[:, 1:4] = rng.uniform(-5, 5, (6, 3))
    quat = rng.normal(size=(6, 4))
    tum[:, 4:] = quat / np.linalg.norm(quat, axis=1, keepdims=True)
    E = np.eye(4)
    E[:3, 3] = [1.0, -2.0, 0.5]

    tr = Trajectory()
    tr.loadarray(tum)
    _ = tr.as_transform(False)  # populate the relative cache
    tr.right_rotate(E)
    got_rel = tr.as_transform(False)
    want_rel = abs_to_rel(tr.as_transform(True))
    np.testing.assert_allclose(got_rel, want_rel, atol=1e-12)

    tr2 = Trajectory()
    tr2.loadarray(tum)
    _ = tr2.as_transform(False)
    tr2.transform(E)
    np.testing.assert_allclose(tr2.as_transform(False),
                               abs_to_rel(tr2.as_transform(True)), atol=1e-12)


def test_ensure_abs_informative_error():
    import pytest

    tr = Trajectory()
    with pytest.raises(RuntimeError, match="load data first"):
        tr.as_transform(True)
