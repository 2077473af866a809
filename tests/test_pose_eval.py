"""Parity tests: cama_tpu.eval.PoseEvaluator vs the reference
cama/pose_evaluator.py run live on synthetic noisy trajectories."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from conftest import add_reference_to_path, reference_available
from cama_tpu.eval.pose_metrics import PoseEvaluator, associate, umeyama_alignment

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

add_reference_to_path()
from cama.pose_evaluator import PoseEvaluator as RefEvaluator  # noqa: E402

RNG = np.random.default_rng(11)


def synthetic_pair(n=1200, dt=0.1, drift=0.002, rot_noise=0.002, t_jitter=0.004, seed=11):
    """A driving-like GT trajectory + noisy/drifting/misaligned prediction.
    Self-seeded so golden generation and tests see identical data regardless
    of call order."""
    rng = np.random.default_rng(seed)
    t = 1600000000.0 + np.arange(n) * dt
    yaw = np.cumsum(rng.normal(0.0, 0.01, n)) + 0.02 * np.sin(np.arange(n) * 0.01)
    speed = 8.0 + 2.0 * np.sin(np.arange(n) * 0.005)
    xy = np.cumsum(np.stack([np.cos(yaw), np.sin(yaw)], -1) * (speed * dt)[:, None], axis=0)
    z = 0.3 * np.sin(np.arange(n) * 0.003)
    rots = R.from_euler("zxy", np.stack([yaw, 0.01 * np.sin(yaw), np.zeros(n)], -1))
    gt = np.concatenate([t[:, None], xy, z[:, None], rots.as_quat()], axis=1)

    # prediction: drift + noise + a rigid offset + time jitter
    pred_xyz = gt[:, 1:4] * 1.01 + np.cumsum(rng.normal(0, drift, (n, 3)), axis=0)
    dq = R.from_rotvec(rng.normal(0, rot_noise, (n, 3)))
    pred_rots = dq * rots
    misalign = R.from_euler("zxy", [0.2, 0.05, -0.1])
    pred_xyz = pred_xyz @ misalign.as_matrix().T + np.array([5.0, -3.0, 1.0])
    pred_rots = misalign * pred_rots
    tp = t + rng.uniform(-t_jitter, t_jitter, n)
    pred = np.concatenate([tp[:, None], pred_xyz, pred_rots.as_quat()], axis=1)
    # drop some rows to force non-trivial association
    keep = rng.random(n) > 0.03
    return gt, pred[keep]


@pytest.fixture(scope="module")
def pair():
    return synthetic_pair()


def _compare(result, ref_result):
    assert set(result.keys()) == set(ref_result.keys())
    for key in ref_result:
        a, b = result[key], ref_result[key]
        if key == "quaternion":
            assert abs(np.dot(np.asarray(a), np.asarray(b))) > 1 - 1e-9
        elif isinstance(b, np.ndarray):
            np.testing.assert_allclose(a, b, atol=1e-9, err_msg=key)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-9, err_msg=key)


@pytest.mark.parametrize("alignment", ["None", "scale", "scale_7dof", "7dof", "6dof"])
def test_eval_matches_reference(pair, alignment):
    gt, pred = pair
    ours = PoseEvaluator(alignment=alignment).eval(gt.copy(), pred.copy())
    theirs = RefEvaluator(alignment=alignment).eval(gt.copy(), pred.copy())
    _compare(ours, theirs)


def test_eval_with_scale_6dof(pair):
    gt, pred = pair
    ours = PoseEvaluator(alignment="6dof", scale=2.0).eval(gt.copy(), pred.copy())
    theirs = RefEvaluator(alignment="6dof", scale=2.0).eval(gt.copy(), pred.copy())
    _compare(ours, theirs)


def test_scale_requires_6dof():
    with pytest.raises(RuntimeError):
        PoseEvaluator(alignment="7dof", scale=2.0)
    with pytest.raises(RuntimeError):
        RefEvaluator(alignment="7dof", scale=2.0)


def test_associate_matches_reference(pair):
    gt, pred = pair
    ref = RefEvaluator(alignment="None")
    first = {row[0]: row[1:] for row in gt}
    second = {row[0]: row[1:] for row in pred}
    theirs = ref.associate(first, second)
    ours = associate(list(first), list(second), ref.max_t_diff, ref.offset)
    assert len(ours) == len(theirs)
    for (a1, b1), (a2, b2) in zip(ours, theirs):
        assert a1 == a2 and b1 == b2


def test_umeyama_matches_reference():
    ref = RefEvaluator(alignment="None")
    x = RNG.normal(size=(3, 200))
    Rm = R.from_euler("zxy", [0.4, -0.2, 0.1]).as_matrix()
    y = 1.7 * Rm @ x + np.array([[1.0], [2.0], [-0.5]]) + RNG.normal(0, 0.01, (3, 200))
    for with_scale in (False, True):
        r1, t1, c1 = umeyama_alignment(x, y, with_scale)
        r2, t2, c2 = ref.umeyama_alignment(x, y, with_scale)
        np.testing.assert_allclose(r1, r2, atol=1e-12)
        np.testing.assert_allclose(t1, t2, atol=1e-12)
        np.testing.assert_allclose(c1, c2, atol=1e-12)


def test_too_few_matches_raises(pair):
    gt, pred = pair
    pred_shifted = pred.copy()
    pred_shifted[:, 0] += 10000.0
    with pytest.raises(RuntimeError):
        PoseEvaluator(alignment="None").eval(gt, pred_shifted)


def test_plots_smoke(pair):
    gt, pred = pair
    pe = PoseEvaluator(alignment="7dof")
    pe.eval(gt.copy(), pred.copy())
    img = pe.plot_trajectory("xz")
    assert img.ndim == 3 and img.shape[2] == 3
    t_img, r_img = pe.plot_error()
    assert t_img.ndim == 3 and r_img.ndim == 3


def test_cli_roundtrip(tmp_path, pair, capsys):
    from cama_tpu.eval.pose_metrics import main

    gt, pred = pair
    gt_path, pred_path = tmp_path / "gt.txt", tmp_path / "pred.txt"
    np.savetxt(gt_path, gt)
    np.savetxt(pred_path, pred)
    main(["--pred", str(pred_path), "--gt", str(gt_path), "--alignment", "7dof"])
    out = capsys.readouterr().out
    assert "RTE" in out and "ATE" in out


def test_cli_plot_dir(tmp_path, pair, capsys):
    """--plot-dir writes the reference evaluator's plot set as PNGs
    (cama/pose_evaluator.py:349-459 saved these from its workflow)."""
    from cama_tpu.eval.pose_metrics import main

    gt, pred = pair
    gt_path, pred_path = tmp_path / "gt.txt", tmp_path / "pred.txt"
    np.savetxt(gt_path, gt)
    np.savetxt(pred_path, pred)
    plot_dir = tmp_path / "plots"
    main(["--pred", str(pred_path), "--gt", str(gt_path),
          "--plot-dir", str(plot_dir), "--plot-mode", "xy"])
    import cv2

    for name in ("trajectory.png", "translation_error.png",
                 "rotation_error.png"):
        img = cv2.imread(str(plot_dir / name))
        assert img is not None and img.ndim == 3, name
