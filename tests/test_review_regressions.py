"""Regression tests for issues found in the round-1 code review."""
import numpy as np
import pytest

import jax.numpy as jnp

from cama_tpu.eval.map_metrics import frame_metrics
from cama_tpu.ops.lift import flatten_instances
from cama_tpu.ops.raster import compact_points, pack_cls_2bit, unpack_cls_2bit
from cama_tpu.se3.trajectory import seek_by_timestamps


def test_compact_points_k_larger_than_p():
    """k > P must pad, not crash (small scenes / non-default padding)."""
    vu = np.stack([np.arange(5), np.arange(5)], -1).astype(np.float32)
    keep = np.ones(5, bool)
    cls = np.zeros(5, np.int32)
    vals, counts = compact_points(jnp.asarray(vu), jnp.asarray(keep), jnp.asarray(cls),
                                  16, 16, 8)
    v = np.asarray(vals)
    assert v.shape == (8,)
    assert (v >= 0).sum() == 5 and (v[5:] == -1).all()
    assert int(counts) == 5


def test_pack_2bit_non_multiple_of_4_width():
    r = np.arange(2 * 7, dtype=np.uint8).reshape(2, 7) % 4
    packed = np.asarray(pack_cls_2bit(jnp.asarray(r)))
    back = unpack_cls_2bit(packed, 7)
    np.testing.assert_array_equal(back, r)


def test_flatten_instances_rejects_class_overflow():
    instances = [(f"cls{i}", np.zeros((3, 3), np.float32)) for i in range(9)]
    with pytest.raises(ValueError, match="map classes"):
        flatten_instances(instances, class_names=[])


def test_seek_duplicate_timestamps_first_match():
    """Reference returns the FIRST pose whose stamp is within 1e-9 of the
    query; a run of near-equal stamps must resolve to the run's first index."""
    ts = np.array([1.0, 1.0 + 4e-10, 1.0 + 8e-10, 2.0, 3.0])
    T = np.tile(np.eye(4), (5, 1, 1))
    for i in range(5):
        T[i, 0, 3] = i  # distinguishable poses
    out, valid = seek_by_timestamps(ts, T, np.array([1.0 + 5e-10]), 0.5, interpolate=True)
    assert valid[0]
    assert out[0][0, 3] == 0.0  # the first of the run, not a later neighbor


def test_frame_metrics_tolerance_exceeds_max_radius():
    """Precision and recall must use the same tolerance radius even when it
    exceeds the SRE cap."""
    gt = np.zeros((1, 32, 32), bool)
    gt[0, 16, 16] = True
    # one point 6 px away (chebyshev), tolerance 8 > max_radius 4
    vu = np.array([[[10.0, 16.0]]], np.float32)
    keep = np.ones((1, 1), bool)
    out = frame_metrics(jnp.asarray(gt), jnp.asarray(vu), jnp.asarray(keep), 4, 8)
    assert float(out["sre_sum"]) == 4.0  # capped at max_radius
    assert float(out["n_hit"]) == 1.0  # within tolerance 8
    assert float(out["gt_covered"]) == 1.0  # recall symmetric


def test_frame_matrices_cache_keyed_by_tmaxdiff(tmp_path):
    from cama_tpu.io.fixture import make_fixture_clip
    from cama_tpu.pipeline import ClipPipeline

    clip = make_fixture_clip(tmp_path, n_frames=6, with_images=False, with_lidar=False,
                             drop_scmv_rows=(2, 3, 4))
    pipe = ClipPipeline(clip_path=clip)
    loose = pipe.frame_matrices("cama", t_max_diff=10.0)
    strict = pipe.frame_matrices("cama", t_max_diff=0.15)
    assert loose.frame_valid.sum() > strict.frame_valid.sum()
