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


# ---------------------------------------------------------------------------
# round-4 review findings


def test_frame_cache_put_own_freezes_array(tmp_path):
    """put(own=True) skips the defensive copy, so the store itself must
    freeze the handed-over array — a caller mutating it afterwards would
    bake the mutation into the persistent cache (or race the async writer)."""
    from cama_tpu.io.frame_cache import FrameCache

    for async_writes in (False, True):
        fc = FrameCache(tmp_path / f"fc-{async_writes}", 2, 1, (4, 6),
                        key="k", async_writes=async_writes)
        img = np.ones((4, 6, 3), np.uint8)
        fc.put(0, 0, img, own=True)
        assert not img.flags.writeable
        with pytest.raises(ValueError):
            img[0, 0, 0] = 9
        # non-owned puts copy, so the caller's array stays writable
        img2 = np.ones((4, 6, 3), np.uint8)
        fc.put(1, 0, img2)
        assert img2.flags.writeable
        fc.flush()


def test_evaluate_scene_batch_host_backend_routes_per_scene(tmp_path):
    """MapEvaluator(backend='host') through the fleet API must serve the
    host evaluators per scene (its whole point is zero device dispatch /
    compile wait), matching per-scene host results, with None slots for
    GT-less scenes — not silently dispatch the stacked device programs."""
    from cama_tpu.eval.map_metrics import MapEvaluator
    from cama_tpu.io.fixture import add_instance_masks, make_fixture_clip
    from cama_tpu.pipeline import ClipPipeline

    pipes = []
    for i, nf in enumerate((3, 4)):
        clip = make_fixture_clip(tmp_path, scene_name=f"hb-{i}", n_frames=nf,
                                 with_images=False, with_lidar=False, seed=i)
        if i == 0:  # scene 1 ships no GT: expect a None result slot
            add_instance_masks(clip)
        pipes.append(ClipPipeline(clip_path=str(clip), chunk=2))
    ev = MapEvaluator(tolerance=3, max_radius=8, backend="host")
    batch = ev.evaluate_scene_batch(pipes, "cama", instances=True)
    assert batch[1] is None
    single = ev.evaluate_scene_all(pipes[0], "cama")
    assert batch[0]["frames_evaluated"] == single["frames_evaluated"] > 0
    for k in ("SRE", "precision", "recall", "f1", "instance_precision"):
        np.testing.assert_allclose(batch[0][k], single[k], rtol=1e-9,
                                   err_msg=k)


def test_sharded_fleet_eval_rejects_host_backend():
    """The sharded fleet path is a multi-device program; backend='host' has
    no mesh to shard over and must fail loudly, not dispatch device code."""
    from cama_tpu.eval.map_metrics import MapEvaluator

    ev = MapEvaluator(backend="host")
    with pytest.raises(ValueError, match="host"):
        ev.evaluate_scene_batch_sharded([], mesh=None)


def test_exit_after_flushes_stdio_before_os_exit(monkeypatch):
    """os._exit skips interpreter finalization (no stdio flush): with stdout
    block-buffered (piped runs), the crash-safe exit path would silently
    drop the process's last output — e.g. the report tool's single JSON
    line.  exit_after must flush both streams first."""
    import atexit
    import os as os_mod
    import sys

    import cama_tpu.pipeline as pl
    from cama_tpu import cli

    calls = {}
    monkeypatch.setattr(pl, "warms_in_flight", lambda: True)
    monkeypatch.setattr(atexit, "_run_exitfuncs",
                        lambda: calls.setdefault("atexit", True))

    class Rec:
        def __init__(self):
            self.flushed = False

        def flush(self):
            self.flushed = True

    out, err = Rec(), Rec()
    monkeypatch.setattr(sys, "stdout", out)
    monkeypatch.setattr(sys, "stderr", err)
    monkeypatch.setattr(os_mod, "_exit", lambda rc: calls.setdefault("rc", rc))
    with pytest.raises(SystemExit):  # the stubbed os._exit returns
        cli.exit_after(5)
    assert calls == {"atexit": True, "rc": 5}
    assert out.flushed and err.flushed
