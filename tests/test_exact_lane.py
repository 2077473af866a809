"""The bit-exact device overlay lane (round-4 verdict #4).

`pipeline.iter_overlay_rasters_exact` must produce overlays BITWISE equal to
the f64 host-exact path (which is itself byte-identical to the live
reference — tests/test_pipeline.py + validate).  The mechanism under test:
`ops/geometry.project_frames_checked` flags every point whose keep guards or
pixel quantization sit within an interval-arithmetic f32 error bound of a
decision boundary, and the lane recomputes ONLY those on host in the exact
f64 chain before the device raster pass.
"""
import numpy as np
import pytest

from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.pipeline import ClipPipeline
from cama_tpu.validate import device_frames_for_path, host_exact_frames


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    return make_fixture_clip(tmp_path_factory.mktemp("exact"), n_frames=6)


def _sources(pipe):
    return [s for s in ("cama", "nuscenes") if s in pipe.scene.flat]


def test_exact_lane_bitwise_equals_host_exact(clip):
    pipe = ClipPipeline(clip_path=clip, chunk=4)
    for source in _sources(pipe):
        fm = pipe.frame_matrices(source)
        ids = {int(i) for i, v in zip(fm.frame_indices, fm.frame_valid) if v}
        exact = host_exact_frames(pipe, source, ids)
        dev = device_frames_for_path(pipe.scene, "exact", source, ids,
                                     chunk=4)
        assert set(dev) == set(exact) == ids
        for i in sorted(ids):
            for cam in dev[i]:
                np.testing.assert_array_equal(
                    dev[i][cam], exact[i][cam],
                    err_msg=f"{source} frame {i} {cam}: exact device lane "
                            "diverged from the f64 host-exact path")


def test_checked_flags_cover_every_f64_disagreement(clip):
    """Soundness of the error model: ANY per-point disagreement between the
    f32 device projection and the exact f64 chain (keep flip, or pixel-floor
    flip among kept points) must carry the ambiguity flag — otherwise the
    selective recompute would miss it and the lane's bit-exactness claim
    breaks silently."""
    import jax.numpy as jnp

    from cama_tpu.ops.geometry import project_frame_exact, project_frames_checked

    pipe = ClipPipeline(clip_path=clip, chunk=4)
    for source in _sources(pipe):
        fm, A, B, fv, F = pipe._chunked_AB(source)
        fp = pipe.scene.flat[source]
        points, cls, valid = pipe.device_points(source)
        h, w = pipe.scene.output_size
        from cama_tpu.parallel.sharding import pad_to_multiple

        B64 = pad_to_multiple(fm.B, pipe.chunk)
        B_lo = (B64 - B.astype(np.float64)).astype(np.float32)
        vu, keep, amb = (np.asarray(x) for x in project_frames_checked(
            points, valid, jnp.asarray(A), jnp.asarray(B), jnp.asarray(B_lo),
            jnp.asarray(fv), w, h, pipe._crop_lo, pipe._crop_hi))
        n_amb = n_pts = 0
        for f in range(F):
            if not fm.frame_valid[f]:
                continue
            cam_outs = project_frame_exact(
                fp.points, np.linalg.inv(fm.chassis2world_f32[f]),
                pipe.scene.chassis2cam, pipe.scene.K_scaled, w, h)
            for c, (vu_e, keep_e) in enumerate(cam_outs):
                keep_e = keep_e & fp.valid
                flip = keep[f, c] != keep_e
                both = keep[f, c] & keep_e
                with np.errstate(invalid="ignore"):
                    qdev = vu[f, c].astype(np.int32)
                    qex = np.nan_to_num(vu_e).astype(np.int32)
                pixflip = both & np.any(qdev != qex, axis=-1)
                bad = (flip | pixflip) & ~amb[f]
                assert not bad.any(), (
                    f"{source} frame {f} cam {c}: "
                    f"{int(bad.sum())} unflagged f32/f64 disagreements")
            n_amb += int(amb[f].sum())
            n_pts += int(fp.valid.sum())
        # the flag set must stay a SMALL superset: selective recompute is
        # the design, not a disguised full host lane
        assert n_amb < 0.05 * n_pts, (n_amb, n_pts)
