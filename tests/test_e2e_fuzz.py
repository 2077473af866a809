"""Randomized end-to-end parity fuzz: varied fixture geometries (seed, frame
count, pose-gap drops, flat/bumpy height) rendered by BOTH implementations,
compared at the pixel level.  Heavier than the fixed-fixture parity tests —
two trials keep suite time sane while varying every knob."""
import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available
from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.pipeline import ClipPipeline

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")

add_reference_to_path()

from test_lift_geometry import reference_frame_outputs  # noqa: E402


@pytest.mark.parametrize("trial", range(2))
def test_randomized_scene_parity(tmp_path, trial):
    rng = np.random.default_rng(500 + trial)
    n_frames = int(rng.integers(4, 9))
    drops = tuple(rng.choice(n_frames, size=rng.integers(0, 3), replace=False).tolist())
    clip = make_fixture_clip(
        tmp_path, n_frames=n_frames, with_images=False, with_lidar=False,
        seed=int(rng.integers(0, 1000)),
        drop_scmv_rows=drops,
        flat_height=bool(rng.integers(0, 2)),
        traj_t_offset=float(rng.uniform(0, 2)),
        fps=float(rng.uniform(8, 12)),
    )
    source = ["cama", "nuscenes"][trial % 2]
    ref = reference_frame_outputs(clip, source)

    pipe = ClipPipeline(clip_path=clip, chunk=4)
    fm = pipe.frame_matrices(source)
    ours_valid = set(int(i) for i, v in zip(fm.frame_indices, fm.frame_valid) if v)
    assert ours_valid == set(ref.keys())  # skip-frame parity under random drops

    # compare rendered class rasters against reference-projected points:
    # every reference point must land on a painted pixel of its class fringe
    rasters = dict(pipe.iter_overlay_rasters(source))
    names = pipe.scene.flat[source].class_names
    mismatches = total = 0
    for idx, frame in ref.items():
        for c, cam in enumerate(pipe.scene.camera_list):
            r = rasters[idx][c]
            for cls_name, vu in frame[cam]:
                pix = vu.astype(np.int32)
                total += len(pix)
                painted = r[pix[:, 0], pix[:, 1]]
                mismatches += int((painted == 0).sum())
    if total:
        assert mismatches / total < 0.001, f"{mismatches}/{total} reference points unpainted"
