"""Frame-sharded map metrics on the virtual CPU mesh == single-device totals."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cama_tpu.eval.map_metrics import MapEvaluator, reduce_metrics
from cama_tpu.io.fixture import add_instance_masks, make_fixture_clip
from cama_tpu.parallel import make_mesh, pad_to_multiple
from cama_tpu.parallel.sharding import sharded_map_metrics
from cama_tpu.pipeline import ClipPipeline


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    c = make_fixture_clip(tmp_path_factory.mktemp("shmet"), n_frames=8,
                          with_images=False, with_lidar=False)
    add_instance_masks(c)
    return c


def test_sharded_metrics_match_single_device(clip):
    assert len(jax.devices()) >= 8
    pipe = ClipPipeline(clip_path=clip, chunk=4)
    ev = MapEvaluator(tolerance=4, max_radius=16)
    single = ev.evaluate_scene(pipe, "cama")

    fm = pipe.frame_matrices("cama")
    fp = pipe.scene.flat["cama"]
    h, w = pipe.scene.output_size
    # build gt mask stack for the valid frames
    gt, As, Bs, fvs = [], [], [], []
    for k, image_idx in enumerate(fm.frame_indices):
        if not fm.frame_valid[k]:
            continue
        masks = [ev.mask_loader(pipe, cam, int(image_idx)) for cam in pipe.scene.camera_list]
        gt.append(np.stack(masks))
        As.append(fm.A[k])
        Bs.append(fm.B[k])
        fvs.append(True)
    mesh = make_mesh(n_frames_axis=8, n_points_axis=1)
    nf = mesh.shape["frames"]
    gt = pad_to_multiple(np.stack(gt), nf)
    As = pad_to_multiple(np.stack(As).astype(np.float32), nf)
    Bs = pad_to_multiple(np.stack(Bs).astype(np.float32), nf)
    fvs = pad_to_multiple(np.asarray(fvs), nf)

    step = sharded_map_metrics(mesh, w, h, 16, 4)
    out = step(
        jnp.asarray(fp.points), jnp.asarray(fp.valid), jnp.asarray(gt),
        jnp.asarray(As), jnp.asarray(Bs), jnp.asarray(fvs),
        pipe._crop_lo, pipe._crop_hi,
    )
    totals = {k: float(v) for k, v in out.items()}
    merged = reduce_metrics([totals])
    for key in ["SRE", "precision", "recall", "f1"]:
        np.testing.assert_allclose(merged[key], single[key], rtol=1e-6, err_msg=key)
