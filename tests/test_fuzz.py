"""Seeded differential fuzzing: many random configurations of the paths the
framework's exactness claims rest on (seek semantics vs the reference, all
rasterization variants vs cv2 paint order)."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from conftest import add_reference_to_path, reference_available
from cama_tpu.ops.lift import COLOR_MAPS
from cama_tpu.ops.raster import (
    build_color_table,
    compact_points,
    composite_overlay_host,
    paint_sparse_host,
    rasterize_from_compact,
    rasterize_packed,
    rasterize_packed_fast,
)
from cama_tpu.se3.trajectory import Trajectory

cv2 = pytest.importorskip("cv2")


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_raster_paths_agree_with_cv2(trial):
    rng = np.random.default_rng(100 + trial)
    h = int(rng.integers(16, 80))
    w = int(rng.integers(16, 120))
    n = int(rng.integers(1, 600))
    names = ["lane_marking", "Road_teeth", "Crosswalk_Line"]
    if rng.random() < 0.5:  # clustered points stress overlap ordering
        centers = rng.uniform([0, 0], [h, w], size=(3, 2))
        vu = centers[rng.integers(0, 3, n)] + rng.normal(0, 3.0, (n, 2))
    else:
        vu = rng.uniform([0, 0], [h, w], size=(n, 2))
    vu = np.clip(vu, 0, [h - 1e-3, w - 1e-3]).astype(np.float32)
    cls = rng.integers(0, 3, n).astype(np.int32)
    keep = rng.random(n) > 0.2
    table = build_color_table(names)
    base = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)

    # cv2 ground truth
    ref = base.copy()
    for i in range(n):
        if not keep[i]:
            continue
        eff = names[cls[i]] if names[cls[i]] == "lane_marking" else "Crosswalk_Line"
        color = tuple(COLOR_MAPS[eff][::-1].tolist())
        v, u = vu[i].astype(np.int32)
        cv2.circle(ref, (int(u), int(v)), 2, color, -1)

    # path 1: 13-offset scatter
    p1 = np.asarray(rasterize_packed(vu[None], keep[None], cls, w, h))[0]
    np.testing.assert_array_equal(composite_overlay_host(base, p1, table), ref)
    # path 2: center scatter + dilation
    p2 = np.asarray(rasterize_packed_fast(vu[None], keep[None], cls, w, h))[0]
    np.testing.assert_array_equal(composite_overlay_host(base, p2, table), ref)
    # path 3: dedup+compact then scatter
    k = int(rng.integers(1, 2 * n + 2))
    vals, counts = compact_points(jnp.asarray(vu), jnp.asarray(keep), jnp.asarray(cls), w, h, k)
    if int(counts) <= k:
        p3 = np.asarray(rasterize_from_compact(vals[None], w, h))[0]
        np.testing.assert_array_equal(composite_overlay_host(base, p3, table), ref)
        # path 4: sparse host paint
        img4 = base.copy()
        paint_sparse_host(img4, np.asarray(vals), int(counts), table, w)
        np.testing.assert_array_equal(img4, ref)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("trial", range(6))
def test_fuzz_seek_vs_reference(trial):
    add_reference_to_path()
    from cama.pose_transformer import PoseTransformer

    rng = np.random.default_rng(200 + trial)
    n = int(rng.integers(4, 60))
    t = np.sort(1e9 + np.cumsum(rng.exponential(0.1, n)))
    if trial % 3 == 0:  # inject near-duplicate stamps
        t[n // 2] = t[n // 2 - 1] + rng.uniform(0, 2e-9)
        t.sort()
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    tum = np.concatenate([t[:, None], rng.normal(size=(n, 3)), q], axis=1)

    ref = PoseTransformer()
    ref.loadarray(tum.copy())
    ours = Trajectory()
    ours.loadarray(tum.copy())

    queries = np.concatenate([
        rng.uniform(t[0] - 0.2, t[-1] + 0.2, 30),
        t[rng.integers(0, n, 5)],  # exact hits
        t[rng.integers(0, n, 3)] + rng.uniform(-2e-9, 2e-9, 3),  # tolerance edge
    ])
    for interpolate in (True, False):
        tmd = float(rng.uniform(0.05, 0.5))
        out, valid = ours.seek_many(queries, tmd, interpolate=interpolate)
        for i, qq in enumerate(queries):
            try:
                expected = ref.seek_by_timestamp(float(qq), tmd, interpolate=interpolate)
            except RuntimeError:
                assert not valid[i], (trial, interpolate, qq)
                continue
            assert valid[i], (trial, interpolate, qq)
            np.testing.assert_allclose(out[i], expected, atol=1e-9)
