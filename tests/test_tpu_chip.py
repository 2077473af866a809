"""Real-chip kernel lane: compiles the production kernels on the actual TPU
backend and asserts agreement with forced-CPU outputs of the same programs.

The normal suite pins a virtual CPU mesh (conftest), so these tests only run
in the on-chip lane:

    CAMA_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

CPU goldens are computed in a subprocess (one process can only hold one jax
backend)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

TPU_LANE = os.environ.get("CAMA_TPU_TESTS") == "1"
pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(not TPU_LANE, reason="real-TPU lane (CAMA_TPU_TESTS=1)"),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
W, H, P, F, C, K = 256, 192, 2048, 2, 6, 1024


def _inputs():
    """Deterministic kernel inputs, identical in both processes."""
    rng = np.random.default_rng(1234)
    points = rng.uniform(-40, 40, (P, 3)).astype(np.float32)
    valid = rng.random(P) < 0.95
    cls = rng.integers(0, 3, P).astype(np.int32)
    A = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    A[:, :3, 3] = rng.uniform(-3, 3, (F, 3)).astype(np.float32)
    Kc = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1.0]])
    B = np.zeros((F, C, 3, 4), np.float32)
    for c in range(C):
        yaw = 2 * np.pi * c / C
        R = np.array([[np.cos(yaw), -np.sin(yaw), 0], [0, 0, -1],
                      [np.sin(yaw), np.cos(yaw), 0]])
        E = np.eye(4)
        E[:3, :3] = R
        for f in range(F):
            B[f, c] = (Kc @ E[:3] @ A[f]).astype(np.float32)
    fv = np.ones(F, bool)
    return points, valid, cls, A, B, fv


def _compute_all():
    """Run every laned kernel on whatever backend this process has."""
    import jax.numpy as jnp

    from cama_tpu.ops.geometry import crop_bounds
    from cama_tpu.ops.pallas_project import project_frame_pallas
    from cama_tpu.pipeline import (
        _count_chunk, _overlay_chunk, _overlay_chunk_compact,
    )

    points, valid, cls, A, B, fv = _inputs()
    lo, hi = crop_bounds()
    args = (jnp.asarray(points), jnp.asarray(valid), jnp.asarray(cls),
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(fv), lo, hi, W, H)
    out = {}
    out["overlay"] = np.asarray(_overlay_chunk(*args))
    out["overlay_compact"] = np.asarray(
        _overlay_chunk_compact(*args, K, False))
    c1, c2, c3 = _count_chunk(*args)
    out["count"] = np.asarray([int(c1), int(c2), int(c3)])
    p4T = jnp.asarray(np.concatenate([points, np.ones((P, 1), np.float32)], 1).T)
    vu, keep = project_frame_pallas(p4T, jnp.asarray(valid), jnp.asarray(A[0]),
                                    jnp.asarray(B[0]), W, H)
    out["pallas_vu"] = np.asarray(vu)
    out["pallas_keep"] = np.asarray(keep)

    # chunk-batched map-metric programs (the evaluation hot path)
    from cama_tpu.eval.map_metrics import (
        device_ids, frame_metrics_chunk_packed, instance_votes_chunk)

    rng = np.random.default_rng(77)
    gt = (rng.random((F, C, H, W)) > 0.97).astype(np.uint16) * rng.integers(
        1, 9, (F, C, H, W), dtype=np.uint16)
    vuM = np.stack([rng.uniform(-4, H + 4, (F, C, P)),
                    rng.uniform(-4, W + 4, (F, C, P))], -1).astype(np.float32)
    keepM = rng.random((F, C, P)) > 0.1
    margs = (jnp.asarray(np.packbits(gt > 0, axis=-1)), jnp.asarray(vuM),
             jnp.asarray(keepM), jnp.asarray(np.ones(F, np.float32)), W, 10, 3)
    pc = frame_metrics_chunk_packed(*margs)
    out["metric_cheb"] = np.asarray([float(pc[k]) for k in sorted(pc)])
    pe = frame_metrics_chunk_packed(*margs, "euclidean")
    out["metric_eucl"] = np.asarray([float(pe[k]) for k in sorted(pe)])
    out["votes"] = np.asarray(instance_votes_chunk(
        device_ids(gt), jnp.asarray(vuM), jnp.asarray(keepM), 3, "nearest"))

    # device-side compositing (paint + 3x2 mosaic, pure integer ops)
    from cama_tpu.ops.raster import build_color_table, composite_mosaic_device

    base = rng.integers(0, 255, (6, H, W, 3), dtype=np.uint8)
    cls_r = (rng.random((6, H, W)) < 0.15).astype(np.uint8) * rng.integers(
        1, 4, (6, H, W)).astype(np.uint8)
    table = build_color_table(["lane_marking", "Road_teeth", "Crosswalk_Line"])
    out["mosaic"] = np.asarray(composite_mosaic_device(
        jnp.asarray(base), jnp.asarray(cls_r), jnp.asarray(table),
        jnp.asarray(np.arange(6, dtype=np.int32))))
    return out


@pytest.fixture(scope="module")
def cpu_golden(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("golden") / "cpu.npz")
    code = (
        "import os, sys\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path[:0] = [{REPO!r}, {os.path.dirname(os.path.abspath(__file__))!r}]\n"
        "import numpy as np\n"
        "from test_tpu_chip import _compute_all\n"
        f"np.savez({path!r}, **_compute_all())\n"
    )
    env = dict(os.environ)
    env.pop("CAMA_TPU_TESTS", None)
    r = subprocess.run([sys.executable, "-c", code], env=env, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    return dict(np.load(path))


@pytest.fixture(scope="module")
def chip_outputs():
    import jax

    assert jax.default_backend() in ("tpu", "axon"), (
        f"TPU lane needs the real chip, got {jax.default_backend()}"
    )
    return _compute_all()


def test_overlay_chunk_on_chip(chip_outputs, cpu_golden):
    np.testing.assert_array_equal(chip_outputs["overlay"], cpu_golden["overlay"])


def test_overlay_chunk_compact_on_chip(chip_outputs, cpu_golden):
    np.testing.assert_array_equal(
        chip_outputs["overlay_compact"], cpu_golden["overlay_compact"]
    )
    # and the compact path equals the scatter path on-chip too
    np.testing.assert_array_equal(
        chip_outputs["overlay_compact"], chip_outputs["overlay"]
    )


def test_count_chunk_on_chip(chip_outputs, cpu_golden):
    np.testing.assert_array_equal(chip_outputs["count"], cpu_golden["count"])


def test_pallas_projection_on_chip(chip_outputs, cpu_golden):
    np.testing.assert_array_equal(
        chip_outputs["pallas_keep"], cpu_golden["pallas_keep"]
    )
    kept = cpu_golden["pallas_keep"]
    d = np.abs(chip_outputs["pallas_vu"] - cpu_golden["pallas_vu"])[kept]
    assert d.max(initial=0) < 1e-3  # MXU HIGHEST rounding vs CPU dot


def test_map_metrics_on_chip(chip_outputs, cpu_golden):
    # Chebyshev partials are sums of integer-valued float32 (< 2^24) — exact
    # in any reduction order, so bit-equal across backends
    np.testing.assert_array_equal(
        chip_outputs["metric_cheb"], cpu_golden["metric_cheb"]
    )
    # Euclidean SRE sums sqrt() values; reduction order may differ on chip
    np.testing.assert_allclose(
        chip_outputs["metric_eucl"], cpu_golden["metric_eucl"], rtol=1e-5
    )


def test_instance_votes_on_chip(chip_outputs, cpu_golden):
    # integer feature-transform ids: exact, including tie-breaks
    np.testing.assert_array_equal(chip_outputs["votes"], cpu_golden["votes"])


def test_device_mosaic_on_chip(chip_outputs, cpu_golden):
    # uint8 select + placement: bit-exact across backends
    np.testing.assert_array_equal(chip_outputs["mosaic"], cpu_golden["mosaic"])
