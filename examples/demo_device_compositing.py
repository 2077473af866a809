#!/usr/bin/env python3
"""Opt-in device-side compositing demo (the PCIe/local-host serving path).

The default video path composites on the host (native C++ fused
copy+paint+mosaic — BENCH.md).  On hosts where the device link is fast and
the host core is the encoder's, `ClipPipeline.mosaic_device` moves paint +
3x2 mosaic placement onto the TPU: upload base pixels, download ONE
finished video frame.  This demo proves byte-equality against the host
path on a synthetic clip and prints both timings, honestly labeled — on a
tunneled link the upload dominates and the host path wins; that is the
expected result here, not a defect.

    python examples/demo_device_compositing.py [workdir]
"""
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    # this demo IS the device tier — no host fallback makes sense; bounded
    # probe so a downed tunnel service yields an error, not a silent hang
    from cama_tpu.pipeline import backend_available

    probe_s = float(os.environ.get("CAMA_TPU_BACKEND_TIMEOUT_S", "300"))
    if not backend_available(probe_s):
        print("accelerator backend unavailable (client creation did not "
              f"complete within {probe_s:.0f}s) — this demo needs a device; "
              "retry when the service is reachable", file=sys.stderr)
        return 2
    from cama_tpu.io.fixture import make_fixture_clip
    from cama_tpu.io.video import concat_camera_grid
    from cama_tpu.pipeline import ClipPipeline

    clip = os.path.join(workdir, "scene-dc")
    if not os.path.exists(os.path.join(clip, "attribute.json")):
        clip = make_fixture_clip(workdir, scene_name="scene-dc", n_frames=8,
                                 with_images=True, with_lidar=False)
    pipe = ClipPipeline(clip_path=str(clip), chunk=4)

    print("== byte-equality: device mosaic vs host compositor ==")
    raster = pipe._overlay_single("cama", 1)
    host = concat_camera_grid(pipe.composite_frame("cama", 1, raster))
    dev = pipe.mosaic_device("cama", 1, cls_raster=raster)
    assert np.array_equal(dev, host), "device mosaic != host mosaic"
    print(f"  identical {dev.shape} frames ({dev.nbytes / 1e6:.1f} MB)")

    print("== timings (warm; which side wins depends on the link) ==")
    for idx in (2, 3):  # warm both paths
        pipe.mosaic_device("cama", idx)
    t0 = time.perf_counter()
    n = 0
    for idx in range(2, 7):
        pipe.mosaic_device("cama", idx)
        n += 1
    dt_dev = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for idx in range(2, 7):
        r = pipe._overlay_single("cama", idx)
        concat_camera_grid(pipe.composite_frame("cama", idx, r))
    dt_host = (time.perf_counter() - t0) / n
    import jax

    print(f"  backend={jax.default_backend()}  "
          f"device={dt_dev * 1000:.0f} ms/frame  host={dt_host * 1000:.0f} ms/frame")
    print("  (tunneled links: host wins — the ~MBs/frame base upload "
          "dominates; PCIe/local: upload is ~1 ms and the host core is "
          "freed for the encoder)")

    print("== dual-source serving: one base upload, two mosaics ==")
    t0 = time.perf_counter()
    out = pipe.mosaics_device(["cama", "nuscenes"], 1)
    dt = time.perf_counter() - t0
    print(f"  {sorted(out)} in {dt * 1000:.0f} ms (shared upload)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
