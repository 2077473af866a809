#!/usr/bin/env python3
"""Watch the adaptive kernel serve and switch.

Runs an 'auto' pipeline on a synthetic fixture clip and prints, per chunk,
which lane produced it (NumPy host lane vs the background-compiled
production program) with timings — the first frame arrives in ~1 s even
when the device program needs minutes to compile through a remote-compile
runtime (ARCHITECTURE.md 'Compile latency is a scheduled resource').

    python examples/demo_adaptive.py [clip_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cama_tpu.pipeline as pl
from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.pipeline import ClipPipeline


def main():
    if len(sys.argv) > 1:
        clip = sys.argv[1]
    else:
        root = "/tmp/cama_adaptive_demo"
        clip = os.path.join(root, "scene-fixture")
        if not os.path.exists(os.path.join(clip, "attribute.json")):
            print("building a fixture clip...")
            make_fixture_clip(root, n_frames=17, with_images=False,
                              with_lidar=False)

    # tag each chunk with the lane that produced it
    lanes = {"host": 0, "device": 0}
    orig = pl._host_overlay_chunk

    def spy(*a, **k):
        lanes["host"] += 1
        return orig(*a, **k)

    pl._host_overlay_chunk = spy

    pipe = ClipPipeline(clip_path=clip, raster_kernel="auto")
    t0 = time.perf_counter()
    n = 0
    host_so_far = 0
    for idx, raster in pipe.iter_overlay_rasters("cama"):
        n += 1
        if n == 1:
            print(f"first frame after {time.perf_counter() - t0:.2f}s "
                  f"(lane: {'host' if lanes['host'] else 'device'})")
        if lanes["host"] != host_so_far and n > 1:
            host_so_far = lanes["host"]
    dt = time.perf_counter() - t0
    print(f"pass 1: {n} frames in {dt:.2f}s — {lanes['host']} host-lane "
          f"chunk(s) served while the production program compiled")

    pl.wait_for_warm(timeout=180)  # bounded: slow compile-service phases
    key = pipe._production_warm_key("cama", pipe._use_2bit("cama"))
    if pl._warm_fn(key) is None:
        print("production program still compiling after 180s (slow "
              "compile-service phase) — the host lane keeps serving; rerun "
              "later for the device pass")
        return 0
    t0 = time.perf_counter()
    n = sum(1 for _ in pipe.iter_overlay_rasters("cama"))
    print(f"pass 2 (production program): {n} frames in "
          f"{time.perf_counter() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    rc = main()
    # the background warm can still be compiling here (that is this demo's
    # whole premise when the service is slow); interpreter teardown racing
    # the compile RPC can C++-abort — exit crash-safe like the CLI
    from cama_tpu.cli import exit_after

    exit_after(rc)
