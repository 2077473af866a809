#!/usr/bin/env python3
"""End-to-end demo on synthetic fixture clips — no dataset download needed.

Builds two overlapping clips, renders overlay videos, evaluates pose + map
quality, aggregates LiDAR, and merges the clips into a CAMAv2 site.

    python examples/demo.py /tmp/cama_demo
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cama_tpu.aggregate import Site, aggregate_lidar, save_pcd
from cama_tpu.eval.map_metrics import MapEvaluator
from cama_tpu.eval.pose_metrics import PoseEvaluator
from cama_tpu.io.fixture import add_instance_masks, make_fixture_clip
from cama_tpu.pipeline import ClipPipeline


def main(root="/tmp/cama_demo"):
    os.makedirs(root, exist_ok=True)
    print("== building synthetic clips ==")
    a = make_fixture_clip(root, scene_name="scene-a", n_frames=10, flat_height=True)
    b = make_fixture_clip(root, scene_name="scene-b", n_frames=10, flat_height=True,
                          traj_t_offset=0.5, t0_ms=1600000100000,
                          world_sim3={"yaw_deg": 5.0, "tx": 10.0, "ty": -4.0})
    add_instance_masks(a)

    print("== overlay videos (one pass, shared base-image decode; adaptive "
          "kernel: host lane serves while device programs compile) ==")
    pipe = ClipPipeline(clip_path=a, raster_kernel="auto")
    counts = pipe.write_videos({
        source: os.path.join(root, f"scene-a_{source}.mp4")
        for source in pipe.scene.sources
    })
    for source, n in counts.items():
        print(f"  {source}: {n} frames")
    print(pipe.timers.report())

    print("== map quality (SRE / precision / recall / F1; Chebyshev + "
          "exact-EDT; host backend — no compile wait) ==")
    for distance in ("chebyshev", "euclidean"):
        ev = MapEvaluator(distance=distance, backend="host")
        out = ev.evaluate_scene(pipe, "cama")
        print(distance, json.dumps({k: round(v, 4) if isinstance(v, float) else v
                                    for k, v in out.items()}))

    print("== instance-level association (lane_ins ids; host backend — the "
          "device path is covered by bench.py/validate and the tpu test "
          "lane, and a fresh process would stall minutes in its remote "
          "compile here) ==")
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in MapEvaluator(tolerance=4, backend="host")
                      .evaluate_scene_instances(pipe, "cama").items()}))

    print("== pose evaluation (cama chain vs ego odometry) ==")
    scmv = np.loadtxt(os.path.join(a, "odometry", "scmv_camera_front.txt"))
    wigo = np.loadtxt(os.path.join(a, "odometry", "wigo.txt"))
    res = PoseEvaluator(alignment="7dof", min_matches=5).eval(wigo, scmv)
    print({k: round(float(v), 4) for k, v in res.items() if np.isscalar(v) or getattr(v, 'ndim', 1) == 0})

    print("== LiDAR aggregation ==")
    cloud = aggregate_lidar(a, pose_source="cama", voxel=0.3)
    save_pcd(os.path.join(root, "scene-a_lidar.pcd"), cloud)
    print(f"  {len(cloud)} voxelized points")

    print("== CAMAv2 site aggregation (scene-a + misaligned scene-b) ==")
    site = Site.from_clips([a, b], refine=True)
    site.save_pcd(os.path.join(root, "site_map.pcd"))
    print(f"  {len(site.instances)} merged map elements from {len(site.clips)} clips "
          f"(joint Sim(3) refinement on)")
    print("outputs in", root)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/cama_demo")
    # the adaptive video pass kicks background kernel warms; in a slow
    # compile-service phase they outlive the script, and interpreter
    # teardown racing the compile RPC can C++-abort — same crash-safe exit
    # as the CLI entrypoints
    from cama_tpu.cli import exit_after

    exit_after(0)
