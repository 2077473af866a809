"""CLI driver mirroring the reference main.py surface
(/root/reference/main.py:20-70): per scene — convert nuScenes -> clip, extract
CAMA labels from the release zip, and write cama + nuScenes overlay videos.

Conversion is feature-gated: the nuScenes devkit is optional (SURVEY.md §7
step 6 keeps conversion host-side), so already-converted clip dirs work
without it.
"""
from __future__ import annotations

import argparse
import os
import time
import zipfile

from cama_tpu.config import load_config
from cama_tpu.pipeline import ClipPipeline


def extract_dir_from_zip(zip_filepath, dir_in_zip, dest_dir):
    with zipfile.ZipFile(zip_filepath, "r") as zf:
        for member in zf.namelist():
            if member.startswith(dir_in_zip):
                zf.extract(member, dest_dir)
                if member.endswith("/"):
                    os.makedirs(os.path.join(dest_dir, member), exist_ok=True)


def run(configs):
    output_dir = configs["converted_dataroot"]
    os.makedirs(output_dir, exist_ok=True)
    output_video_dir = configs["output_video_dir"]
    os.makedirs(output_video_dir, exist_ok=True)

    state = {"converter": None}
    failures = []
    for scene_name in configs["scene_names"]:
        try:
            _run_scene(configs, scene_name, output_dir, output_video_dir, state)
        except Exception as e:  # keep going: one bad scene must not kill the batch
            import traceback

            traceback.print_exc()
            failures.append((scene_name, repr(e)))
    if failures:
        print(f"{len(failures)} scene(s) failed: {failures}")
    return failures


def _run_scene(configs, scene_name, output_dir, output_video_dir, state):
    clip_path = os.path.join(output_dir, scene_name)

    # Step 1: convert nuScenes scene -> clip (optional dependency)
    if not os.path.exists(os.path.join(clip_path, "attribute.json")):
        if state["converter"] is None:
            from cama_tpu.convert.nuscenes import NuScenesConverter

            state["converter"] = NuScenesConverter(configs)
        state["converter"].convert(scene_name)

    # Step 2: CAMA label files into the clip dir
    zip_file = configs.get("cama_label_file")
    if zip_file and os.path.exists(zip_file):
        extract_dir_from_zip(zip_file, f"{scene_name}/", output_dir)

    # Step 3: reprojection videos — one pass over the clip writes every
    # source's video (base images decoded once; the reference loops the whole
    # pipeline per source, /root/reference/main.py:55-70)
    pipe = ClipPipeline(configs.get("cama_configs"), clip_path)
    paths = {}
    for source, suffix in (("cama", "cama"), ("nuscenes", "nuScenes")):
        if source not in pipe.scene.flat:
            print(f"[{scene_name}] no {source} labels; skipping video")
            continue
        paths[source] = os.path.join(output_video_dir, f"{scene_name}_{suffix}.mp4")
    if paths:
        print(f"Generating reprojection videos ({', '.join(paths)} labels)...")
        t0 = time.perf_counter()
        counts = pipe.write_videos(paths, preset=configs.get("video_preset"))
        dt = time.perf_counter() - t0
        for source, out in paths.items():
            print(f"  {counts[source]} frames -> {out}")
        total = sum(counts.values())
        print(f"  {total} video-frames in {dt:.1f}s ({total / max(dt, 1e-9):.1f} fps)")


def main(argv=None):
    parser = argparse.ArgumentParser(description="Read a configuration file.")
    parser.add_argument(
        "-c", "--config", type=str, default="config.yaml",
        help="Path to the configuration file.",
    )
    args = parser.parse_args(argv)
    failures = run(load_config(args.config))
    # per-scene isolation keeps the batch going, but the exit code must
    # still tell automation that something failed
    return 1 if failures else 0


if __name__ == "__main__":
    main()
