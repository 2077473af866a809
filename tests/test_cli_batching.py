"""Round-3 CLI integration: scene-cache serving on re-runs, multi-scene
batched video writing (MultiScenePipeline as the driver's device path), and
the `sites:` config block."""
import os

import numpy as np
import pytest
import yaml

from cama_tpu.io.fixture import make_fixture_clip


@pytest.fixture(scope="module")
def two_scene_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliws2")
    for name, seed in (("scene-a", 0), ("scene-b", 1)):
        make_fixture_clip(root / "converted", scene_name=name, n_frames=5,
                          with_images=True, with_lidar=False, seed=seed)
    cfg = {
        "version": "v1.0-test",
        "dataroot": str(root / "raw"),
        "converted_dataroot": str(root / "converted"),
        "scene_names": ["scene-a", "scene-b"],
        "cama_label_file": str(root / "missing.zip"),
        "output_video_dir": str(root / "videos"),
    }
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return {"root": root, "config": str(cfg_path), "cfg": cfg}


def test_cli_batches_scenes_and_hits_scene_cache(two_scene_ws, capsys):
    from cama_tpu.cli import main

    assert main(["--config", two_scene_ws["config"]]) == 0
    out1 = capsys.readouterr().out
    assert "Batching 2 scenes" in out1
    videos = os.listdir(two_scene_ws["root"] / "videos")
    for name in ("scene-a", "scene-b"):
        assert f"{name}_cama.mp4" in videos
        assert f"{name}_nuScenes.mp4" in videos
    # the compiled-scene checkpoint landed in each clip dir
    for name in ("scene-a", "scene-b"):
        assert os.path.exists(
            two_scene_ws["root"] / "converted" / name / ".cama_tpu" /
            "scene_cache.npz")

    # second run: lifting skipped, served from the scene cache
    assert main(["--config", two_scene_ws["config"]]) == 0
    out2 = capsys.readouterr().out
    assert out2.count("scene cache hit") == 2


def test_batched_videos_match_sequential(two_scene_ws, tmp_path):
    """The scene-batched writer must produce the same frames (byte-identical
    encoder input) as per-scene write_videos; compare the raster+composite
    stream instead of encoder output."""
    from cama_tpu.pipeline import ClipPipeline, MultiScenePipeline

    conv = two_scene_ws["root"] / "converted"
    pipes = [ClipPipeline(clip_path=str(conv / n), chunk=4)
             for n in ("scene-a", "scene-b")]
    sources = sorted({s for p in pipes for s in p.scene.sources})
    msp = MultiScenePipeline(pipes, chunk=4)
    grouped = {}  # (si, idx) -> {src: raster}
    for si, idx, by_src in msp.iter_frame_groups(sources):
        grouped.setdefault((si, idx), {}).update(by_src)

    for si, pipe in enumerate(pipes):
        for src in pipe.scene.sources:
            got = {idx: g[src] for (s_i, idx), g in grouped.items()
                   if s_i == si and src in g}
            want = dict(pipe.iter_overlay_rasters(src))
            assert set(got) == set(want), (si, src)
            for idx in want:
                np.testing.assert_array_equal(got[idx], want[idx])


def test_sites_config_block(two_scene_ws, capsys):
    from cama_tpu.cli import main

    cfg = dict(two_scene_ws["cfg"])
    cfg["sites"] = [{"name": "downtown", "scenes": ["scene-a", "scene-b"]}]
    p = two_scene_ws["root"] / "site_config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    assert main(["--config", str(p)]) == 0
    out = capsys.readouterr().out
    assert "aggregating 2 scenes" in out
    videos = os.listdir(two_scene_ws["root"] / "videos")
    assert "downtown_labels.json" in videos
    site_vids = [v for v in videos if v.startswith("downtown_") and v.endswith("_site.mp4")]
    assert len(site_vids) == 2


def test_sites_config_validation(two_scene_ws):
    from cama_tpu.config import ConfigError, validate_config

    cfg = dict(two_scene_ws["cfg"])
    cfg["sites"] = [["scene-a", "scene-zzz"]]
    with pytest.raises(ConfigError, match="scene-zzz"):
        validate_config(cfg)
    cfg["sites"] = [[]]
    with pytest.raises(ConfigError, match="non-empty"):
        validate_config(cfg)


def test_warmup_cli(two_scene_ws, capsys):
    import json

    from cama_tpu.warmup import main

    assert main(["--config", two_scene_ws["config"], "--scene", "scene-a"]) == 0
    report = json.loads(capsys.readouterr().out)
    entry = report["scenes"]["scene-a"]
    assert set(entry["kernels"]) == {"cama", "nuscenes"}
    for k in entry["kernels"].values():
        assert k["seconds"] >= 0 and k["mode"] in ("raster", "sparse")
    assert report["first_frame_latency_seconds"] < 10


def test_warmup_duplicate_scene_names_deduped(two_scene_ws, capsys):
    """A scene listed twice must be warmed once — duplicates would also
    batch-group the scene with itself (a [2,...] program no run uses)."""
    import json

    import yaml

    from cama_tpu.warmup import main

    cfg = dict(two_scene_ws["cfg"])
    cfg["scene_names"] = ["scene-a", "scene-a"]
    p = os.path.join(two_scene_ws["root"], "dupwarm.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    assert main(["--config", p]) == 0
    report = json.loads(capsys.readouterr().out)
    assert list(report["scenes"]) == ["scene-a"]
    assert "batched" not in report


def test_scene_cache_invalidated_by_label_content(tmp_path):
    """A cache compiled before labels changed must not be served: the key
    signs the content of every input file (labels, height grid, odometry)."""
    import json

    from cama_tpu.io.scene import compile_scene

    clip = make_fixture_clip(tmp_path, scene_name="s", n_frames=4,
                             with_images=False, with_lidar=False)
    cache = str(tmp_path / "cache.npz")
    s1 = compile_scene(clip, cache=cache)
    n1 = int(s1.flat["cama"].valid.sum())
    # append one more label instance -> content signature changes
    labels_path = os.path.join(clip, "maps", "map_labels.json")
    with open(labels_path) as f:
        labels = json.load(f)
    labels.append(dict(labels[0]))
    with open(labels_path, "w") as f:
        json.dump(labels, f)
    s2 = compile_scene(clip, cache=cache)
    assert not s2.from_cache, "stale scene cache was served after label edit"
    assert int(s2.flat["cama"].valid.sum()) > n1
    s3 = compile_scene(clip, cache=cache)
    assert s3.from_cache, "rewritten cache should now hit"


def test_scene_cache_corrupt_file_recompiles(tmp_path):
    """A truncated/corrupt cache (crashed writer, foreign bytes) must
    recompile and overwrite, never crash; saves are write-then-rename so a
    concurrent reader cannot observe a partial zip."""
    from cama_tpu.io.scene import compile_scene

    clip = make_fixture_clip(tmp_path, scene_name="s", n_frames=4,
                             with_images=False, with_lidar=False)
    cache = str(tmp_path / "cache.npz")
    with open(cache, "wb") as f:
        f.write(b"not a zip at all")
    s1 = compile_scene(clip, cache=cache)
    assert not s1.from_cache
    s2 = compile_scene(clip, cache=cache)
    assert s2.from_cache, "recompile should have overwritten the corrupt cache"


def test_warmup_map_eval_probes_past_missing_gt(tmp_path):
    """GT masks that start mid-clip (first frames' PNGs absent) must not
    silently skip metric warmup — the probe finds the first frame whose
    full camera set has GT."""
    import glob
    import os

    from cama_tpu.io.fixture import add_instance_masks, make_fixture_clip
    from cama_tpu.pipeline import ClipPipeline
    from cama_tpu.warmup import warmup_map_eval

    clip = make_fixture_clip(tmp_path, scene_name="wgt", n_frames=5,
                             with_images=False, with_lidar=False)
    add_instance_masks(clip)
    pipe0 = ClipPipeline(clip_path=str(clip), chunk=2)
    fm = pipe0.frame_matrices("cama")
    import numpy as np

    first = int(np.asarray(fm.frame_indices)[np.asarray(fm.frame_valid)][0])
    # delete EVERY camera's PNG for the first valid frame
    for cam in pipe0.scene.camera_list:
        ms = pipe0.scene.sync_ms[cam][first]
        p = os.path.join(str(clip), f"lane_ins_{cam}", f"{ms}.png")
        if os.path.exists(p):
            os.remove(p)
    pipe = ClipPipeline(clip_path=str(clip), chunk=2)
    assert warmup_map_eval(pipe) is not None, \
        "metric warmup skipped although later frames have full GT"

    # and a clip with NO GT at all returns None (no crash)
    for p in glob.glob(os.path.join(str(clip), "lane_ins_*", "*.png")):
        os.remove(p)
    pipe2 = ClipPipeline(clip_path=str(clip), chunk=2)
    assert warmup_map_eval(pipe2) is None


def test_main_entry_subprocess_exits_cleanly(two_scene_ws):
    """The real process entrypoint (main.py -> cli.main_entry): a fresh
    subprocess must finish rc=0 and write every video even when a background
    kernel warm is still compiling at exit (cli.exit_after's crash-safe
    path — teardown racing an in-flight remote compile used to abort the
    process with rc=134)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "main.py"),
         "--config", two_scene_ws["config"]],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert "first video frame at" in r.stdout
    videos = os.listdir(two_scene_ws["root"] / "videos")
    for name in ("scene-a", "scene-b"):
        assert f"{name}_cama.mp4" in videos
