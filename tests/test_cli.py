"""CLI surfaces: main driver, map-metrics script, lidar + site scripts, and
the scene-compile cache."""
import json
import os

import numpy as np
import pytest
import yaml

from cama_tpu.io.fixture import add_instance_masks, make_fixture_clip


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliws")
    clip = make_fixture_clip(root / "converted", scene_name="scene-cli", n_frames=5,
                             with_images=True, with_lidar=True)
    add_instance_masks(clip)
    cfg = {
        "version": "v1.0-test",
        "dataroot": str(root / "raw"),
        "converted_dataroot": str(root / "converted"),
        "scene_names": ["scene-cli"],
        "cama_label_file": str(root / "missing.zip"),
        "output_video_dir": str(root / "videos"),
        "map_classes": ["lane_marking", "Road_teeth", "Crosswalk_Line"],
    }
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return {"root": root, "clip": clip, "config": str(cfg_path)}


def test_main_cli_end_to_end(workspace):
    from cama_tpu.cli import main

    main(["--config", workspace["config"]])
    videos = os.listdir(workspace["root"] / "videos")
    assert any("cama" in v for v in videos)
    assert any("nuScenes" in v for v in videos)


def test_map_metrics_cli(workspace, capsys):
    from cama_tpu.eval.map_metrics import main

    main(["--clip", workspace["clip"], "--tolerance", "4"])
    out = json.loads(capsys.readouterr().out)
    assert {"SRE", "precision", "recall", "f1"} <= set(out)
    assert out["precision"] > 0.9


def test_lidar_cli(workspace, tmp_path, capsys):
    from cama_tpu.aggregate.lidar import main

    out = str(tmp_path / "agg.pcd")
    main(["--clip", workspace["clip"], "--out", out, "--every", "4", "--voxel", "0.5"])
    assert os.path.getsize(out) > 1000
    assert "points ->" in capsys.readouterr().out


def test_site_cli(workspace, tmp_path, capsys):
    from cama_tpu.aggregate.site import main

    out_dir = str(tmp_path / "site")
    main(["--clips", workspace["clip"], "--out-dir", out_dir, "--lidar",
          "--lidar-voxel", "1.0"])
    files = os.listdir(out_dir)
    assert "site_labels.json" in files and "site_map.pcd" in files and "site_lidar.pcd" in files


def test_scene_cache_roundtrip(workspace, tmp_path):
    from cama_tpu.io.scene import compile_scene

    cache = str(tmp_path / "scene.npz")
    s1 = compile_scene(workspace["clip"], cache=cache)
    assert os.path.exists(cache)
    s2 = compile_scene(workspace["clip"], cache=cache)
    assert s2.sources == s1.sources
    for src in s1.sources:
        np.testing.assert_array_equal(s2.flat[src].points, s1.flat[src].points)
        np.testing.assert_array_equal(s2.flat[src].cls, s1.flat[src].cls)
        assert s2.flat[src].class_names == s1.flat[src].class_names
        np.testing.assert_allclose(
            s2.traj[src].as_transform(True), s1.traj[src].as_transform(True), atol=0
        )
    np.testing.assert_allclose(s2.K_scaled, s1.K_scaled)
    np.testing.assert_array_equal(s2.frame_times, s1.frame_times)


def test_cli_exit_code_on_scene_failure(tmp_path):
    import yaml

    from cama_tpu.cli import main as cli_main

    cfg = {
        "converted_dataroot": str(tmp_path / "conv"),
        "scene_names": ["scene-that-does-not-exist"],
        "output_video_dir": str(tmp_path / "vids"),
        "dataroot": "/nonexistent", "version": "x",
        "cama_label_file": "/nonexistent.zip",
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    rc = cli_main(["-c", str(p)])
    assert rc == 1  # conversion impossible (no devkit/data) -> failure signaled


def test_label_zip_extracted_once_for_all_scenes(tmp_path):
    """run() extracts every configured scene's label files in one zip pass
    (reference reopens the zip per scene, main.py:41-43); bytes land
    identically and other scenes' files stay untouched."""
    import zipfile

    from cama_tpu.cli import _extract_all_labels

    zp = tmp_path / "labels.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("scene-a/maps/map_labels.json", "[1]")
        zf.writestr("scene-b/maps/map_labels.json", "[2]")
        zf.writestr("scene-c/maps/map_labels.json", "[3]")
    out = tmp_path / "converted"
    _extract_all_labels(str(zp), ["scene-a", "scene-b"], str(out))
    assert (out / "scene-a/maps/map_labels.json").read_text() == "[1]"
    assert (out / "scene-b/maps/map_labels.json").read_text() == "[2]"
    assert not (out / "scene-c").exists()


def test_site_config_string_and_duplicate_names(tmp_path, capsys):
    """A plain-string site entry means one scene (not its characters), and
    duplicate site names fail that site instead of overwriting outputs."""
    from cama_tpu.cli import _run_sites

    # no prepared scenes: every site fails, but the failure text shows the
    # parsed member list / duplicate detection
    cfgs = {"sites": ["scene-x", {"name": "s", "scenes": ["a"]},
                      {"name": "s", "scenes": ["b"]}]}
    failures = _run_sites(cfgs, [], str(tmp_path), str(tmp_path))
    assert len(failures) == 3
    # string entry parsed as one scene name
    assert "scene-x" in failures[0][1] and "'s'" not in failures[0][1]
    # duplicate name rejected before any output is written
    assert "duplicate site name" in failures[2][1]


def test_report_cli(workspace, tmp_path, capsys):
    """cama-tpu-report writes one self-contained HTML with thumbnails and
    metrics for every configured scene."""
    from cama_tpu.report import main as report_main

    out = tmp_path / "report.html"
    rc = report_main(["-c", workspace["config"], "-o", str(out),
                      "--thumbnails", "2", "--max-frames", "2"])
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["failures"] == 0 and line["scenes"] == 1
    body = out.read_text()
    assert "scene-cli" in body
    assert "SRE" in body and "instance_precision" in body
    assert "pose metrics" in body
    assert body.count("data:image/jpeg;base64,") == 2
    assert "<script" not in body  # self-contained, no external/active assets


def test_report_uses_batched_fleet_eval(tmp_path, capsys, monkeypatch):
    """With >=2 same-size scenes, the report's map metrics come from the
    fleet-batched evaluator — proven by making the per-scene paths raise."""
    from cama_tpu.eval.map_metrics import MapEvaluator
    from cama_tpu.report import main as report_main

    for i in range(2):
        clip = make_fixture_clip(tmp_path / "converted",
                                 scene_name=f"scene-b{i}", n_frames=4,
                                 with_images=True, seed=i)
        add_instance_masks(clip)
    cfg = {
        "version": "v", "dataroot": str(tmp_path / "raw"),
        "converted_dataroot": str(tmp_path / "converted"),
        "scene_names": ["scene-b0", "scene-b1"],
        "cama_label_file": str(tmp_path / "missing.zip"),
        "output_video_dir": str(tmp_path / "videos"),
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    def boom(*a, **k):
        raise AssertionError("per-scene evaluation path used")

    monkeypatch.setattr(MapEvaluator, "evaluate_scene_all", boom)
    monkeypatch.setattr(MapEvaluator, "evaluate_scene", boom)
    out = tmp_path / "report.html"
    rc = report_main(["-c", str(cfg_path), "-o", str(out), "--thumbnails", "0"])
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["failures"] == 0 and line["scenes"] == 2
    body = out.read_text()
    assert body.count("map quality") >= 4  # both scenes x both sources
    assert "instance_precision" in body


def test_report_sites_section(tmp_path, capsys):
    """A `sites:` config block adds a site section to the QA report: member
    list, merged element counts, duplicates removed."""
    from cama_tpu.report import main as report_main

    for i in range(2):
        clip = make_fixture_clip(tmp_path / "converted",
                                 scene_name=f"scene-s{i}", n_frames=4,
                                 with_images=True, seed=0)  # same world:
        add_instance_masks(clip)                            # dedupe overlaps
    cfg = {
        "version": "v", "dataroot": str(tmp_path / "raw"),
        "converted_dataroot": str(tmp_path / "converted"),
        "scene_names": ["scene-s0", "scene-s1"],
        "cama_label_file": str(tmp_path / "missing.zip"),
        "output_video_dir": str(tmp_path / "videos"),
        "sites": [{"name": "overlap", "scenes": ["scene-s0", "scene-s1"]}],
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "report.html"
    rc = report_main(["-c", str(cfg_path), "-o", str(out),
                      "--thumbnails", "0", "--max-frames", "2"])
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["sites"] == 1 and line["failures"] == 0
    body = out.read_text()
    assert "site: overlap" in body
    assert "duplicates_removed" in body and "instances_merged" in body
    assert "merged map elements per class" in body


def test_report_duplicate_scene_names(workspace, tmp_path, capsys):
    """A scene listed twice in scene_names yields two report sections (one
    compiled pipeline shared underneath), matching the config's shape."""
    import yaml as _yaml

    from cama_tpu.report import main as report_main

    cfg = _yaml.safe_load(open(workspace["config"]))
    cfg["scene_names"] = ["scene-cli", "scene-cli"]
    cfg_path = tmp_path / "dup.yaml"
    cfg_path.write_text(_yaml.safe_dump(cfg))
    out = tmp_path / "report.html"
    rc = report_main(["-c", str(cfg_path), "-o", str(out),
                      "--thumbnails", "0", "--max-frames", "1"])
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["scenes"] == 2
    assert out.read_text().count("<h2>scene-cli</h2>") == 2


def test_duplicate_scene_names_deduped(workspace, capsys):
    """A scene listed twice must be prepared and written ONCE — the batched
    path would otherwise open two encoders on the same output .mp4."""
    cfg = yaml.safe_load(open(workspace["config"]))
    cfg["scene_names"] = ["scene-cli", "scene-cli"]
    p = workspace["root"] / "dup.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from cama_tpu.cli import main

    assert main(["--config", str(p)]) == 0
    out = capsys.readouterr().out
    assert out.count("first video frame") == 1


def test_label_extraction_skipped_when_labels_present(workspace):
    """Re-running a processed config must not re-scan the label zip: labels
    are already on disk, so run() succeeds even when the configured zip is
    unreadable (an invalid zip would raise BadZipFile if opened)."""
    cfg = yaml.safe_load(open(workspace["config"]))
    bad_zip = workspace["root"] / "corrupt.zip"
    bad_zip.write_text("not a zip at all")
    cfg["cama_label_file"] = str(bad_zip)
    p = workspace["root"] / "skipzip.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from cama_tpu.cli import main

    assert main(["--config", str(p)]) == 0


def test_report_falls_back_to_host_eval_when_backend_down(workspace, tmp_path,
                                                          monkeypatch, capsys):
    """Outage contract: with the accelerator unreachable the report probes
    (bounded), warns, and evaluates with the host backend instead of
    hanging on the first metric dispatch."""
    import cama_tpu.report as report_mod

    monkeypatch.setattr("cama_tpu.pipeline.backend_available",
                        lambda timeout: False)
    seen = {}
    orig = report_mod.scene_summary

    def spy(pipe, **kw):
        seen["eval_backend"] = kw.get("eval_backend")
        return orig(pipe, **kw)

    monkeypatch.setattr(report_mod, "scene_summary", spy)
    out = tmp_path / "r.html"
    rc = report_mod.main(["-c", workspace["config"], "-o", str(out)])
    assert rc == 0
    assert seen["eval_backend"] == "host"
    assert "accelerator backend unavailable" in capsys.readouterr().out


def test_warmup_fails_loud_when_backend_down(workspace, monkeypatch, capsys):
    """Warmup's job is device compiles: a downed service must produce a
    bounded, parseable error (rc=1), never an unbounded hang."""
    import json

    monkeypatch.setattr("cama_tpu.pipeline.backend_available",
                        lambda timeout: False)
    from cama_tpu.warmup import main

    assert main(["--config", workspace["config"]]) == 1
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "backend unavailable" in report["error"]


def test_bench_emits_outage_line_when_backend_down(monkeypatch, capsys,
                                                   tmp_path):
    """bench.main must print one honest JSON line naming the outage (the
    driver records it as the round artifact) instead of hanging — and the
    line still carries device-free host-lane parity evidence."""
    import json
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    from cama_tpu.io.fixture import make_fixture_clip

    clip = make_fixture_clip(tmp_path, scene_name="bench-outage", n_frames=4,
                             with_images=True, with_lidar=False)
    monkeypatch.setattr(bench, "get_fixture", lambda: clip)
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    monkeypatch.setattr("cama_tpu.pipeline.backend_available",
                        lambda timeout: False)
    bench.main()
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] == 0.0
    assert line["details"]["backend"] == "unreachable"
    assert "unavailable" in line["details"]["error"]
    assert line["details"]["validate_host_lane_ok"] is True
    assert line["details"]["validate_host_lane_min_agreement"] >= 0.999
    assert (tmp_path / "VALIDATE_outage.json").exists()


def test_doctor_report(workspace, capsys, monkeypatch):
    """Doctor: one bounded JSON report — backend reachability, native tier,
    encoder, compile cache, per-scene readiness; an unreachable backend is a
    reported condition, not a failure."""
    import json

    from cama_tpu.doctor import main

    assert main(["-c", workspace["config"], "--timeout", "30"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["backend"]["reachable"] is True  # CPU test platform
    assert rep["backend"]["devices"] >= 1
    assert "dispatch_ms" in rep["backend"]
    assert rep["encoder"]
    scene = rep["scenes"]["scene-cli"]
    assert scene["converted"] and scene["labels"]["nuscenes"]

    # outage shape: reachable=false + note, still exit 0
    monkeypatch.setattr("cama_tpu.pipeline.backend_available",
                        lambda timeout: False)
    assert main(["--timeout", "1"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["backend"]["reachable"] is False
    assert "host lanes" in rep["backend"]["note"]


def test_report_thumbnails_spread_when_fewer_frames(workspace, tmp_path, capsys):
    """Asking for more thumbnails than frames must still spread picks over
    the frames that exist (the old formula collapsed them all onto the
    first frame)."""
    from cama_tpu.report import main as report_main

    out = tmp_path / "r.html"
    rc = report_main(["-c", workspace["config"], "-o", str(out),
                      "--thumbnails", "3", "--max-frames", "2"])
    assert rc == 0
    assert out.read_text().count("data:image/jpeg;base64,") == 2


def test_report_imageless_clip_skips_thumbnails(tmp_path, capsys):
    """A metrics-only clip (no camera JPEGs) reports its numbers without
    thumbnails instead of failing the scene — and the decode path raises a
    clear FileNotFoundError rather than letting cv2.remap(None) produce a
    misshapen zero image (found live)."""
    import pytest
    import yaml

    from cama_tpu.io.fixture import add_instance_masks, make_fixture_clip
    from cama_tpu.pipeline import ClipPipeline
    from cama_tpu.report import main as report_main

    root = tmp_path / "converted"
    c = make_fixture_clip(root, scene_name="nogt-img", n_frames=3,
                          with_images=False, with_lidar=False)
    add_instance_masks(str(c))
    pipe = ClipPipeline(clip_path=str(c), chunk=2)
    with pytest.raises(FileNotFoundError, match="camera image missing"):
        pipe.undistorted_image("camera_front", 1)

    cfg = tmp_path / "config.yaml"
    cfg.write_text(yaml.safe_dump({
        "converted_dataroot": str(root), "scene_names": ["nogt-img"],
        "output_video_dir": str(tmp_path / "v"), "dataroot": "/x",
        "version": "x", "cama_label_file": "/x.zip"}))
    out = tmp_path / "report.html"
    rc = report_main(["-c", str(cfg), "-o", str(out), "--eval-backend",
                      "host", "--thumbnails", "2", "--max-frames", "2"])
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["failures"] == 0 and line["scenes"] == 1
    body = out.read_text()
    assert "SRE" in body
    assert "data:image/jpeg;base64," not in body


def test_warmup_frames_prebuilds_cache(workspace, tmp_path):
    """cama-tpu-warmup --frames: pre-decoding the clip fills the persistent
    frame store so the first video/report pass is a warm pass, and the
    warmed pixels are byte-identical to an uncached decode."""
    from cama_tpu.pipeline import ClipPipeline
    from cama_tpu.warmup import warmup_frames

    pipe = ClipPipeline(clip_path=workspace["clip"],
                        configs={"frame_cache_dir": str(tmp_path / "fc")})
    stats = warmup_frames(pipe)
    n_slots = len(pipe.scene.frame_times) * len(pipe.scene.camera_list)
    assert stats["images_cached"] > 0
    assert stats["images_cached"] == round(stats["hit_rate"] * n_slots)
    # a fresh pipeline over the same store serves the warmed bytes
    warm_pipe = ClipPipeline(clip_path=workspace["clip"],
                             configs={"frame_cache_dir": str(tmp_path / "fc")})
    nocache = ClipPipeline(clip_path=workspace["clip"],
                           configs={"frame_cache": False})
    cam = pipe.scene.camera_list[0]
    assert warm_pipe.frame_cache().hit_rate() == stats["hit_rate"]
    np.testing.assert_array_equal(warm_pipe.undistorted_image(cam, 0),
                                  nocache.undistorted_image(cam, 0))
