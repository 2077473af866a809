"""Config validation + profiling counters."""
import time

import pytest
import yaml

from cama_tpu.config import ConfigError, load_config, validate_config
from cama_tpu.profiling import PhaseTimers


def base_config():
    return {
        "version": "v1.0-test",
        "dataroot": "/data",
        "converted_dataroot": "/out",
        "scene_names": ["scene-0550"],
        "cama_label_file": "/labels.zip",
        "output_video_dir": "/videos",
        "map_classes": ["lane_marking", "Road_teeth", "Crosswalk_Line"],
    }


def test_valid_config_merges_defaults():
    out = validate_config(base_config())
    assert out["cama_configs"]["camera_main"] == "camera_front"
    assert out["cama_configs"]["height_mlp"] == "vision_road_mlp_ft.npy"


def test_missing_required_key():
    cfg = base_config()
    del cfg["scene_names"]
    with pytest.raises(ConfigError, match="scene_names"):
        validate_config(cfg)


def test_wrong_type_and_unknown_cama_key():
    cfg = base_config()
    cfg["scene_names"] = "scene-0550"
    with pytest.raises(ConfigError, match="must be list"):
        validate_config(cfg)
    cfg = base_config()
    cfg["cama_configs"] = {"typo_key": 1}
    with pytest.raises(ConfigError, match="typo_key"):
        validate_config(cfg)


def test_empty_scenes():
    cfg = base_config()
    cfg["scene_names"] = []
    with pytest.raises(ConfigError, match="empty"):
        validate_config(cfg)


def test_load_config_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(base_config()))
    out = load_config(str(p))
    assert out["scene_names"] == ["scene-0550"]
    with pytest.raises(ConfigError, match="not found"):
        load_config(str(tmp_path / "missing.yaml"))


def test_device_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from cama_tpu.profiling import device_trace

    with device_trace(tmp_path / "trace"):
        _ = jnp.arange(8).sum()
    import os

    assert any(os.scandir(tmp_path / "trace"))


def test_phase_timers():
    t = PhaseTimers()
    with t.phase("work"):
        time.sleep(0.01)
    with t.phase("work"):
        time.sleep(0.01)
    assert t.count["work"] == 2
    assert t.total["work"] >= 0.02
    assert "work" in t.report()
    assert t.as_dict()["work"]["count"] == 2


def test_perf_gate_floor_logic(tmp_path):
    import json
    import subprocess
    import sys
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import bench as bench_mod

    line = {"metric": "m", "value": 700.0,
            "details": {"overlay_stream_fps": 30.0, "frame_stream_fps": 190.0,
                        "dual_video_write_fps": 25.0,
                        "dual_video_write_cold_fps": 12.0,
                        "multi_scene_stream_fps_batched": 500.0,
                        "cli_time_to_first_video_s": 9.0,
                        "bench_def": bench_mod.BENCH_DEF,
                        "backend": "tpu"}}
    p = tmp_path / "bench.json"
    p.write_text(json.dumps(line))
    gate = os.path.join(repo, "tools", "perf_gate.py")
    r = subprocess.run([sys.executable, gate, "--from", str(p)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr

    line["value"] = 100.0  # below the headline floor
    p.write_text(json.dumps(line))
    r = subprocess.run([sys.executable, gate, "--from", str(p)],
                       capture_output=True, text=True)
    assert r.returncode == 1
    assert "headline" in r.stdout

    # host-path floors relax when the native compositor is unavailable
    # (NumPy-fallback e2e ~115 must pass via _no_native_overrides)
    line["value"] = 700.0
    line["details"]["frame_stream_fps"] = 115.0
    line["details"]["native_compositor"] = False
    p.write_text(json.dumps(line))
    r = subprocess.run([sys.executable, gate, "--from", str(p)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    # with the native tier present the same number is a real regression
    line["details"]["native_compositor"] = True
    p.write_text(json.dumps(line))
    r = subprocess.run([sys.executable, gate, "--from", str(p)],
                       capture_output=True, text=True)
    assert r.returncode == 1
    assert "frame_stream_fps" in r.stdout

    # ceilings: a lower-is-better metric over its bound must trip the gate
    line["details"]["frame_stream_fps"] = 190.0
    line["details"]["cli_time_to_first_video_s"] = 45.0
    p.write_text(json.dumps(line))
    r = subprocess.run([sys.executable, gate, "--from", str(p)],
                       capture_output=True, text=True)
    assert r.returncode == 1
    assert "ceiling" in r.stdout

    # raw bench stdout capture: the pixel-parity validation doc precedes
    # the metric line (two JSON lines) — --from must scan for the metric
    # line, not choke on the multi-doc file
    line["details"]["cli_time_to_first_video_s"] = 9.0
    p.write_text(json.dumps({"ok": True, "sources": {}}) + "\n"
                 + json.dumps(line) + "\n")
    r = subprocess.run([sys.executable, gate, "--from", str(p)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr

    # a stored line from ANOTHER benchmark definition (older snapshot, or
    # missing bench_def entirely) is incomparable to the current floors:
    # the gate must say so and decline to gate, not fail spuriously
    for stale in (1, None):
        line["value"] = 100.0  # would trip the headline floor if gated
        if stale is None:
            line["details"].pop("bench_def", None)
        else:
            line["details"]["bench_def"] = stale
        p.write_text(json.dumps(line))
        r = subprocess.run([sys.executable, gate, "--from", str(p)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stdout + r.stderr
        assert "incomparable" in r.stdout
    line["value"] = 700.0
    line["details"]["bench_def"] = bench_mod.BENCH_DEF

    # bench's bounded-probe outage line: no measurement happened, so the
    # gate must report failed-to-run (rc=2), NOT "all floors met"
    p.write_text(json.dumps({
        "metric": "m", "value": 0.0,
        "details": {"backend": "unreachable",
                    "error": "accelerator backend unavailable"}}))
    r = subprocess.run([sys.executable, gate, "--from", str(p)],
                       capture_output=True, text=True)
    assert r.returncode == 2
    assert "could not reach" in r.stderr


def test_perf_gate_attribution_hook(tmp_path, monkeypatch, capsys):
    """--attribute attaches the phase profiler's stage report to a FAILING
    gate run (and only then) — the profiler itself is stubbed here."""
    import importlib.util
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "perf_gate_mod", os.path.join(repo, "tools", "perf_gate.py"))
    pg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pg)
    calls = []
    monkeypatch.setattr(pg, "attribute",
                        lambda failures, **kw: calls.append(list(failures))
                        or "stage-report-stub")

    import bench as bench_mod

    line = {"metric": "m", "value": 100.0,
            "details": {"backend": "tpu",
                        "bench_def": bench_mod.BENCH_DEF}}
    p = tmp_path / "bench.json"
    p.write_text(json.dumps(line))

    assert pg.main(["--from", str(p)]) == 1
    assert "attribution" not in json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert not calls

    assert pg.main(["--from", str(p), "--attribute"]) == 1
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["attribution"] == "stage-report-stub"
    assert calls and any("headline" in f for f in calls[0])

    # a passing run never pays for attribution
    line["value"] = 900.0
    line["details"].update({"overlay_stream_fps": 30.0,
                            "frame_stream_fps": 190.0,
                            "dual_video_write_fps": 25.0,
                            "dual_video_write_cold_fps": 12.0,
                            "multi_scene_stream_fps_batched": 500.0,
                            "map_eval_fps": 60.0, "wide_scene_fps": 400.0,
                            "wide_scene_eval_fps": 100.0,
                            "cli_time_to_first_video_s": 9.0})
    p.write_text(json.dumps(line))
    rc = pg.main(["--from", str(p), "--attribute"])
    assert rc == 0, capsys.readouterr().out
    assert len(calls) == 1

    # failing-metric -> fixture routing (pure logic)
    assert [j[0] for j in pg._attribution_jobs({"headline"})] == ["core fixture"]
    wide_only = pg._attribution_jobs({"wide_scene_fps"})
    assert [j[0] for j in wide_only] == ["wide fixture (compute-bound)"]
    assert wide_only[0][2] == []
    both = pg._attribution_jobs({"map_eval_fps", "wide_scene_eval_fps"})
    assert len(both) == 2
    assert "--eval" in both[0][2] and "--eval" in both[1][2]


def test_normalize_site_entry_shapes():
    """The single sites[] interpreter: string / list / mapping / garbage."""
    from cama_tpu.config import ConfigError, normalize_site_entry, validate_config

    assert normalize_site_entry("scene-a", 0, 1) == {
        "name": "site", "scenes": ["scene-a"], "refine": False}
    assert normalize_site_entry(["a", "b"], 1, 3) == {
        "name": "site1", "scenes": ["a", "b"], "refine": False}
    assert normalize_site_entry(
        {"name": "x", "scenes": ["a"], "refine": 1}, 0, 2) == {
        "name": "x", "scenes": ["a"], "refine": True}
    # mapping without explicit name gets the positional default
    assert normalize_site_entry({"scenes": ["a"]}, 2, 3)["name"] == "site2"
    # uninterpretable entry -> scenes None -> validate_config rejects it
    assert normalize_site_entry(7, 0, 1)["scenes"] is None
    import pytest as _pytest

    with _pytest.raises(ConfigError, match=r"sites\[0\]"):
        validate_config({
            "converted_dataroot": "/x", "scene_names": ["a"],
            "output_video_dir": "/v", "sites": [7]})
