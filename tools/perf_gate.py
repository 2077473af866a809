#!/usr/bin/env python3
"""Perf-regression gate: run bench.py and fail if the headline or any
detail metric regresses below its floor.

Floors live in tools/perf_floors.json (per-backend: the TPU tunnel and a CPU
CI runner have very different absolute numbers).  A metric absent from the
floors file is informational only.

    python tools/perf_gate.py              # run bench, check floors
    python tools/perf_gate.py --from FILE  # check an existing bench JSON line

Exit code 0 = all floors met; 1 = regression; 2 = bench failed to run.
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOORS_PATH = os.path.join(REPO, "tools", "perf_floors.json")


def run_bench():
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


# failing metrics -> which profiler lane explains them
_WIDE_METRICS = {"wide_scene_fps", "wide_scene_eval_fps", "wide_scene_points"}


def _attribution_jobs(keys):
    """Map a set of failing metric names to (label, fixture expression,
    extra profiler flags) profile jobs — pure, unit-tested."""
    jobs = []
    if keys - _WIDE_METRICS:
        flags = ["--with-images"]
        if "map_eval_fps" in keys:
            flags.append("--eval")
        jobs.append(("core fixture", "bench.get_fixture()", flags))
    if keys & _WIDE_METRICS:
        jobs.append(("wide fixture (compute-bound)", "bench.get_wide_fixture()",
                     ["--eval"] if "wide_scene_eval_fps" in keys else []))
    return jobs


def attribute(failures, timeout=1800):
    """Stage-level attribution (ROADMAP): when a floor trips, run the phase
    profiler on the matching bench fixture so the gate log names the STAGE
    that regressed (decode/remap, device dispatch, compositing, encode, eval
    phases), not just the headline number.  Core-regime trips profile the
    standard (with-images) fixture; wide-regime trips profile the
    compute-bound 250k-point fixture.  Returns the profiler report text(s),
    or a diagnostic string if profiling itself failed."""
    profiler = os.path.join(REPO, "tools", "profile_pipeline.py")
    jobs = _attribution_jobs({f.split(":")[0] for f in failures})
    texts = []
    for label, expr, flags in jobs:
        try:
            r = subprocess.run(
                [sys.executable, "-c", f"import bench; print({expr})"],
                cwd=REPO, capture_output=True, text=True, timeout=600)
            clip = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            if r.returncode != 0 or not os.path.isdir(clip):
                texts.append(f"== {label}: unavailable: {r.stderr[-500:]}")
                continue
            r = subprocess.run(
                [sys.executable, profiler, "--clip", clip] + flags,
                capture_output=True, text=True, timeout=timeout)
            texts.append(f"== {label} ==\n"
                         + (r.stdout
                            + ("\n" + r.stderr if r.returncode else ""))[-4000:])
        except Exception as e:  # attribution is best-effort; never mask the gate
            texts.append(f"== {label}: attribution failed: {e!r}")
    return "\n".join(texts)


def flatten(bench):
    out = {"headline": bench.get("value")}
    out.update({k: v for k, v in bench.get("details", {}).items()
                if isinstance(v, (int, float)) and not isinstance(v, bool)})
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--from", dest="from_file", default=None,
                   help="check a stored bench JSON line instead of running")
    p.add_argument("--floors", default=FLOORS_PATH)
    p.add_argument("--attribute", action="store_true",
                   help="on a tripped floor, run the phase profiler on the "
                        "bench fixture and attach per-stage timings to the "
                        "report (names the regressed stage, not just the "
                        "metric)")
    args = p.parse_args(argv)

    if args.from_file:
        with open(args.from_file) as f:
            text = f.read()
        try:
            bench = json.loads(text)  # one doc: bench line or driver wrapper
        except json.JSONDecodeError:
            # raw bench stdout capture: the pixel-parity validation doc
            # precedes the metric line — take the LAST parseable line with
            # a "metric" key (same scan run_bench applies)
            bench = None
            for line in reversed(text.strip().splitlines()):
                try:
                    doc = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(doc, dict) and "metric" in doc:
                    bench = doc
                    break
        if bench is not None and "parsed" in bench:  # driver BENCH_r*.json
            bench = bench["parsed"]
    else:
        bench = run_bench()
    if bench is None:
        print("perf_gate: bench did not produce a JSON line", file=sys.stderr)
        return 2

    backend = bench.get("details", {}).get("backend", "unknown")
    if backend == "unreachable":
        # bench's bounded probe found no accelerator: no measurement
        # happened, so "no floors tripped" would be a lie — report it as a
        # failed-to-run, same exit class as a missing JSON line
        print("perf_gate: bench could not reach the accelerator backend "
              f"({bench.get('details', {}).get('error', '')})",
              file=sys.stderr)
        return 2
    floors_all = json.load(open(args.floors)) if os.path.exists(args.floors) else {}
    # Floors are calibrated for one benchmark definition (bench.BENCH_DEF,
    # echoed as details.bench_def).  A stored line from another definition
    # (e.g. a pre-tile_to wide_scene reading) is incomparable — refuse to
    # gate it rather than reporting a spurious regression.  Live runs always
    # match by construction.
    want_def = floors_all.get("_bench_def")
    got_def = bench.get("details", {}).get("bench_def")
    if args.from_file and want_def is not None and got_def != want_def:
        print(json.dumps({
            "backend": backend, "incomparable": True,
            "line_bench_def": got_def, "floors_bench_def": want_def,
            "note": "stored bench line predates/postdates the current "
                    "benchmark definition; floors do not apply"}))
        return 0
    floors = dict(floors_all.get(backend, {}))
    # host-path floors assume the native compositor; a gate host without a
    # C++ toolchain runs the NumPy fallback — not a regression
    no_native = floors.pop("_no_native_overrides", {})
    if bench.get("details", {}).get("native_compositor") is False:
        floors.update(no_native)
    # sections bench can legitimately skip (CAMA_BENCH_EVAL=0 /
    # CAMA_BENCH_MULTI=0): gated when present, informational when absent
    optional = set(floors.pop("_optional", ()))
    # lower-is-better metrics (latencies: cli_time_to_first_video_s)
    ceilings = floors.pop("_ceilings", {})
    metrics = flatten(bench)

    failures = []
    skipped = []
    for key, floor in floors.items():
        got = metrics.get(key)
        if got is None:
            if key in optional:
                skipped.append(key)
            else:
                failures.append(f"{key}: missing from bench output (floor {floor})")
        elif got < floor:
            failures.append(f"{key}: {got} < floor {floor}")
    for key, ceiling in ceilings.items():
        got = metrics.get(key)
        if got is None:
            if key in optional:
                skipped.append(key)
            else:
                failures.append(
                    f"{key}: missing from bench output (ceiling {ceiling})")
        elif got > ceiling:
            failures.append(f"{key}: {got} > ceiling {ceiling}")
    report = {"backend": backend, "metrics": metrics,
              "floors": floors, "ceilings": ceilings, "failures": failures}
    if skipped:
        report["skipped_optional"] = skipped
    if failures and args.attribute:
        report["attribution"] = attribute(failures)
        print(report["attribution"], file=sys.stderr)
    print(json.dumps(report))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
