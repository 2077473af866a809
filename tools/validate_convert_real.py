#!/usr/bin/env python3
"""Real-data converter validation (gated on the nuScenes devkit).

Converts ONE real nuScenes scene with BOTH implementations — the reference
`nuScenes2Clip` (/root/reference/dataset/nuscenes2clip.py:661-712) and this
framework's `NuScenesConverter` (cama_tpu/convert/nuscenes.py) — into two
temporary clip dirs, then diffs every converted artifact:

  * attribute.json           byte-for-byte (after json round-trip: the
                             reference writes with indent=4 too, so raw byte
                             equality is also checked and reported)
  * odometry/wigo.txt,
    odometry/wigo_offset_clip.txt   byte-for-byte
  * maps/map_nuscenes.json   byte-for-byte
  * per-sensor directories   same file names (ms timestamps); camera JPEGs
                             hash-compared (both copy the source bytes),
                             lidar bins numerically compared

The environment this framework builds in has NO nuscenes-devkit and no
nuScenes data (verified: `import nuscenes` fails), so by default this script
SKIPS with exit 0 and a JSON note — run it on a host with the devkit + a
nuScenes root to produce the real parity record.  PARITY.md documents what a
real run would add beyond the recorded-schema fakes already tested in
tests/test_devkit_adapters.py.

Usage:
    python tools/validate_convert_real.py --dataroot /data/nuscenes \
        --version v1.0-mini --scene scene-0061 [--keep-dirs]
"""
import argparse
import hashlib
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE_ROOT = os.environ.get("CAMA_REFERENCE_ROOT", "/root/reference")


def devkit_available():
    try:
        import nuscenes  # noqa: F401

        return True
    except ImportError:
        return False


def _file_bytes_equal(a, b):
    try:
        if os.path.getsize(a) != os.path.getsize(b):
            return False
        ha, hb = hashlib.sha256(), hashlib.sha256()
        with open(a, "rb") as f:
            for blk in iter(lambda: f.read(1 << 20), b""):
                ha.update(blk)
        with open(b, "rb") as f:
            for blk in iter(lambda: f.read(1 << 20), b""):
                hb.update(blk)
        return ha.digest() == hb.digest()
    except OSError:
        return False


def diff_clips(ref_clip, ours_clip):
    """Compare two converted clip dirs; returns a JSON-able report dict."""
    import numpy as np

    report = {"mismatches": [], "checked": []}

    def check(name, ok):
        report["checked"].append(name)
        if not ok:
            report["mismatches"].append(name)

    # attribute.json: byte equality, and (diagnostic) structural equality
    a = os.path.join(ref_clip, "attribute.json")
    b = os.path.join(ours_clip, "attribute.json")
    check("attribute.json (bytes)", _file_bytes_equal(a, b))
    try:
        with open(a) as f:
            ja = json.load(f)
        with open(b) as f:
            jb = json.load(f)
        check("attribute.json (structure)", ja == jb)
    except (OSError, ValueError):
        check("attribute.json (structure)", False)

    for name in ("wigo.txt", "wigo_offset_clip.txt"):
        check(f"odometry/{name} (bytes)",
              _file_bytes_equal(os.path.join(ref_clip, "odometry", name),
                                os.path.join(ours_clip, "odometry", name)))

    check("maps/map_nuscenes.json (bytes)",
          _file_bytes_equal(os.path.join(ref_clip, "maps", "map_nuscenes.json"),
                            os.path.join(ours_clip, "maps", "map_nuscenes.json")))

    cams = ["camera_front", "camera_front_right", "camera_front_left",
            "camera_rear", "camera_rear_left", "camera_rear_right"]
    for sensor in cams + ["lidar_top"]:
        da, db = os.path.join(ref_clip, sensor), os.path.join(ours_clip, sensor)
        la = sorted(os.listdir(da)) if os.path.isdir(da) else None
        lb = sorted(os.listdir(db)) if os.path.isdir(db) else None
        check(f"{sensor}/ (file names)", la == lb and la is not None)
        if la != lb or la is None:
            continue
        if sensor == "lidar_top":
            # reference rewrites bins float64 [N, 6]; compare numerically
            ok = all(
                np.array_equal(
                    np.fromfile(os.path.join(da, f), np.float64),
                    np.fromfile(os.path.join(db, f), np.float64))
                for f in la)
            check("lidar_top/ (bin values)", ok)
        else:
            # both implementations copy the source JPEG bytes verbatim
            ok = all(_file_bytes_equal(os.path.join(da, f),
                                       os.path.join(db, f)) for f in la)
            check(f"{sensor}/ (jpeg bytes)", ok)
    report["ok"] = not report["mismatches"]
    return report


def run(dataroot, version, scene, keep_dirs=False):
    sys.path.insert(0, REFERENCE_ROOT)
    from dataset.nuscenes2clip import nuScenes2Clip

    from cama_tpu.convert.nuscenes import NuScenesConverter

    tmp = tempfile.mkdtemp(prefix="convert_parity_")
    ref_root = os.path.join(tmp, "ref")
    ours_root = os.path.join(tmp, "ours")
    base = {"version": version, "dataroot": dataroot}
    ref_cfg = dict(base, converted_dataroot=ref_root)
    ours_cfg = dict(base, converted_dataroot=ours_root)

    print(f"converting {scene} with the reference implementation...",
          file=sys.stderr)
    nuScenes2Clip(ref_cfg).convert(scene)
    print(f"converting {scene} with cama_tpu...", file=sys.stderr)
    NuScenesConverter(ours_cfg).convert(scene)

    report = diff_clips(os.path.join(ref_root, scene),
                        os.path.join(ours_root, scene))
    report.update({"scene": scene, "version": version,
                   "ref_clip": os.path.join(ref_root, scene),
                   "ours_clip": os.path.join(ours_root, scene)})
    if not keep_dirs and report["ok"]:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        report.pop("ref_clip"), report.pop("ours_clip")
    return report


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Byte-diff reference vs cama_tpu nuScenes conversion "
                    "on real data (skips cleanly without the devkit)")
    parser.add_argument("--dataroot", default=None,
                        help="nuScenes dataroot (with the devkit DB tables)")
    parser.add_argument("--version", default="v1.0-mini")
    parser.add_argument("--scene", default="scene-0061")
    parser.add_argument("--keep-dirs", action="store_true",
                        help="keep the converted dirs even when they match")
    args = parser.parse_args(argv)

    if not devkit_available():
        print(json.dumps({
            "skipped": "nuscenes-devkit not installed in this environment",
            "note": "run on a host with nuscenes-devkit + data; "
                    "tests/test_devkit_adapters.py covers the recorded-schema "
                    "fakes meanwhile",
        }))
        return 0
    if not args.dataroot:
        # one-command mode: discover the dataroot like cama-tpu-doctor does
        from cama_tpu.doctor import find_nuscenes_dataroot

        args.dataroot = find_nuscenes_dataroot()
        if not args.dataroot:
            print(json.dumps({
                "skipped": "no --dataroot given and none discovered "
                           "(NUSCENES_DATAROOT, /data/nuscenes, "
                           "/data/sets/nuscenes, ~/nuscenes)"}))
            return 0
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "dataset")):
        print(json.dumps({"skipped": f"reference not mounted at {REFERENCE_ROOT}"}))
        return 0

    report = run(args.dataroot, args.version, args.scene, args.keep_dirs)
    print(json.dumps(report, indent=2))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
