"""Environment self-check: one bounded JSON report of everything a run
depends on — built from the failure modes actually hit in production (a
tunneled accelerator whose client creation can hang for hours, a sometimes-
useless persistent compile cache, ffmpeg-less hosts, partially-populated
frame caches).

    cama-tpu-doctor [-c config.yaml] [--timeout 60]

Every check is bounded; the accelerator probe runs on a daemon thread
(pipeline.backend_available), so the doctor itself can never hang on the
condition it is diagnosing.  Exit 0 always — the report is the product;
automation should read the JSON, not the exit code.
"""
from __future__ import annotations

import json
import os
import shutil
import time


def check_backend(timeout):
    """Bounded reachability + (when up) dispatch/link micro-probe."""
    from cama_tpu.pipeline import backend_available

    t0 = time.perf_counter()
    if not backend_available(timeout):
        return {"reachable": False, "probe_seconds": round(timeout, 1),
                "note": "client creation did not complete — tunneled "
                        "service outage or first-init still in flight; "
                        "host lanes keep the CLI/report/demo serving"}
    import jax

    out = {"reachable": True,
           "probe_seconds": round(time.perf_counter() - t0, 2),
           "platform": jax.default_backend(),
           "devices": len(jax.devices())}
    try:
        import numpy as np

        import jax.numpy as jnp

        x = jnp.asarray(np.ones((8, 8), np.float32))
        fn = jax.jit(lambda a: (a @ a).sum())
        np.asarray(fn(x))  # compile
        t0 = time.perf_counter()
        np.asarray(fn(x))
        out["dispatch_ms"] = round((time.perf_counter() - t0) * 1000, 1)
        mb = np.zeros((4 * 1024 * 1024,), np.uint8)  # 4 MB link sample
        t0 = time.perf_counter()
        np.asarray(jnp.asarray(mb))[0]
        dt = time.perf_counter() - t0
        out["roundtrip_MBps"] = round(8 / dt, 1)
    except Exception as e:  # pragma: no cover - probe is best-effort
        out["probe_error"] = repr(e)[:200]
    return out


def check_scene(configs, name):
    """Per-scene readiness: converted? scene cache? frame cache? GT masks?"""
    from cama_tpu.io.scene import DEFAULT_CAMA_CONFIGS

    cc = {**DEFAULT_CAMA_CONFIGS, **(configs.get("cama_configs") or {})}
    clip = os.path.join(configs["converted_dataroot"], name)
    out = {"converted": os.path.exists(os.path.join(clip, "attribute.json"))}
    if not out["converted"]:
        return out
    cache_dir = cc.get("scene_cache_dir") or os.path.join(clip, ".cama_tpu")
    out["scene_cache"] = bool(
        [f for f in (os.listdir(cache_dir) if os.path.isdir(cache_dir) else [])
         if f.startswith("scene_cache")])
    fdir = cc.get("frame_cache_dir") or os.path.join(clip, ".cama_tpu")
    frames = [f for f in (os.listdir(fdir) if os.path.isdir(fdir) else [])
              if f.startswith("frames_") and f.endswith(".valid.npy")]
    if frames:
        import numpy as np

        v = np.load(os.path.join(fdir, frames[0]), mmap_mode="r")
        out["frame_cache_hit_rate"] = round(float(np.asarray(v).mean()), 3)
    else:
        out["frame_cache_hit_rate"] = 0.0
    out["gt_masks"] = any(
        d.startswith("lane_ins_") for d in os.listdir(clip)
        if os.path.isdir(os.path.join(clip, d)))
    out["labels"] = {
        "cama": os.path.exists(os.path.join(clip, cc["result_dir"],
                                            cc["cama_map_file"])),
        "nuscenes": os.path.exists(os.path.join(clip, cc["result_dir"],
                                                cc["nuscenes_map_file"])),
    }
    return out


def find_nuscenes_dataroot():
    """First existing nuScenes dataroot among NUSCENES_DATAROOT and the
    conventional locations (a dataroot is a dir holding a v1.0-* table
    directory)."""
    candidates = [os.environ.get("NUSCENES_DATAROOT"), "/data/nuscenes",
                  "/data/sets/nuscenes",
                  os.path.expanduser("~/nuscenes")]
    for root in candidates:
        if not root or not os.path.isdir(root):
            continue
        try:
            if any(n.startswith("v1.0") for n in os.listdir(root)):
                return root
        except OSError:
            continue
    return None


def check_converter_readiness():
    """Real-data converter prerequisites (round-4 verdict #7): is the
    nuScenes devkit importable, is a dataroot discoverable, and what single
    command runs the byte-diff gate vs the reference converter."""
    try:
        import nuscenes  # noqa: F401

        devkit = True
    except ImportError:
        devkit = False
    dataroot = find_nuscenes_dataroot()
    ready = devkit and dataroot is not None
    out = {"devkit_installed": devkit, "dataroot": dataroot, "ready": ready}
    if ready:
        out["run"] = "python tools/validate_convert_real.py  # auto-discovers this dataroot, converts scene-0061 with both implementations, byte-diffs"
    else:
        missing = ([] if devkit else ["pip install nuscenes-devkit"]) + \
            ([] if dataroot else ["download v1.0-mini and set NUSCENES_DATAROOT"])
        out["to_enable"] = missing
    return out


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Bounded environment self-check (one JSON report)")
    parser.add_argument("-c", "--config", default=None,
                        help="also check each configured scene's readiness")
    parser.add_argument("--timeout", type=float, default=float(
        os.environ.get("CAMA_TPU_BACKEND_TIMEOUT_S", "60")),
        help="accelerator probe bound in seconds (default 60)")
    args = parser.parse_args(argv)

    from cama_tpu import native

    report = {
        "backend": check_backend(args.timeout),
        "native_compositor": native.available(),
        "ffmpeg": bool(shutil.which("ffmpeg")),
        "encoder": ("ffmpeg/libx264" if shutil.which("ffmpeg")
                    else "cv2/mp4v fallback"),
        "compile_cache": {
            "dir": os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  "/tmp/jax_compile_cache"),
            "note": "serves cross-process only sometimes on remote-compile "
                    "runtimes; the serving paths never rely on it",
        },
        "reference_mounted": os.path.isdir("/root/reference/cama"),
        "nuscenes_converter": check_converter_readiness(),
    }
    cache_dir = report["compile_cache"]["dir"]
    report["compile_cache"]["entries"] = (
        len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0)

    if args.config:
        from cama_tpu.config import load_config

        configs = load_config(args.config)
        report["scenes"] = {
            name: check_scene(configs, name)
            for name in dict.fromkeys(configs["scene_names"])}

    print(json.dumps(report))
    return 0


def main_entry(argv=None):
    """Console-script entrypoint with the crash-safe exit (the backend
    probe's daemon thread may have left a client mid-creation)."""
    from cama_tpu.cli import exit_after

    exit_after(main(argv))


if __name__ == "__main__":
    main_entry()
