"""Cold-start warmup: pre-compile the production kernel set for a config.

The overlay kernels embed static (chunk, k, width, height) arguments and the
point-tensor padding in their compiled programs; on a remote-compile TPU
runtime the sort-bearing compact kernel costs 1-4 MINUTES to compile and the
persistent JAX cache cannot capture it (the compile happens server-side).
`warmup_pipeline` pays that cost up front — one counting pass plus one chunk
of the selected kernel per label source — so the first user-visible frame on
a warmed process arrives in well under 10 s instead of minutes.

    cama-tpu-warmup --config config.yaml [--scene NAME]

prints one JSON line with per-source warm timings and the measured
first-frame latency after warming.  Serving code can call warmup_pipeline()
directly on any ClipPipeline before its first frame is needed.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def warmup_pipeline(pipe, sources=None):
    """Compile + execute one chunk of every device program the pipeline's
    production path will use (counting pass, overlay kernel or sparse
    compactor per source; the chunk-batched map-metric program when the clip
    ships GT masks).  Returns {source: {mode, k, seconds}}."""
    from cama_tpu import native

    native.available()  # builds the host compositor .so if needed
    out = {}
    for source in (sources or pipe.scene.sources):
        if source not in pipe.scene.flat:  # same skip the CLI/report apply:
            out[source] = {"skipped": "no labels for source"}
            continue
        t0 = time.perf_counter()
        mode, k = pipe.overlay_mode(source)  # compiles the counting kernel
        if mode == "raster":
            it = pipe.iter_overlay_rasters(source, max_in_flight=1)
        else:
            it = pipe.iter_sparse_points(source, k=k, max_in_flight=1)
        next(it, None)  # compiles + runs the first chunk
        it.close()
        # 'auto' pipelines serve that first chunk from the host lane and
        # kick the production compile on a BACKGROUND thread — warmup's
        # entire job is to pay that compile now, so block until it lands
        # (no-op for non-adaptive kernels, which compiled synchronously)
        from cama_tpu.pipeline import wait_for_warm

        wait_for_warm()
        out[source] = {"mode": mode, "k": k,
                       "seconds": round(time.perf_counter() - t0, 2)}
    eval_s = warmup_map_eval(pipe, sources)
    if eval_s is not None:
        out["map_eval"] = {"seconds": round(eval_s, 2)}
    return out


def warmup_frames(pipe, n_threads=6):
    """Pre-build the frame cache: decode + undistort every camera image of
    the clip into the persistent store, so a later write_videos /
    iter_frames / report first pass rides the warm mmap path (~46 fps
    dual-video vs ~12 cold on the bench host, BENCH.md) instead of paying
    JPEG decode + remap inline.  Byte-exact warm start by construction: the
    store is filled by the very undistorted_image calls a cold pass would
    make.  Returns {"images_cached", "hit_rate", "seconds"}."""
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    scene = pipe.scene

    def one(job):
        camera, idx = job
        try:
            pipe.undistorted_image(camera, idx, copy=False)
            return 1
        except (FileNotFoundError, IndexError, KeyError):
            return 0  # image-less clip / skipped frame: nothing to cache

    jobs = [(camera, idx) for idx in range(len(scene.frame_times))
            for camera in scene.camera_list]
    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        n = sum(pool.map(one, jobs))
    fc = pipe.frame_cache()
    if fc is not None:
        fc.flush()
    return {"images_cached": n,
            "hit_rate": round(fc.hit_rate(), 4) if fc is not None else None,
            "seconds": round(time.perf_counter() - t0, 2)}


def warmup_batched(pipelines, sources=None):
    """Compile the SCENE-BATCHED programs (MultiScenePipeline's per-chunk
    device work — a different XLA shape from every solo kernel, the round-3
    first-contact wall on the CLI's default batch_scenes path) for each
    group of scenes sharing an output size.  Returns {source: seconds} per
    group label.  The CLI no longer needs this to start fast (the adaptive
    kernel serves scatter until the batched program lands), but a warmed
    deployment skips the scatter phase entirely."""
    import time as _time

    from cama_tpu.pipeline import MultiScenePipeline

    out = {}
    groups = {}
    for p in pipelines:
        groups.setdefault(p.scene.output_size, []).append(p)
    for size, group in groups.items():
        if len(group) < 2:
            continue
        msp = MultiScenePipeline(group, chunk=group[0].chunk, adaptive=False)
        label = f"{size[1]}x{size[0]}x{len(group)}"
        entry = {}
        for source in (sources or ("cama", "nuscenes")):
            if not msp.members(source):
                continue
            t0 = _time.perf_counter()
            state = msp._source_state(source)  # counting passes
            r = msp._dispatch_chunk(state, 0)  # compiles the batched program
            if r is not None:
                import numpy as _np

                _np.asarray(r)
            entry[source] = round(_time.perf_counter() - t0, 2)
        out[label] = entry
    return out


def warmup_map_eval(pipe, sources=None):
    """Compile the chunk-batched metric programs (the report tool's hot
    kernels — minutes cold through a remote-compile runtime): BOTH the
    binary-metrics program (report without --instances) and the fused
    metrics+votes program (the --instances default), by evaluating one
    chunk's worth of frames around the first frame whose GT masks are
    complete.  No-op (returns None) when no frame has full lane_ins GT."""
    from cama_tpu.eval.map_metrics import MapEvaluator

    ev = MapEvaluator()
    usable = [s for s in (sources or pipe.scene.sources)
              if s in pipe.scene.flat]
    if not usable:
        return None
    source = usable[0]
    fm = pipe.frame_matrices(source)
    import numpy as np

    valid_idxs = [int(i) for i in np.asarray(fm.frame_indices)[
        np.asarray(fm.frame_valid)]]
    scene = pipe.scene
    # find the first frame with the COMPLETE camera set of GT PNGs (cheap
    # existence checks — masks may start mid-clip or miss odd cameras)
    first_gt = next(
        (idx for idx in valid_idxs
         if all(os.path.exists(os.path.join(
             scene.clip_path, f"lane_ins_{cam}",
             f"{scene.sync_ms[cam][idx]}.png"))
             for cam in scene.camera_list)),
        None)
    if first_gt is None:
        return None
    at = valid_idxs.index(first_gt)
    frames = set(valid_idxs[at: at + pipe.chunk])
    t0 = time.perf_counter()
    ev.evaluate_scene(pipe, source, frames=frames)
    ev.evaluate_scene_all(pipe, source, frames=frames)
    return time.perf_counter() - t0


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Pre-compile the kernel set for a config's scenes")
    parser.add_argument("-c", "--config", default="config.yaml")
    parser.add_argument("--scene", default=None,
                        help="scene to warm (default: every configured scene "
                             "with a converted clip)")
    parser.add_argument("--source", default=None, choices=["cama", "nuscenes"])
    parser.add_argument("--frames", action="store_true",
                        help="also pre-decode every camera image into the "
                             "persistent frame cache (byte-exact warm start: "
                             "the first video/report pass skips JPEG decode "
                             "+ undistort)")
    args = parser.parse_args(argv)

    from cama_tpu.config import load_config
    from cama_tpu.pipeline import ClipPipeline

    from cama_tpu import native

    configs = load_config(args.config)
    # warmup's whole job is device compiles; when the accelerator client
    # cannot even be created (tunneled-service outage — observed blocking
    # jax.devices() 25+ min), fail loud and bounded instead of hanging: the
    # CLI's adaptive host lanes serve without warming anyway
    from cama_tpu.pipeline import backend_available

    probe_s = float(os.environ.get("CAMA_TPU_BACKEND_TIMEOUT_S", "900"))
    if not backend_available(probe_s):
        print(json.dumps({"error": "accelerator backend unavailable: "
                          f"client creation did not complete within "
                          f"{probe_s:.0f}s — nothing warmed"}))
        return 1
    names = [args.scene] if args.scene else configs["scene_names"]
    # same order-preserving dedupe as cli.run: a scene listed twice would be
    # warmed twice and batch-grouped with itself (a [2,...] program no real
    # run would ever use)
    names = list(dict.fromkeys(names))
    report = {"scenes": {}, "native_compositor": native.available()}
    first_pipe = None
    warmed_pipes = []
    for name in names:
        clip = os.path.join(configs["converted_dataroot"], name)
        if not os.path.exists(os.path.join(clip, "attribute.json")):
            report["scenes"][name] = {"skipped": "clip not converted"}
            continue
        try:  # per-scene isolation, same as the CLI driver: one broken
            # clip must not abort warming the rest
            t0 = time.perf_counter()
            pipe = ClipPipeline(configs.get("cama_configs"), clip)
            compile_s = time.perf_counter() - t0
            sources = [args.source] if args.source else None
            entry = {"scene_compile_seconds": round(compile_s, 2),
                     "scene_cache_hit": pipe.scene.from_cache,
                     "kernels": warmup_pipeline(pipe, sources)}
            if args.frames:
                entry["frames"] = warmup_frames(pipe)
        except Exception as e:
            report["scenes"][name] = {"error": repr(e)}
            continue
        report["scenes"][name] = entry
        warmed_pipes.append(pipe)
        if first_pipe is None:
            usable = [s for s in (sources or pipe.scene.sources)
                      if s in pipe.scene.flat]
            if usable:
                first_pipe = (pipe, usable[0])

    # same isolation as the per-scene loop: a failure in the batched shapes
    # or the first-frame probe must still print the report (which already
    # carries every per-scene result) and reach main_entry's crash-safe exit
    if len(warmed_pipes) > 1:  # the CLI's default batch_scenes shapes
        try:
            report["batched"] = warmup_batched(
                warmed_pipes, [args.source] if args.source else None)
        except Exception as e:
            report["batched"] = {"error": repr(e)}

    if first_pipe is not None:
        try:
            pipe, source = first_pipe
            t0 = time.perf_counter()
            it = pipe.iter_frames(source)
            next(it, None)
            it.close()
            report["first_frame_latency_seconds"] = round(
                time.perf_counter() - t0, 2)
        except Exception as e:
            report["first_frame_error"] = repr(e)
    # serving_mode can have kicked one more background warm (e.g. the sparse
    # program's registry entry) during the first-frame measurement: a warmed
    # process must leave NOTHING compiling
    from cama_tpu.pipeline import wait_for_warm

    wait_for_warm()
    print(json.dumps(report))
    return 0


def main_entry(argv=None):
    """Console-script entrypoint: main() + crash-safe exit.  A warm kicked
    by a scene that later errored can still be in flight here; interpreter
    teardown racing that compile RPC can C++-abort (see cli.exit_after)."""
    from cama_tpu.cli import exit_after

    exit_after(main(argv))


if __name__ == "__main__":
    main_entry()
