#!/usr/bin/env python3
"""Profile the pipeline on a clip: phase wall-clock report + optional
jax.profiler trace (view in TensorBoard/xprof).

    python tools/profile_pipeline.py --clip <clip> [--source cama]
        [--mode raster|sparse|auto] [--trace-dir /tmp/trace] [--chunk 8]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--clip", required=True)
    parser.add_argument("--source", default="cama")
    parser.add_argument("--mode", default="auto", choices=["auto", "raster", "sparse"])
    parser.add_argument("--chunk", type=int, default=8)
    parser.add_argument("--raster-kernel", default="compact", choices=["compact", "scatter", "pallas"])
    parser.add_argument("--trace-dir", default=None)
    parser.add_argument("--with-images", action="store_true",
                        help="run the full composite path (requires camera JPEGs)")
    parser.add_argument("--eval", action="store_true",
                        help="also profile map evaluation (requires lane_ins "
                             "GT masks; prints the evaluator's phase report)")
    args = parser.parse_args(argv)

    # this tool times DEVICE phases; bounded probe instead of hanging on a
    # downed tunnel service's client creation (same contract as bench.py)
    from cama_tpu.pipeline import backend_available

    probe_s = float(os.environ.get("CAMA_TPU_BACKEND_TIMEOUT_S", "900"))
    if not backend_available(probe_s):
        print("profile_pipeline: accelerator backend unavailable "
              f"(client creation did not complete within {probe_s:.0f}s)",
              file=sys.stderr)
        return 2

    from cama_tpu.pipeline import ClipPipeline
    from cama_tpu.profiling import device_trace

    t0 = time.perf_counter()
    pipe = ClipPipeline(clip_path=args.clip, chunk=args.chunk,
                        raster_kernel=args.raster_kernel)
    print(f"scene compile: {time.perf_counter() - t0:.2f}s "
          f"(sources: {pipe.scene.sources})")

    def run():
        if args.with_images:
            return sum(1 for _ in pipe.iter_frames(args.source, mode=args.mode))
        return sum(1 for _ in pipe.iter_overlay_rasters(args.source))

    t0 = time.perf_counter()
    n = run()
    print(f"cold pass (incl compiles): {n} frames in {time.perf_counter() - t0:.2f}s")

    pipe.timers = type(pipe.timers)()
    if args.trace_dir:
        with device_trace(args.trace_dir):
            t0 = time.perf_counter()
            n = run()
    else:
        t0 = time.perf_counter()
        n = run()
    dt = time.perf_counter() - t0
    print(f"warm pass: {n} frames in {dt:.2f}s ({n / dt:.1f} fps)")
    print(pipe.timers.report())
    if args.trace_dir:
        print("trace written to", args.trace_dir)

    if args.eval:
        from cama_tpu.eval.map_metrics import MapEvaluator

        ev = MapEvaluator()
        k1 = pipe.crop_compact_k(args.source)
        P = int(pipe.scene.flat[args.source].points.shape[0])
        print("eval projections: "
              + (f"crop-compacted to k1={k1} of P={P}" if k1 is not None
                 else f"full P={P} (two-stage not engaged/sized)"))
        r = ev.evaluate_scene(pipe, args.source)  # cold (compiles + GT store)
        if not r["frames_evaluated"]:
            print("eval: no GT instance masks in clip — skipped")
            return 0
        ev.timers = type(ev.timers)()
        t0 = time.perf_counter()
        r = ev.evaluate_scene(pipe, args.source)
        dt = time.perf_counter() - t0
        print(f"warm eval: {r['frames_evaluated']} frames in {dt:.2f}s "
              f"({r['frames_evaluated'] / dt:.1f} fps)  "
              f"SRE={r['SRE']:.3f} P={r['precision']:.3f} R={r['recall']:.3f}")
        print(ev.timers.report())


if __name__ == "__main__":
    raise SystemExit(main())
