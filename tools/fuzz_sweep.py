#!/usr/bin/env python3
"""Extended differential-fuzz sweep: run the committed fuzz harnesses over a
much wider seed space than the suite's (suite keeps 2+12+6 trials for time;
this tool defaults to 20+50+40 and scales with --trials).

The harnesses themselves live in tests/ — this driver just widens their
parametrization, so a sweep failure is immediately reproducible as a pytest
trial number.

    python tools/fuzz_sweep.py                # default trial counts
    python tools/fuzz_sweep.py --trials 10x   # 10x the suite's counts

Exit 0 = every trial passed; 1 = at least one failure (printed with its
trial number).
"""
import argparse
import os
import pathlib
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--trials", default="1x",
                   help="multiplier like '10x' (of the sweep defaults "
                        "20/50/40), or an absolute per-harness count")
    args = p.parse_args(argv)
    if args.trials.endswith("x"):
        mul = float(args.trials[:-1])
        n_e2e, n_raster, n_seek, n_eval, n_fleet = (
            int(20 * mul), int(50 * mul), int(40 * mul), int(10 * mul),
            int(8 * mul))
    else:
        n_e2e = n_raster = n_seek = n_eval = n_fleet = int(args.trials)

    import jax

    jax.config.update("jax_platforms", "cpu")  # differential fuzz is host work

    failures = []

    def run(label, fn, trials):
        ok = 0
        for t in trials:
            try:
                fn(t)
                ok += 1
            except Exception as e:  # record + keep sweeping
                failures.append(f"{label} trial {t}: {e!r:.300}")
        print(f"{label}: {ok}/{len(list(trials))} passed", flush=True)

    import test_fuzz as tf

    # suite covers trials [0, committed); the sweep starts past them
    run("raster-vs-cv2", tf.test_fuzz_raster_paths_agree_with_cv2,
        range(12, 12 + n_raster))

    import test_map_metrics as tm

    def with_tmp(fn):
        def go(trial):
            with tempfile.TemporaryDirectory() as td:
                fn(pathlib.Path(td), trial)
        return go

    # chunked/batched evaluation vs the trusted per-frame loop (the metric
    # protocol's strongest available cross-check: the reference snapshot
    # ships no metric code)
    run("eval-chunking", with_tmp(tm.test_eval_fuzz_random_gt_patterns),
        range(3, 3 + n_eval))
    run("fleet-batch", with_tmp(tm.test_fleet_batch_fuzz),
        range(2, 2 + n_fleet))
    run("host-vs-device-eval", with_tmp(tm.test_host_vs_device_backend_fuzz),
        range(2, 2 + n_eval))
    from conftest import reference_available

    if reference_available():
        run("seek-vs-reference", tf.test_fuzz_seek_vs_reference,
            range(6, 6 + n_seek))
        import test_e2e_fuzz as te

        def e2e(trial):
            with tempfile.TemporaryDirectory() as td:
                te.test_randomized_scene_parity(pathlib.Path(td), trial)

        run("e2e-scene-parity", e2e, range(2, 2 + n_e2e))
    else:
        print("reference not mounted: differential harnesses skipped",
              flush=True)

    for f in failures:
        print("FAIL:", f, file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
