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
    run("eval-compact-vs-full", with_tmp(tm.test_compact_vs_full_fuzz),
        range(2, 2 + n_eval))

    # polygon-union arrangement vs the coverage-mask oracle, mixed shapes
    # (rotated rects, triangles, holes) — widens test_convert's fixed-seed
    # union fuzz loops
    import numpy as np
    import test_convert as tc

    from cama_tpu.convert import geom

    def union_trial(trial):
        rng = np.random.default_rng(9000 + trial)
        polys = []
        for _ in range(int(rng.integers(2, 5))):
            kind = rng.random()
            x0, y0 = rng.uniform(0, 3, 2)
            if kind < 0.4:  # axis-aligned rect, maybe with a hole
                wd, ht = rng.uniform(1.0, 3.0, 2)
                ext = tc._sq(x0, y0, x0 + wd, y0 + ht)
                holes = []
                if rng.random() < 0.5:
                    hx, hy = x0 + wd * 0.3, y0 + ht * 0.3
                    holes.append(
                        tc._sq(hx, hy, hx + wd * 0.35, hy + ht * 0.35)[::-1])
                polys.append((ext, holes))
            elif kind < 0.75:  # rotated rectangle
                wd, ht = rng.uniform(0.8, 2.5, 2)
                th = rng.uniform(0, np.pi)
                R = np.array([[np.cos(th), -np.sin(th)],
                              [np.sin(th), np.cos(th)]])
                base = np.array([[0, 0], [wd, 0], [wd, ht], [0, ht]], float)
                polys.append(((base @ R.T + (x0, y0)), []))
            else:  # triangle
                polys.append(((np.array([(x0, y0)]) + rng.uniform(
                    -1.5, 1.5, (3, 2))), []))
        out = geom.union_polygons(polys)
        xs = np.linspace(-1.03, 7.05, 97)
        ys = np.linspace(-1.01, 7.07, 93)
        m_in = tc._union_mask(polys, xs, ys)
        m_out = tc._union_mask(out, xs, ys)
        # boundary-grazing samples may flip either way; interiors must match
        assert (m_in != m_out).mean() < 2e-3, (m_in != m_out).mean()

    run("polygon-union", union_trial, range(n_eval * 2))
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
