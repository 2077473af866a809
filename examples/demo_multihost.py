"""Multi-host scene sharding on REAL data, with REAL processes.

Spawns an N-process jax.distributed cluster (Gloo CPU collectives — the same
code path a multi-host TPU pod uses over DCN, parallel/multihost.py): each
process owns a shard of the scene list, compiles its scenes, runs the map
evaluator on them, and the per-scene metric partials are reduced globally so
every process ends with identical totals.  This is the deployment shape for
fleets of clips: scenes never cross hosts, only O(#metrics) floats do.

    python examples/demo_multihost.py [n_processes]   # default 2
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(pid, n, port, workdir):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)

    from cama_tpu.eval.map_metrics import MapEvaluator, reduce_metrics
    from cama_tpu.parallel import multihost
    from cama_tpu.pipeline import ClipPipeline

    multihost.initialize(f"localhost:{port}", n, pid)
    scenes = sorted(os.listdir(workdir))

    def process(scene):
        """Per-scene metric PARTIALS (plain sums — they reduce across hosts
        exactly like across frames)."""
        pipe = ClipPipeline(clip_path=os.path.join(workdir, scene), chunk=4)
        ev = MapEvaluator(tolerance=4)
        partials = {}
        for image_idx, vu, keep in ev._iter_frame_projections(pipe, "cama", None):
            ids = ev._load_all_cameras(pipe, image_idx)
            if ids is None:
                continue
            import jax.numpy as jnp
            import numpy as np

            from cama_tpu.eval.map_metrics import frame_metrics

            p = frame_metrics(jnp.asarray(ids > 0), vu, keep,
                              ev.max_radius, ev.tolerance, ev.distance)
            for k, v in p.items():
                partials[k] = partials.get(k, 0.0) + float(np.asarray(v))
        return partials

    results, failures = multihost.run_local_scenes(scenes, process)
    local = {}
    for part in results.values():
        for k, v in part.items():
            local[k] = local.get(k, 0.0) + v

    keys = ["sre_sum", "n_hit", "n_points", "gt_covered", "gt_total"]
    totals = multihost.reduce_metric_partials(local, keys)
    final = reduce_metrics([totals])
    print(json.dumps({
        "process": pid, "my_scenes": sorted(results), "failures": failures,
        "global": {k: round(float(v), 6) for k, v in final.items()},
    }), flush=True)


def main():
    if sys.argv[1:2] == ["--child"]:
        child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])
        return 0

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import tempfile

    sys.path.insert(0, REPO)
    from cama_tpu.io.fixture import add_instance_masks, make_fixture_clip
    from cama_tpu.parallel.cluster import free_port, run_local_cluster

    with tempfile.TemporaryDirectory() as workdir:
        for i in range(3):  # 3 scenes over n hosts: uneven shard on purpose
            clip = make_fixture_clip(workdir, scene_name=f"scene-{i}",
                                     n_frames=4, with_images=True,
                                     with_lidar=False, seed=i)
            add_instance_masks(clip)
        port = free_port()
        try:
            outs = run_local_cluster(
                [[sys.executable, os.path.abspath(__file__), "--child",
                  str(i), str(n), str(port), workdir] for i in range(n)],
                timeout=600)
        except RuntimeError as e:
            print(e)
            return 1
    for o in outs:
        print(f"process {o['process']}: scenes {o['my_scenes']} -> "
              f"global {o['global']}")
    agree = all(o["global"] == outs[0]["global"] for o in outs)
    covered = sorted(sum((o["my_scenes"] for o in outs), []))
    print(f"all {n} processes agree on the global metrics: {agree}; "
          f"scenes covered: {covered}")
    return 0 if agree and covered == [f"scene-{i}" for i in range(3)] else 1


if __name__ == "__main__":
    raise SystemExit(main())
