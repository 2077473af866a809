"""DCN-tier programs on the virtual device mesh: the ('hosts', 'local')
topology is carved out of the 8 virtual CPU devices, so the cross-host psum
program compiles and executes with real sharding semantics (single process —
jax.distributed itself needs multiple controllers, exercised operationally)."""
import numpy as np

import jax

from cama_tpu.parallel.multihost import (
    allgather_host_results,
    assign_scenes,
    cross_host_metric_sum,
    global_mesh,
    initialize,
    run_local_scenes,
    virtual_hosts_mesh,
)


def test_initialize_single_process_noop():
    assert initialize() is False
    assert initialize(num_processes=1) is False


def test_assign_scenes_round_robin():
    scenes = [f"s{i}" for i in range(7)]
    shards = [assign_scenes(scenes, process_index=i, process_count=3)
              for i in range(3)]
    assert shards[0] == ["s0", "s3", "s6"]
    assert shards[1] == ["s1", "s4"]
    assert shards[2] == ["s2", "s5"]
    assert sorted(sum(shards, [])) == sorted(scenes)


def test_run_local_scenes_failure_isolation():
    def process(scene):
        if scene == "bad":
            raise RuntimeError("boom")
        return len(scene)

    results, failures = run_local_scenes(
        ["a", "bad", "ccc"], process, process_index=0, process_count=1
    )
    assert results == {"a": 1, "ccc": 3}
    assert len(failures) == 1 and failures[0][0] == "bad"


def test_cross_host_metric_sum_on_virtual_mesh():
    mesh = virtual_hosts_mesh(4, per_host=2)
    assert dict(mesh.shape) == {"hosts": 4, "local": 2}
    keys = ["sre_sum", "n_points", "n_hit"]
    reducer = cross_host_metric_sum(mesh, keys)
    partials = [
        {"sre_sum": 1.5 * (i + 1), "n_points": 100.0 * (i + 1), "n_hit": 7.0}
        for i in range(4)
    ]
    out = reducer(partials)
    assert out["sre_sum"] == sum(p["sre_sum"] for p in partials)
    assert out["n_points"] == 1000.0
    assert out["n_hit"] == 28.0


def test_global_mesh_shape():
    mesh = global_mesh()
    assert mesh.shape["hosts"] == jax.process_count()
    assert mesh.shape["hosts"] * mesh.shape["local"] == len(jax.devices())


def test_allgather_single_process_identity():
    out = allgather_host_results(np.array([1.0, 2.0]))
    assert out.shape == (1, 2)
    np.testing.assert_array_equal(out[0], [1.0, 2.0])


def test_reduce_metric_partials_single_process():
    from cama_tpu.parallel.multihost import reduce_metric_partials

    out = reduce_metric_partials({"sre_sum": 3.5, "n_points": 10.0}, 
                                 ["sre_sum", "n_points", "n_hit"])
    assert out == {"n_hit": 0.0, "n_points": 10.0, "sre_sum": 3.5}
