"""REAL multi-process DCN execution of parallel.multihost: two actual JAX
processes (2 virtual CPU devices each) bootstrapped with
jax.distributed.initialize, exchanging collectives over the Gloo CPU backend.

This is the true multi-controller tier that tests/test_multihost.py can only
emulate on a virtual single-process mesh: process_count()==2 for real,
reduce_metric_partials crosses processes via process_allgather, and the
jitted psum reduces over devices owned by DIFFERENT processes."""
import os
import sys

import pytest

from cama_tpu.parallel.cluster import free_port, run_local_cluster

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dcn_child.py")


@pytest.mark.parametrize("n_procs", [2, 3])
def test_multi_process_dcn_cluster(n_procs):
    port = free_port()
    outs = run_local_cluster(
        [[sys.executable, CHILD, str(i), str(n_procs), str(port)]
         for i in range(n_procs)])

    # every process converged on the same global totals, and exactly one
    # host saw (and isolated) the failing scene
    for o in outs[1:]:
        assert o["totals"] == outs[0]["totals"]
        assert o["psum"] == outs[0]["psum"]
    assert sorted(sum((o["failed_scenes"] for o in outs), [])) == ["c"]
    # the production scene-batched overlay and fleet-metric programs ran
    # across processes (frame shards on different hosts -> the frames psum
    # is a genuine DCN collective) and matched single-device references
    for o in outs:
        assert o["scene_rasters_ok"] and o["scene_metrics_ok"], o
