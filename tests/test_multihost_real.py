"""REAL multi-process DCN execution of parallel.multihost: two actual JAX
processes (2 virtual CPU devices each) bootstrapped with
jax.distributed.initialize, exchanging collectives over the Gloo CPU backend.

This is the true multi-controller tier that tests/test_multihost.py can only
emulate on a virtual single-process mesh: process_count()==2 for real,
reduce_metric_partials crosses processes via process_allgather, and the
jitted psum reduces over devices owned by DIFFERENT processes."""
import json
import os
import socket
import subprocess
import sys

import pytest

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dcn_child.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("n_procs", [2, 3])
def test_multi_process_dcn_cluster(n_procs):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen([sys.executable, CHILD, str(i), str(n_procs), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for i in range(n_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # every process converged on the same global totals, and exactly one
    # host saw (and isolated) the failing scene
    for o in outs[1:]:
        assert o["totals"] == outs[0]["totals"]
        assert o["psum"] == outs[0]["psum"]
    assert sorted(sum((o["failed_scenes"] for o in outs), [])) == ["c"]
