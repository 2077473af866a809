"""Unit tests for the local multi-process cluster launcher.

cama_tpu/parallel/cluster.py is the launcher side of the DCN tier shared by
tests/test_multihost_real.py, the driver dryrun, and the multi-host demo.
Those consumers only exercise the happy path; the hazards the module exists
to handle (teardown chatter, hung children, nonzero exits, inherited
platform forcing) are pinned here with cheap `python -c` children.
"""
import os
import subprocess
import sys
import time

import pytest

from cama_tpu.parallel.cluster import _last_json_line, free_port, run_local_cluster

PY = sys.executable


def test_free_port_is_bindable():
    import socket

    port = free_port()
    s = socket.socket()
    s.bind(("localhost", port))  # would raise if the port were taken
    s.close()


def test_last_json_line_takes_last_valid_object():
    out = '{"first": 1}\nnot json\n{"second": 2}\nGloo teardown chatter\n'
    assert _last_json_line(out) == {"second": 2}


def test_last_json_line_skips_unparseable_braces():
    # a line starting with '{' that is NOT valid JSON must not shadow the
    # real payload above it
    out = '{"payload": true}\n{broken brace line\n'
    assert _last_json_line(out) == {"payload": True}


def test_last_json_line_none_when_no_json():
    assert _last_json_line("hello\nworld\n") is None


def test_run_local_cluster_collects_payloads_in_order():
    cmds = [[PY, "-c", f'print("noise"); print(\'{{"rank": {i}}}\')']
            for i in range(3)]
    outs = run_local_cluster(cmds)
    assert [o["rank"] for o in outs] == [0, 1, 2]


def test_child_env_drops_platform_forcing():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["CAMA_TEST_MARKER"] = "kept"
    code = ("import os, json; print(json.dumps({"
            "'jp': os.environ.get('JAX_PLATFORMS'),"
            "'xf': os.environ.get('XLA_FLAGS'),"
            "'mk': os.environ.get('CAMA_TEST_MARKER')}))")
    (out,) = run_local_cluster([[PY, "-c", code]], env=env)
    assert out == {"jp": None, "xf": None, "mk": "kept"}


def test_nonzero_exit_raises_with_streams_and_kills_siblings():
    # child 0 fails fast; child 1 would sleep well past the test budget —
    # the launcher must kill it rather than wait out its sleep
    fail = [PY, "-c", "import sys; print('partial'); "
            "sys.stderr.write('boom\\n'); sys.exit(3)"]
    sleeper = [PY, "-c", "import time; time.sleep(600)"]
    t0 = time.monotonic()
    with pytest.raises(RuntimeError) as e:
        run_local_cluster([fail, sleeper], timeout=120)
    assert time.monotonic() - t0 < 60, "sleeper sibling was not killed"
    msg = str(e.value)
    assert "exited 3" in msg and "partial" in msg and "boom" in msg


def test_timeout_kills_whole_cluster():
    sleeper = [PY, "-c", "import time; time.sleep(600)"]
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="hung past"):
        run_local_cluster([sleeper, sleeper], timeout=2)
    # both children killed: well under the 600 s sleep, and no zombies able
    # to outlive the call (communicate() in _kill_all reaped them)
    assert time.monotonic() - t0 < 60


def test_missing_payload_raises():
    quiet = [PY, "-c", "print('no json here')"]
    with pytest.raises(RuntimeError, match="no JSON payload"):
        run_local_cluster([quiet])


def test_chatty_child_does_not_deadlock():
    """A child that writes far more than the OS pipe buffer (~64 KB) to
    stderr must not stall the cluster: pipes drain concurrently."""
    chatty = [PY, "-c",
              "import sys, json; sys.stderr.write('x' * 300_000); "
              "print(json.dumps({'ok': 1}))"]
    quiet = [PY, "-c", "import json; print(json.dumps({'ok': 2}))"]
    t0 = time.monotonic()
    outs = run_local_cluster([chatty, quiet], timeout=60)
    assert time.monotonic() - t0 < 30, "chatty child stalled the drain"
    assert [o["ok"] for o in outs] == [1, 2]
