"""Child process for the REAL multi-process DCN test (test_multihost_real).

Each instance is one 'host': its own JAX process with 2 virtual CPU devices,
bootstrapped into a 2-process cluster via jax.distributed (Gloo CPU
collectives).  Exercises the production parallel.multihost tier end-to-end:
initialize -> global ('hosts','local') mesh -> host-level scene sharding with
failure isolation -> cross-DCN metric reduction (process_allgather) -> a
jitted cross-process psum over the global mesh.

Usage: python dcn_child.py <process_id> <num_processes> <port>
Prints one JSON line on success.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cama_tpu.parallel import multihost  # noqa: E402


def main():
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    started = multihost.initialize(f"localhost:{port}", n, pid)
    assert started, "initialize must bootstrap for num_processes > 1"
    assert jax.process_count() == n and jax.process_index() == pid
    assert jax.local_device_count() == 2 and jax.device_count() == 2 * n

    mesh = multihost.global_mesh()
    assert dict(mesh.shape) == {"hosts": n, "local": 2}, mesh.shape

    # host-level scene sharding with failure isolation: scene 'c' fails on
    # whichever host owns it, the batch keeps going
    scenes = ["a", "b", "c", "d", "e"]
    mine = multihost.assign_scenes(scenes)
    assert mine == scenes[pid::n]

    def process(scene):
        if scene == "c":
            raise RuntimeError("boom")
        return {"n_hit": float(ord(scene)), "n_points": 2.0}

    results, failures = multihost.run_local_scenes(scenes, process)
    local = {
        "n_hit": sum(r["n_hit"] for r in results.values()),
        "n_points": sum(r["n_points"] for r in results.values()),
    }

    # THE cross-DCN reduction: every process ends with the global totals
    totals = multihost.reduce_metric_partials(local, ["n_hit", "n_points"])
    want_hit = float(sum(ord(s) for s in scenes if s != "c"))
    assert totals["n_hit"] == want_hit, (totals, want_hit)
    assert totals["n_points"] == 2.0 * (len(scenes) - 1)

    # a jitted psum whose reduction spans PROCESSES (true DCN collective):
    import numpy as np

    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def global_sum(x):
        def body(xs):
            s = jax.lax.psum(xs.sum(), ("hosts", "local"))
            return jnp.broadcast_to(s, xs.shape)

        return shard_map(body, mesh=mesh, in_specs=P(("hosts", "local")),
                         out_specs=P(("hosts", "local")))(x)

    g = 2 * n  # one row per global device
    x = jax.make_array_from_callback(
        (g, 4), NamedSharding(mesh, P(("hosts", "local"))),
        lambda idx: np.arange(g * 4.0).reshape(g, 4)[idx])
    y = global_sum(x)
    got = float(np.asarray(y.addressable_shards[0].data)[0, 0])
    assert got == float(np.arange(g * 4.0).sum()), got

    print(json.dumps({"pid": pid, "totals": totals, "psum": got,
                      "failed_scenes": [f[0] for f in failures]}), flush=True)


if __name__ == "__main__":
    main()
