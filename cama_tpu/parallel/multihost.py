"""Multi-host scale-out (DCN tier).

Design (SURVEY.md §2.4/§5): within a slice, the ('frames', 'points') mesh
rides ICI (parallel/sharding.py); across hosts, sharding happens at the
SCENE/SITE granularity — each host compiles and processes whole clips, and
only scene-level metric partials (plain sums, see eval.map_metrics) cross DCN
via psum on a global ('hosts', 'local') mesh.  Nothing per-frame ever crosses
hosts.

Pieces:
  * initialize()            — jax.distributed bootstrap (no-op single-process)
  * global_mesh()           — [process_count, local_devices] ('hosts','local')
  * virtual_hosts_mesh()    — the same topology carved out of one process's
                              devices, so the DCN-tier programs compile and
                              run under the 8-virtual-CPU-device test mesh
  * assign_scenes()         — host-level scene round-robin
  * run_local_scenes()      — per-scene driver with failure isolation
  * cross_host_metric_sum() — jitted psum of a metric dict over 'hosts'
  * allgather_host_results()— DCN allgather of per-host payload arrays
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed bootstrap; safe no-op for a single process."""
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh():
    """2-D global mesh [process_count, devices_per_process] with axes
    ('hosts', 'local'): collectives over 'hosts' ride DCN, over 'local' ride
    ICI.  Within a host, 'local' can be reshaped into the ('frames','points')
    slice mesh by parallel.sharding.make_mesh over the host's devices."""
    devs = np.array(jax.devices()).reshape(jax.process_count(), -1)
    return Mesh(devs, ("hosts", "local"))


def virtual_hosts_mesh(n_hosts, per_host=1):
    """The ('hosts', 'local') topology carved from this process's devices —
    lets every DCN-tier program compile and execute on the virtual CPU mesh
    (tests) or a single slice, with identical sharding semantics."""
    devs = jax.devices()
    need = n_hosts * per_host
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(n_hosts, per_host),
                ("hosts", "local"))


def global_scene_mesh():
    """Deprecated round-1 name for global_mesh()."""
    return global_mesh()


def assign_scenes(scene_names, process_index=None, process_count=None):
    """Round-robin scene list over processes (host-level data parallelism —
    the analogue of the reference's outer scene loop, main.py:32)."""
    n = process_count if process_count is not None else jax.process_count()
    i = process_index if process_index is not None else jax.process_index()
    return [s for k, s in enumerate(scene_names) if k % n == i]


def run_local_scenes(scene_names, process_fn, **assign_kw):
    """Process this host's scene shard with per-scene failure isolation
    (reference semantics: one bad scene must not kill the batch,
    cama_tpu/cli.py).  Returns ({scene: result}, [(scene, error_repr)])."""
    results, failures = {}, []
    for scene in assign_scenes(scene_names, **assign_kw):
        try:
            results[scene] = process_fn(scene)
        except Exception as e:  # noqa: BLE001 — isolation is the contract
            failures.append((scene, repr(e)))
    return results, failures


def reduce_metric_partials(local_partial, metric_keys):
    """THE multi-controller DCN reduction: each process contributes its own
    scene-metric partial dict; every process receives the global sums.
    O(#metrics) floats cross DCN per scene (process_allgather; identity in a
    single process).  Use this in real multi-host deployments;
    cross_host_metric_sum below is the single-controller (virtual-hosts /
    one-slice) jitted equivalent."""
    keys = tuple(sorted(metric_keys))
    vec = np.asarray([float(local_partial.get(k, 0.0)) for k in keys],
                     np.float32)
    gathered = allgather_host_results(vec)  # [n_processes, n_keys]
    totals = gathered.sum(axis=0)
    return {k: float(v) for k, v in zip(keys, totals)}


def cross_host_metric_sum(mesh, metric_keys):
    """Jitted psum of metric partials over a mesh's 'hosts' axis.

    Single-controller form (one process addressing all the mesh's devices —
    a real slice or the virtual-hosts test mesh): the caller holds every
    host-row's partial and the program reduces them with a psum collective.
    For true multi-process deployments use reduce_metric_partials, which
    moves each process's locally-held partial over DCN."""
    keys = tuple(sorted(metric_keys))

    def step(vals):  # vals: {k: [1] local shard of a [n_hosts] array}
        return {k: jax.lax.psum(v.sum(), axis_name="hosts") for k, v in vals.items()}

    sharded = jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=({k: P("hosts") for k in keys},),
            out_specs={k: P() for k in keys},
        )
    )

    def run(per_host_partials):
        """per_host_partials: list (len n_hosts) of {key: float}."""
        n = mesh.shape["hosts"]
        assert len(per_host_partials) == n, (len(per_host_partials), n)
        arrs = {
            k: jnp.asarray([float(p.get(k, 0.0)) for p in per_host_partials],
                           jnp.float32)
            for k in keys
        }
        out = sharded(arrs)
        return {k: float(v) for k, v in out.items()}

    return run


def allgather_host_results(payload):
    """Gather a small per-host array payload to every host (DCN).  Uses
    multihost_utils when running multi-process; identity otherwise."""
    if jax.process_count() == 1:
        return np.asarray(payload)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(jnp.asarray(payload)))
