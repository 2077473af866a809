"""Multi-host scale-out (DCN tier).

Design (SURVEY.md §2.4/§5): within a slice, the ('frames', 'points') mesh
rides ICI (parallel/sharding.py); across hosts, sharding happens at the
SCENE/SITE granularity — each host compiles and processes whole clips, and
only scene-level metric partials (plain sums, see eval.map_metrics) cross DCN
via psum on a global mesh.  Nothing per-frame ever crosses hosts.

This module is the thin bootstrap; it is exercised in single-process form by
the test suite (jax.distributed is a no-op with one process) and follows the
standard JAX multi-controller recipe otherwise.
"""
from __future__ import annotations

import jax
import numpy as np


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


def global_scene_mesh(scenes_per_host=1):
    """A 1-D global mesh over all devices of all processes, axis 'scenes':
    each host's local devices serve its local scene shard; psum over 'scenes'
    aggregates site-level metrics across hosts (DCN)."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("scenes",))


def assign_scenes(scene_names):
    """Round-robin scene list over processes (host-level data parallelism —
    the analogue of the reference's outer scene loop, main.py:32)."""
    n = jax.process_count()
    i = jax.process_index()
    return [s for k, s in enumerate(scene_names) if k % n == i]
