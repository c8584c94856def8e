"""Mesh construction for single-chip, single-host-multi-chip, and multi-host runs.

The scenario-batch axis is the only data axis this problem needs (SURVEY §2.1:
model/tensor/pipeline parallelism have no counterpart — per-problem state is
~200 variables). Multi-host pods get a hybrid ("dcn", "ici") mesh so stat
reductions stay on ICI within a slice and cross DCN only once per sweep.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_device_counts() -> tuple[int, int]:
    """(num_processes, local_devices_per_process)."""
    return jax.process_count(), jax.local_device_count()


def make_mesh(devices: Optional[Sequence] = None, hybrid: bool = False) -> Mesh:
    """Build the scenario-sweep mesh.

    Args:
        devices: defaults to all devices.
        hybrid: when True and multiple processes exist, lay devices out as a
            2-D ("dcn", "ici") mesh (hosts x local chips) so collectives can
            be staged per-axis; otherwise a flat 1-D ("data",) mesh.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if hybrid:
        n_proc = jax.process_count()
        per = len(devices) // n_proc
        return Mesh(devices.reshape(n_proc, per), ("dcn", "ici"))
    return Mesh(devices, ("data",))


def batch_sharding(mesh: Mesh, batch_axis: int = 1) -> NamedSharding:
    """Sharding for (T, B, ...) rollout inputs: shard the batch axis over every
    mesh axis, replicate the rest."""
    axes = tuple(mesh.axis_names)
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = axes if len(axes) > 1 else axes[0]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
