"""Device-mesh scaling: sharded Monte-Carlo sweeps over ICI/DCN meshes.

The reference has no parallelism of any kind — its Monte-Carlo studies are
serial Python ``for`` loops (`/root/reference/test/disturbRejComp.py:77-100`,
`test/saved_runs/success_rates_test.py:64-75`). Here the scenario batch is the
parallel axis: vmapped inside each chip, sharded across chips/hosts with
``jax.sharding`` + ``shard_map``, with stat reductions riding ICI collectives.
"""

from mpc_arpo_project_tpu.parallel.mesh import make_mesh, host_device_counts
from mpc_arpo_project_tpu.parallel.mc import (
    SweepStats,
    run_sweep,
    sharded_stats_fn,
    disturbance_rejection_study,
    success_rate_study,
)

__all__ = [
    "make_mesh",
    "host_device_counts",
    "SweepStats",
    "run_sweep",
    "sharded_stats_fn",
    "disturbance_rejection_study",
    "success_rate_study",
]
