"""Utilities: timing/profiling harness and in-graph numeric guards."""

from mpc_arpo_project_tpu.utils.timing import Timer, device_time, profile_trace
from mpc_arpo_project_tpu.utils.guards import check_finite_tree

__all__ = ["Timer", "device_time", "profile_trace", "check_finite_tree"]
