"""Reporting & animation: matplotlib report parity with the reference's figures."""

from mpc_arpo_project_tpu.viz.report import figurePlotSave, simrun_from_rollout

__all__ = ["figurePlotSave", "simrun_from_rollout"]
