"""Reporting & animation: matplotlib report parity with the reference's figures."""

from mpc_arpo_project_tpu.viz.report import figurePlotSave, simrun_from_rollout
from mpc_arpo_project_tpu.viz.animate import animate_trajectory
from mpc_arpo_project_tpu.viz.animate_html import export_html

__all__ = ["figurePlotSave", "simrun_from_rollout", "animate_trajectory",
           "export_html"]
