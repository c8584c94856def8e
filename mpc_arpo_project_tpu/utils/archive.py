"""Run archiving: pickle/restore of (SimConditions, SimRun) pairs.

The reference archives runs as ``{'simcond': ..., 'simrun': ...}`` pickles in
``RunObjs/`` for later re-plotting and re-animation
(`/root/reference/test/traj_eval_radial.py:92-105`,
`test/animations_results.py:18-26`); same layout here, plus the debris object
(the continuous driver already pickles it, `test/traj_eval_radialC.py:84`).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

from mpc_arpo_project_tpu.config import SimConditions, SimRun, Debris


def save_run(
    path: str,
    sim_conditions: SimConditions,
    sim_run: SimRun,
    debris: Optional[Debris] = None,
) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        pickle.dump(
            {"simcond": sim_conditions, "simrun": sim_run, "debris": debris}, fh
        )
    return path


def load_run(path: str):
    """Returns (sim_conditions, sim_run, debris)."""
    with open(path, "rb") as fh:
        d = pickle.load(fh)
    return d["simcond"], d["simrun"], d.get("debris")
