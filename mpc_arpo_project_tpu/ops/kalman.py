"""Steady-state Kalman filter — the linear-measurement estimator variant.

The reference's prototype lineage includes a steady-state KF with the gain
from a DARE on the transposed system (`/root/reference/misc/
MPCrendezvousKALMANONLY.py:62-63`) and a disturbance-augmented recursive KF
(`misc/MPCrendezKALMANdisturb.py`), the direct ancestors of the production
UKF. This module provides the steady-state variant in-graph: useful when the
measurement model is linearized (position measurements) and per-step
covariance propagation is unnecessary — the cheapest estimator in the family.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpc_arpo_project_tpu.ops.riccati import solve_dare


def steady_state_gain_np(A, C, W, V):
    """Float64 host-side twin of :func:`steady_state_gain` (scipy DARE) —
    used by ``rollout.discrete.build_engine(estimator='kf')`` so the gain is
    synthesized in fp64 regardless of the rollout dtype, exactly like the
    controller gains (the reference prototype synthesizes in float64,
    `misc/MPCrendezvousKALMANONLY.py:62-63`)."""
    import scipy.linalg as sla

    P = sla.solve_discrete_are(np.asarray(A).T, np.asarray(C).T,
                               np.asarray(W), np.asarray(V))
    S = C @ P @ C.T + V
    L = P @ C.T @ np.linalg.inv(S)
    return L, P


def steady_state_gain(A, C, W, V, iters: int = 30):
    """Steady-state Kalman gain L for x+ = A x + w, y = C x + v.

    Solves the filter DARE via the control DARE on the dual system
    (A', C', W, V) — the duality the reference prototype uses
    (`misc/MPCrendezvousKALMANONLY.py:62-63`): P = dare(A', C', W, V),
    L = P C' (C P C' + V)^{-1}.
    """
    P = solve_dare(A.T, C.T, W, V, iters=iters)
    S = C @ P @ C.T + V
    L = P @ C.T @ jnp.linalg.inv(S)
    return L, P


def kf_step(x, u, z, A, B, C, L):
    """One steady-state KF update: predict then correct with the fixed gain."""
    x_pred = A @ x + B @ u
    return x_pred + L @ (z - C @ x_pred)
