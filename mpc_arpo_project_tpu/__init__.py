"""mpc_arpo_project_tpu — a TPU-native MPC engine for spacecraft rendezvous & proximity ops.

A brand-new JAX / XLA / Pallas framework with the capabilities of the reference
``IsaacTroche1/MPC_ARPO_Project`` (offset-free MPC for terminal spacecraft
rendezvous under Clohessy-Wiltshire dynamics), redesigned TPU-first:

- the OSQP C solver is replaced by a batched, in-graph OSQP-style ADMM solver
  (``ops.admm``) with shared-matrix structured constraint corrections so the
  per-iteration linear algebra runs as dense MXU matmuls over a scenario batch;
- the serial Python closed loop becomes a ``lax.scan`` rollout (``rollout``),
  vmapped over scenarios and shard_mapped over a TPU device mesh (``parallel``);
- control synthesis (DARE, integral-action LQR, Ackermann deadbeat), the
  augmented-disturbance UKF, and the dynamic LOS/funnel/debris constraint
  logic all run fully in-graph with static shapes.

Reference parity targets are documented per-module with file:line citations
into the reference tree (mounted read-only at /root/reference).
"""

__version__ = "0.1.0"

from mpc_arpo_project_tpu.config import (
    Noise,
    Debris,
    SimConditions,
    MPCParams,
    FailsafeParams,
    SimRun,
)

__all__ = [
    "Noise",
    "Debris",
    "SimConditions",
    "MPCParams",
    "FailsafeParams",
    "SimRun",
]
