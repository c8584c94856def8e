"""Nonlinear planar two-body relative dynamics and a fixed-step RK4 integrator.

The reference integrates this plant with adaptive RK45 (`scipy.integrate.solve_ivp`)
one millisecond at a time (`/root/reference/src/trajectorySimulateC.py:64-79,372-374`).
Adaptive stepping is shape-dynamic and serializes terribly under jit, so the
TPU-native treatment is classic fixed-step RK4 at the same 1 ms substep — at that
step size the local truncation error is far below the reference's solver
tolerances, which unit tests confirm against solve_ivp goldens.
"""

from __future__ import annotations

import jax.numpy as jnp

# Orbit constants assumed by the reference (500 km altitude,
# `/root/reference/src/trajectorySimulateC.py:66-70`).
ALT = 500e3
RE = 6378.1e3
R_T = ALT + RE


def two_body_deriv(x, u, n):
    """State derivative of the nonlinear planar two-body relative dynamics.

    Mirrors `stateEqnN` (`/root/reference/src/trajectorySimulateC.py:64-79`):
    full inverse-square gravity on the chaser expressed in the rotating LVLH
    frame of a circular target orbit with mean motion ``n``.
    Shapes: x (..., 4), u (..., 2) -> (..., 4).
    """
    mu = (n**2) * (R_T**3)
    px, py, vx, vy = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    r3 = ((R_T + px) ** 2 + py**2) ** 1.5
    ax = 2 * n * vy + (n**2) * px - mu * (R_T + px) / r3 + mu / (R_T**2) + u[..., 0]
    ay = -2 * n * vx + (n**2) * py - mu * py / r3 + u[..., 1]
    return jnp.stack([vx, vy, ax, ay], axis=-1)


def rk4_step(x, u, n, dt):
    """One classic RK4 step of the nonlinear plant with zero-order-hold input."""
    k1 = two_body_deriv(x, u, n)
    k2 = two_body_deriv(x + 0.5 * dt * k1, u, n)
    k3 = two_body_deriv(x + 0.5 * dt * k2, u, n)
    k4 = two_body_deriv(x + dt * k3, u, n)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
