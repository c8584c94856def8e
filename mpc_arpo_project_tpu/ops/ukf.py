"""Unscented Kalman filter for the offset-free disturbance observer, in pure JAX.

Replaces the reference's filterpy ``UnscentedKalmanFilter`` with Merwe scaled
sigma points (`/root/reference/src/trajectorySimulate.py:121-130,277-282,329-337`):
6 augmented states (4 CW states + 2 constant-bias disturbances), linear process
model x+ = Ao x + Bou u, nonlinear range/bearing measurement
h(x) = (||x_{0:2}||, atan2(y, x)), alpha=0.1, beta=2, kappa=-1, R=0.

Conventions follow filterpy exactly so the NumPy oracle (tools/ref_sim.py) and
this implementation agree to rounding error:
  * sigma offsets are the rows of the *upper* Cholesky factor U of (n+lam)P
    (equivalently columns of the lower factor L, since U = L');
  * the update step reuses the predicted sigma points (no redraw);
  * the innovation covariance is inverted directly.
Everything is vmappable over a scenario batch and differentiable.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp


class MerweWeights(NamedTuple):
    Wm: jnp.ndarray  # (2n+1,)
    Wc: jnp.ndarray  # (2n+1,)
    lam: jnp.ndarray  # ()


def merwe_weights(n: int, alpha: float, beta: float, kappa: float, dtype=jnp.float64):
    lam = alpha**2 * (n + kappa) - n
    Wm = jnp.full((2 * n + 1,), 1.0 / (2 * (n + lam)), dtype=dtype)
    Wc = Wm
    Wm = Wm.at[0].set(lam / (n + lam))
    Wc = Wc.at[0].set(lam / (n + lam) + (1 - alpha**2 + beta))
    return MerweWeights(Wm=Wm, Wc=Wc, lam=jnp.asarray(lam, dtype=dtype))


def _chol_unrolled(A: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky of a small SPD matrix via statically unrolled
    Cholesky-Banachiewicz. XLA's generic decomposition lowers to a large
    op graph that both compiles and dispatches slowly on the target TPU
    backend; for the UKF's 6x6 this is ~40 fused scalar ops instead."""
    n = A.shape[0]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    rows = [
        jnp.stack([L[i][j] if j <= i else jnp.zeros((), A.dtype) for j in range(n)])
        for i in range(n)
    ]
    return jnp.stack(rows)


def sigma_points(x: jnp.ndarray, P: jnp.ndarray, lam) -> jnp.ndarray:
    """(2n+1, n) Merwe sigma points; offsets are columns of chol_lower((n+lam)P)."""
    n = x.shape[0]
    L = _chol_unrolled((n + lam) * P)
    U = L.T  # rows of U == filterpy's rows of scipy's upper factor
    return jnp.concatenate([x[None, :], x[None, :] + U, x[None, :] - U], axis=0)


class UKFState(NamedTuple):
    x: jnp.ndarray  # (n,)
    P: jnp.ndarray  # (n, n)


def predict(
    state: UKFState, w: MerweWeights, fx: Callable, Q: jnp.ndarray
) -> tuple[UKFState, jnp.ndarray]:
    """UT through the process model; returns the prior and the propagated
    sigma points (reused by ``update``, matching filterpy)."""
    sig = sigma_points(state.x, state.P, w.lam)
    sig_f = fx(sig)  # (2n+1, n) — fx must broadcast over the leading axis
    x_prior = w.Wm @ sig_f
    d = sig_f - x_prior[None, :]
    P_prior = (d * w.Wc[:, None]).T @ d + Q
    return UKFState(x=x_prior, P=P_prior), sig_f


def update(
    prior: UKFState,
    sig_f: jnp.ndarray,
    w: MerweWeights,
    hx: Callable,
    z: jnp.ndarray,
    R: jnp.ndarray,
) -> UKFState:
    sig_h = hx(sig_f)  # (2n+1, nz)
    z_pred = w.Wm @ sig_h
    dz = sig_h - z_pred[None, :]
    S = (dz * w.Wc[:, None]).T @ dz + R
    dx = sig_f - prior.x[None, :]
    Pxz = (dx * w.Wc[:, None]).T @ dz
    # closed-form 2x2 inverse (see _chol_unrolled for why not jnp.linalg.inv)
    det = S[0, 0] * S[1, 1] - S[0, 1] * S[1, 0]
    S_inv = (
        jnp.stack([jnp.stack([S[1, 1], -S[0, 1]]), jnp.stack([-S[1, 0], S[0, 0]])])
        / det
    )
    K = Pxz @ S_inv
    x_post = prior.x + K @ (z - z_pred)
    P_post = prior.P - K @ S @ K.T
    return UKFState(x=x_post, P=P_post)


def range_bearing(x: jnp.ndarray) -> jnp.ndarray:
    """h(x) = (||x_{0:2}||, atan2(y, x)) (`trajectorySimulate.py:124-128`).
    Broadcasts over a leading sigma-point axis."""
    rng = jnp.linalg.norm(x[..., :2], axis=-1)
    brg = jnp.arctan2(x[..., 1], x[..., 0])
    return jnp.stack([rng, brg], axis=-1)


def step(
    state: UKFState,
    u: jnp.ndarray,
    z: jnp.ndarray,
    w: MerweWeights,
    Ao: jnp.ndarray,
    Bou: jnp.ndarray,
    Q: jnp.ndarray,
    R: jnp.ndarray,
) -> UKFState:
    """One predict+update cycle with the linear observer process model
    fx(x) = Ao x + Bou u and the range/bearing measurement."""
    fx = lambda s: s @ Ao.T + (Bou @ u)[None, :]
    prior, sig_f = predict(state, w, fx, Q)
    return update(prior, sig_f, w, range_bearing, z, R)
