"""Clohessy-Wiltshire (CW) planar relative-motion model and its discretization.

TPU-first design notes
----------------------
The reference discretizes with ``scipy.linalg.expm`` for Ad and a sympy
symbolic matrix exponential integrated element-wise with ``scipy.integrate.quad``
for Bd (`/root/reference/src/trajectorySimulate.py:100-109`). Here both are a
single matrix exponential of the standard augmented block matrix

    expm([[A, B], [0, 0]] * T) = [[Ad, int_0^T e^{As} ds @ B], [0, I]]

computed with ``jax.scipy.linalg.expm`` — one fused, jittable, vmappable op
(valid for any A; no quadrature). The impulsive delta-v input model
``Bd = Ad @ [[0],[I]]`` matches `/root/reference/src/trajectorySimulate.py:110-111`.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl

NX = 4  # state dim [dx, dy, dvx, dvy]
NU = 2  # input dim
NDI = 2  # disturbance states (offset-free layer)
NYM = 2  # measured outputs (range, bearing after h(x))


def cw_continuous(n, dtype=jnp.float64):
    """Continuous-time planar CW matrices (reference `trajectorySimulate.py:73-94`).

    Args:
        n: mean motion of the target orbit (rad/s).

    Returns:
        (Ap, Bp, Cm): 4x4 state matrix, 4x2 input matrix, 2x4 position output map.
    """
    n = jnp.asarray(n, dtype=dtype)
    z = jnp.zeros((), dtype=dtype)
    o = jnp.ones((), dtype=dtype)
    Ap = jnp.stack(
        [
            jnp.stack([z, z, o, z]),
            jnp.stack([z, z, z, o]),
            jnp.stack([3 * n**2, z, z, 2 * n]),
            jnp.stack([z, z, -2 * n, z]),
        ]
    )
    Bp = jnp.array([[0.0, 0.0], [0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], dtype=dtype)
    Cm = jnp.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]], dtype=dtype)
    return Ap, Bp, Cm


def discretize(Ap, Bp, T, is_delta_v: bool = False):
    """Exact zero-order-hold discretization via an augmented matrix exponential.

    Matches the reference's ``Ad = expm(Ap*T)`` and
    ``Bd = (int_0^T expm(Ap*s) ds) @ Bp`` (`trajectorySimulate.py:100-109`)
    without quadrature. With ``is_delta_v`` the input is an instantaneous
    velocity change applied at the start of the step:
    ``Bd = Ad @ [[0],[I]]`` (`trajectorySimulate.py:110-111`).
    """
    nx = Ap.shape[0]
    nu = Bp.shape[1]
    dtype = Ap.dtype
    M = jnp.zeros((nx + nu, nx + nu), dtype=dtype)
    M = M.at[:nx, :nx].set(Ap * T)
    M = M.at[:nx, nx:].set(Bp * T)
    eM = jsl.expm(M)
    Ad = eM[:nx, :nx]
    if is_delta_v:
        Bd = Ad @ jnp.concatenate(
            [jnp.zeros((2, 2), dtype=dtype), jnp.eye(2, dtype=dtype)], axis=0
        )
    else:
        Bd = eM[:nx, nx:]
    return Ad, Bd


def observer_matrices(Ad, Bd, Cm):
    """Augmented offset-free observer system (reference `trajectorySimulate.py:113-118`).

    Ao = blkdiag(Ad, I_2) with position<-disturbance coupling Ao[0,4]=Ao[1,5]=1,
    Bou = [Bd; 0], Co = [Cm 0].
    """
    dtype = Ad.dtype
    nx = Ad.shape[0]
    Ao = jnp.zeros((nx + NDI, nx + NDI), dtype=dtype)
    Ao = Ao.at[:nx, :nx].set(Ad)
    Ao = Ao.at[nx:, nx:].set(jnp.eye(NDI, dtype=dtype))
    Ao = Ao.at[0, 4].set(1.0)
    Ao = Ao.at[1, 5].set(1.0)
    Bou = jnp.concatenate([Bd, jnp.zeros((NDI, Bd.shape[1]), dtype=dtype)], axis=0)
    Co = jnp.concatenate([Cm, jnp.zeros((Cm.shape[0], NDI), dtype=dtype)], axis=1)
    return Ao, Bou, Co
