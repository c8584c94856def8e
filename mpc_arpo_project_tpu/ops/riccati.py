"""Control synthesis in pure JAX: DARE, (integral-action) discrete LQR, Ackermann.

These replace the reference's LAPACK/SLICOT-backed calls —
``scipy.linalg.solve_discrete_are`` (`/root/reference/src/trajectorySimulate.py:175`),
``control.dlqr(..., integral_action=C)`` (`:185-187`) and ``control.acker``
(`:190-203`) — with jittable, vmappable ops so whole config sweeps can
synthesize their gains in-graph. They run once per scenario; accuracy is what
matters, and unit tests pin them against SciPy float64 goldens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_dare(A, B, Q, R, iters: int = 30):
    """Discrete algebraic Riccati equation via the structured doubling algorithm.

    Solves X = A'XA - A'XB (R + B'XB)^{-1} B'XA + Q.

    SDA iterates (quadratic convergence; ~30 doublings is far past fp64
    saturation for these 4x4 systems):
        A_{k+1} = A_k (I + G_k H_k)^{-1} A_k
        G_{k+1} = G_k + A_k (I + G_k H_k)^{-1} G_k A_k'
        H_{k+1} = H_k + A_k' H_k (I + G_k H_k)^{-1} A_k
    with A_0 = A, G_0 = B R^{-1} B', H_0 = Q; H_k -> X.
    """
    dtype = A.dtype
    n = A.shape[0]
    I = jnp.eye(n, dtype=dtype)
    G0 = B @ jnp.linalg.solve(R, B.T)

    def body(_, carry):
        Ak, Gk, Hk = carry
        W = I + Gk @ Hk
        # (I + G H)^{-1} A  and  (I + G H)^{-1} G  via one factorization
        WinvA = jnp.linalg.solve(W, Ak)
        WinvG = jnp.linalg.solve(W, Gk)
        An = Ak @ WinvA
        Gn = Gk + Ak @ WinvG @ Ak.T
        Hn = Hk + Ak.T @ Hk @ WinvA
        return An, Gn, Hn

    _, _, H = jax.lax.fori_loop(0, iters, body, (A, G0, Q))
    return 0.5 * (H + H.T)


def dlqr(A, B, Q, R, iters: int = 30):
    """Discrete LQR gain: K = (R + B'XB)^{-1} B'XA with X the DARE solution.

    Matches the virtual-LQR terminal policy of the reference
    (`/root/reference/src/trajectorySimulate.py:175-177`).
    Returns (K, X).
    """
    X = solve_dare(A, B, Q, R, iters=iters)
    K = jnp.linalg.solve(R + B.T @ X @ B, B.T @ X @ A)
    return K, X


def dlqr_integral(A, B, Q, R, C, iters: int = 30):
    """Discrete LQR with integral action on outputs ``C @ x``.

    python-control's ``dlqr(A, B, Q, R, integral_action=C)`` convention
    (used at `/root/reference/src/trajectorySimulate.py:185-187`): augment

        A_aug = [[A, 0], [C, I]],  B_aug = [[B], [0]]

    (integrator z+ = z + C x), solve the DARE on the augmented system, and
    return the full gain K (nu x (nx+nr)) plus its (Kp, Ki) split.
    """
    dtype = A.dtype
    nx = A.shape[0]
    nu = B.shape[1]
    nr = C.shape[0]
    A_aug = jnp.zeros((nx + nr, nx + nr), dtype=dtype)
    A_aug = A_aug.at[:nx, :nx].set(A)
    A_aug = A_aug.at[nx:, :nx].set(C)
    A_aug = A_aug.at[nx:, nx:].set(jnp.eye(nr, dtype=dtype))
    B_aug = jnp.concatenate([B, jnp.zeros((nr, nu), dtype=dtype)], axis=0)
    K, X = dlqr(A_aug, B_aug, Q, R, iters=iters)
    return K, K[:, :nx], K[:, nx:]


def acker_deadbeat(A, B):
    """Ackermann deadbeat gain: place all closed-loop eigenvalues at zero.

    For desired characteristic polynomial p(s) = s^n the Ackermann formula is
    K = e_n' Ctrb(A,B)^{-1} A^n. This is what the reference computes through
    ``control.acker(A_aug, B_aug, [0,0,0])``
    (`/root/reference/src/trajectorySimulate.py:190-203`); single-input only.
    """
    n = A.shape[0]
    cols = []
    v = B.reshape(n)
    for _ in range(n):
        cols.append(v)
        v = A @ v
    ctrb = jnp.stack(cols, axis=1)
    # p(A) = A^n
    pA = jnp.linalg.matrix_power(A, n)
    en = jnp.zeros((n,), dtype=A.dtype).at[-1].set(1.0)
    K = jnp.linalg.solve(ctrb.T, en) @ pA
    return K.reshape(1, n)


def deadbeat_debris_gains(Ad, Bd):
    """Deadbeat collision-avoidance gains on the pruned (y, ydot) + integrator system.

    Mirrors `/root/reference/src/trajectorySimulate.py:189-203`: prune the
    y-channel (rows/cols [1,3] of Ad, column 1 of Bd), augment with an
    integrator on y, place all eigenvalues at 0, then scatter back:
    K_total (2x4) with K_total[1,1], K_total[1,3] from the pruned gain and
    K_i (2x1) = [0; k_int].
    """
    dtype = Ad.dtype
    Ad_prune = Ad[jnp.array([1, 3])][:, jnp.array([1, 3])]
    Bd_prune = Bd[jnp.array([1, 3]), 1].reshape(2, 1)
    A_aug = jnp.zeros((3, 3), dtype=dtype)
    A_aug = A_aug.at[:2, :2].set(Ad_prune)
    A_aug = A_aug.at[2, 0].set(1.0)
    A_aug = A_aug.at[2, 2].set(1.0)
    B_aug = jnp.concatenate([Bd_prune, jnp.zeros((1, 1), dtype=dtype)], axis=0)
    K_prune = acker_deadbeat(A_aug, B_aug)  # (1, 3)
    K_total = jnp.zeros((2, 4), dtype=dtype)
    K_total = K_total.at[1, 1].set(K_prune[0, 0])
    K_total = K_total.at[1, 3].set(K_prune[0, 1])
    K_i = jnp.stack([jnp.zeros((), dtype=dtype), K_prune[0, 2]]).reshape(2, 1)
    return K_total, K_i
