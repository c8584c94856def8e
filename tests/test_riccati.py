"""Control-synthesis unit tests against SciPy float64 goldens.

Pins solve_dare / dlqr / dlqr_integral / acker_deadbeat against
scipy.linalg.solve_discrete_are and hand-computed Ackermann, on the exact
system + weights of the reference radial scenario
(`/root/reference/test/traj_eval_radial.py:50-64`).
"""

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from mpc_arpo_project_tpu.models import cw
from mpc_arpo_project_tpu.ops import riccati

N_MEAN = 1.107e-3
T = 0.5


def _system():
    Ap, Bp, _ = cw.cw_continuous(N_MEAN)
    Ad, Bd = cw.discretize(Ap, Bp, T)
    return np.asarray(Ad), np.asarray(Bd)


def test_dare_matches_scipy():
    Ad, Bd = _system()
    Q = 8e2 * np.diag([0.2**2, 10**2, 3.8**2, 900.0])
    R = 1000**2 * np.eye(2)
    X = np.asarray(riccati.solve_dare(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(Q), jnp.asarray(R)))
    X_ref = scipy.linalg.solve_discrete_are(Ad, Bd, Q, R)
    np.testing.assert_allclose(X, X_ref, rtol=1e-9)
    assert np.all(np.linalg.eigvalsh(X) > 0)


def test_dlqr_gain():
    Ad, Bd = _system()
    Q = 8e2 * np.diag([0.2**2, 10**2, 3.8**2, 900.0])
    R = 1000**2 * np.eye(2)
    K, X = riccati.dlqr(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(Q), jnp.asarray(R))
    X_ref = scipy.linalg.solve_discrete_are(Ad, Bd, Q, R)
    K_ref = np.linalg.solve(R + Bd.T @ X_ref @ Bd, Bd.T @ X_ref @ Ad)
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=1e-8)
    # closed loop must be stable
    eig = np.linalg.eigvals(Ad - Bd @ np.asarray(K))
    assert np.all(np.abs(eig) < 1.0)


def test_dlqr_integral_action():
    """Integral-action LQR on the augmented [[A,0],[C,I]] system matches an
    explicit scipy DARE on the same augmentation (python-control convention
    used at `/root/reference/src/trajectorySimulate.py:185-187`)."""
    Ad, Bd = _system()
    Qf = 0.005 * np.diag([0.0001, 1, 100000.0, 1.0, 0.01])
    Rf = 100 * np.diag([1.0, 1.0])
    C = np.eye(1, 4)
    K, Kp, Ki = riccati.dlqr_integral(
        jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(Qf), jnp.asarray(Rf), jnp.asarray(C)
    )
    A_aug = np.block([[Ad, np.zeros((4, 1))], [C, np.eye(1)]])
    B_aug = np.vstack([Bd, np.zeros((1, 2))])
    X_ref = scipy.linalg.solve_discrete_are(A_aug, B_aug, Qf, Rf)
    K_ref = np.linalg.solve(Rf + B_aug.T @ X_ref @ B_aug, B_aug.T @ X_ref @ A_aug)
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(Kp), K_ref[:, :4], rtol=1e-7)
    np.testing.assert_allclose(np.asarray(Ki), K_ref[:, 4:], rtol=1e-7)


def test_acker_deadbeat_places_zeros():
    """Deadbeat gain drives all closed-loop eigenvalues to 0 and A_cl^n = 0
    (nilpotency — the actual deadbeat property, cf. `misc/deadbeatDesign.py`)."""
    Ad, Bd = _system()
    K_total, K_i = riccati.deadbeat_debris_gains(jnp.asarray(Ad), jnp.asarray(Bd))
    K_total = np.asarray(K_total)
    K_i = np.asarray(K_i)
    assert K_total.shape == (2, 4) and K_i.shape == (2, 1)
    # reconstruct the pruned augmented closed loop and verify nilpotency
    Ad_p = Ad[np.ix_([1, 3], [1, 3])]
    Bd_p = Bd[[1, 3], 1].reshape(2, 1)
    A_aug = np.block([[Ad_p, np.zeros((2, 1))], [np.array([[1.0, 0.0]]), np.eye(1)]])
    B_aug = np.vstack([Bd_p, np.zeros((1, 1))])
    K_prune = np.array([[K_total[1, 1], K_total[1, 3], K_i[1, 0]]])
    A_cl = A_aug - B_aug @ K_prune
    np.testing.assert_allclose(np.linalg.matrix_power(A_cl, 3), 0.0, atol=1e-8)
    eig = np.linalg.eigvals(A_cl)
    np.testing.assert_allclose(np.abs(eig), 0.0, atol=1e-4)
