"""UKF unit tests: the JAX Merwe UKF must match the NumPy filterpy-convention
replica step for step, and converge on the offset-free disturbance estimation
task the reference uses it for (`trajectorySimulate.py:121-130,277-337`)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc_arpo_project_tpu.ops import ukf
from tools.ref_sim import UKFNp, discretize_np


def _observer(T=0.5, n_mean=1.107e-3, sig=(0.75, 0.75)):
    Ad, Bd = discretize_np(n_mean, T, False)
    Ao = np.zeros((6, 6))
    Ao[:4, :4] = Ad
    Ao[4:, 4:] = np.eye(2)
    Ao[0, 4] = 1.0
    Ao[1, 5] = 1.0
    Bou = np.vstack([Bd, np.zeros((2, 2))])
    Qw = np.zeros((6, 6))
    Qw[:4, :4] = 0.001 * np.eye(4)
    Qw[4, 4] = (T * sig[0]) ** 2
    Qw[5, 5] = (T * sig[1]) ** 2
    return Ad, Bd, Ao, Bou, Qw


def test_jax_ukf_matches_numpy_replica():
    Ad, Bd, Ao, Bou, Qw = _observer()
    P0 = np.diag([1e-20, 1e-20, 1e-20, 1e-20, 1.0, 1.0])
    x0 = np.array([100.0, 10.0, 0.0, 0.0, 0.0, 0.0])
    R = np.zeros((2, 2))

    kf_np = UKFNp(Ao, Bou, Qw, R, x0, P0)
    w = ukf.merwe_weights(6, 0.1, 2.0, -1.0)
    st = ukf.UKFState(x=jnp.asarray(x0), P=jnp.asarray(P0))

    rng = np.random.default_rng(3)
    x_true = np.array([100.0, 10.0, 0.0, 0.0])
    d_true = np.array([0.4, -0.2])
    u = np.zeros(2)
    for k in range(30):
        x_true = Ad @ x_true + Bd @ u + np.concatenate([d_true, [0, 0]])
        z = np.array([np.linalg.norm(x_true[:2]), np.arctan2(x_true[1], x_true[0])])
        kf_np.predict(u)
        kf_np.update(z)
        st = ukf.step(st, jnp.asarray(u), jnp.asarray(z), w, jnp.asarray(Ao),
                      jnp.asarray(Bou), jnp.asarray(Qw), jnp.zeros((2, 2)))
        u = rng.uniform(-0.1, 0.1, 2)
    np.testing.assert_allclose(np.asarray(st.x), kf_np.x, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st.P), kf_np.P, rtol=1e-6, atol=1e-10)


def test_ukf_estimates_constant_disturbance():
    """The offset-free augmented UKF must converge to a constant position bias
    — the core mechanism of the disturbance-rejection study (disturbRejComp)."""
    Ad, Bd, Ao, Bou, Qw = _observer()
    P0 = np.diag([1e-20, 1e-20, 1e-20, 1e-20, 1.0, 1.0])
    w = ukf.merwe_weights(6, 0.1, 2.0, -1.0)
    st = ukf.UKFState(
        x=jnp.asarray([100.0, 10.0, 0.0, 0.0, 0.0, 0.0]), P=jnp.asarray(P0)
    )
    x_true = np.array([100.0, 10.0, 0.0, 0.0])
    d_true = np.array([0.5, -0.3])
    u = np.zeros(2)
    for _ in range(120):
        x_true = Ad @ x_true + Bd @ u + np.concatenate([d_true, [0, 0]])
        z = np.array([np.linalg.norm(x_true[:2]), np.arctan2(x_true[1], x_true[0])])
        st = ukf.step(st, jnp.asarray(u), jnp.asarray(z), w, jnp.asarray(Ao),
                      jnp.asarray(Bou), jnp.asarray(Qw), jnp.zeros((2, 2)))
    np.testing.assert_allclose(np.asarray(st.x[4:]), d_true, atol=0.05)
    np.testing.assert_allclose(np.asarray(st.x[:4]), x_true, atol=0.5)


def test_ukf_vmappable():
    Ad, Bd, Ao, Bou, Qw = _observer()
    P0 = jnp.asarray(np.diag([1e-20] * 4 + [1.0, 1.0]))
    w = ukf.merwe_weights(6, 0.1, 2.0, -1.0)
    B = 7
    xs = jnp.tile(jnp.asarray([100.0, 10.0, 0.0, 0.0, 0.0, 0.0]), (B, 1))
    Ps = jnp.tile(P0, (B, 1, 1))
    us = jnp.zeros((B, 2))
    zs = jnp.tile(jnp.asarray([100.5, 0.0997]), (B, 1))
    step = jax.vmap(
        lambda x, P, u, z: ukf.step(
            ukf.UKFState(x, P), u, z, w, jnp.asarray(Ao), jnp.asarray(Bou),
            jnp.asarray(Qw), jnp.zeros((2, 2)),
        )
    )
    out = step(xs, Ps, us, zs)
    assert out.x.shape == (B, 6)
    assert out.P.shape == (B, 6, 6)
    assert np.isfinite(np.asarray(out.x)).all()


def test_steady_state_kf_and_observability():
    """Steady-state KF variant (prototype lineage, misc/MPCrendezvousKALMANONLY)
    on the disturbance-augmented system: the PBH-style observability the
    reference checks in misc/MPCrendezvousKALMANAUG.py:84-97 must hold (the
    augmented pair is observable), and the fixed-gain filter must converge to
    a constant disturbance under linear position measurements."""
    from mpc_arpo_project_tpu.ops import kalman

    Ad, Bd, Ao, Bou, Qw = _observer()
    Co = np.hstack([np.eye(2, 4), np.zeros((2, 2))])
    # observability matrix rank of the augmented pair
    Ob = np.vstack([Co @ np.linalg.matrix_power(Ao, k) for k in range(6)])
    assert np.linalg.matrix_rank(Ob, tol=1e-10) == 6

    V = 1e-4 * np.eye(2)
    L, P = kalman.steady_state_gain(
        jnp.asarray(Ao), jnp.asarray(Co), jnp.asarray(Qw + 1e-9 * np.eye(6)),
        jnp.asarray(V),
    )
    assert np.isfinite(np.asarray(L)).all()

    x_true = np.array([100.0, 10.0, 0.0, 0.0])
    d_true = np.array([0.5, -0.3])
    xh = jnp.asarray(np.concatenate([x_true, [0.0, 0.0]]))
    u = np.zeros(2)
    for _ in range(200):
        x_true = Ad @ x_true + Bd @ u + np.concatenate([d_true, [0, 0]])
        z = x_true[:2]
        xh = kalman.kf_step(xh, jnp.asarray(u), jnp.asarray(z),
                            jnp.asarray(Ao), jnp.asarray(Bou), jnp.asarray(Co),
                            L)
    np.testing.assert_allclose(np.asarray(xh[4:]), d_true, atol=0.02)
