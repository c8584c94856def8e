"""Dynamics/discretization unit tests against SciPy float64 goldens.

The reference discretizes with scipy expm + sympy/quad
(`/root/reference/src/trajectorySimulate.py:100-111`); these tests pin our
augmented-expm discretization and RK4 nonlinear plant against the same
quantities computed with SciPy directly.
"""

import numpy as np
import scipy.linalg
import scipy.integrate
import jax.numpy as jnp

from mpc_arpo_project_tpu.models import cw, nonlinear

N_MEAN = 1.107e-3
T = 0.5


def _scipy_discretize(Ap, Bp, T):
    Ad = scipy.linalg.expm(Ap * T)
    # int_0^T expm(Ap s) ds @ Bp via high-accuracy quadrature per entry
    eAint = np.zeros_like(Ap)
    for i in range(4):
        for j in range(4):
            eAint[i, j] = scipy.integrate.quad(
                lambda s, i=i, j=j: scipy.linalg.expm(Ap * s)[i, j], 0.0, T,
                epsabs=1e-13, epsrel=1e-13,
            )[0]
    return Ad, eAint @ Bp


def test_cw_matrices_match_reference_layout():
    Ap, Bp, Cm = cw.cw_continuous(N_MEAN)
    n = N_MEAN
    Ap_ref = np.array(
        [
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
            [3 * n**2, 0.0, 0.0, 2 * n],
            [0.0, 0.0, -2 * n, 0.0],
        ]
    )
    np.testing.assert_allclose(np.asarray(Ap), Ap_ref, rtol=0, atol=0)
    assert Bp.shape == (4, 2) and Cm.shape == (2, 4)


def test_discretization_matches_scipy_quadrature():
    Ap, Bp, _ = cw.cw_continuous(N_MEAN)
    Ad, Bd = cw.discretize(Ap, Bp, T)
    Ad_ref, Bd_ref = _scipy_discretize(np.asarray(Ap), np.asarray(Bp), T)
    np.testing.assert_allclose(np.asarray(Ad), Ad_ref, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(Bd), Bd_ref, rtol=1e-9, atol=1e-13)


def test_delta_v_input_model():
    Ap, Bp, _ = cw.cw_continuous(N_MEAN)
    Ad, Bd = cw.discretize(Ap, Bp, T, is_delta_v=True)
    Bd_ref = np.asarray(Ad) @ np.vstack([np.zeros((2, 2)), np.eye(2)])
    np.testing.assert_allclose(np.asarray(Bd), Bd_ref, rtol=1e-12, atol=0)


def test_observer_augmentation():
    Ap, Bp, Cm = cw.cw_continuous(N_MEAN)
    Ad, Bd = cw.discretize(Ap, Bp, T)
    Ao, Bou, Co = cw.observer_matrices(Ad, Bd, Cm)
    assert Ao.shape == (6, 6)
    np.testing.assert_allclose(np.asarray(Ao)[:4, :4], np.asarray(Ad))
    assert Ao[0, 4] == 1.0 and Ao[1, 5] == 1.0
    np.testing.assert_allclose(np.asarray(Ao)[4:, 4:], np.eye(2))
    np.testing.assert_allclose(np.asarray(Bou)[:4], np.asarray(Bd))
    np.testing.assert_allclose(np.asarray(Bou)[4:], 0.0)
    np.testing.assert_allclose(np.asarray(Co), np.hstack([np.asarray(Cm), np.zeros((2, 2))]))


def test_rk4_vs_solve_ivp():
    """Fixed-step RK4 at 1 ms matches adaptive RK45 over a 10 s segment."""
    x0 = np.array([100.0, 10.0, 0.0, 0.05])
    u = np.array([0.01, -0.02])
    dt = 1e-3
    steps = 10_000

    x = jnp.asarray(x0)
    for _ in range(0):
        pass
    import jax

    def body(x, _):
        return nonlinear.rk4_step(x, jnp.asarray(u), N_MEAN, dt), None

    xf, _ = jax.lax.scan(body, jnp.asarray(x0), None, length=steps)

    sol = scipy.integrate.solve_ivp(
        lambda t, x: np.asarray(
            nonlinear.two_body_deriv(jnp.asarray(x), jnp.asarray(u), N_MEAN)
        ),
        (0.0, steps * dt),
        x0,
        rtol=1e-10,
        atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(xf), sol.y[:, -1], rtol=1e-8, atol=1e-8)


def test_linear_vs_nonlinear_small_offset():
    """Near the origin the nonlinear plant matches CW linearization
    (the reference validates this in `misc/nonlinear_plant_prototype.py`)."""
    Ap, Bp, _ = cw.cw_continuous(N_MEAN)
    x = np.array([1.0, -2.0, 0.01, 0.02])
    u = np.array([0.0, 0.0])
    dnl = np.asarray(nonlinear.two_body_deriv(jnp.asarray(x), jnp.asarray(u), N_MEAN))
    dlin = np.asarray(Ap) @ x
    np.testing.assert_allclose(dnl, dlin, atol=2e-8)
