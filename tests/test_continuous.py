"""Continuous-time nonlinear rollout parity vs the NumPy RK4 oracle
(tools/ref_sim.simulate_continuous), for the acceleration and delta-v input
models, plus an end-to-end approach check."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_arpo_project_tpu.config import SimConditions, MPCParams, FailsafeParams, Noise, Debris
from mpc_arpo_project_tpu.ops import admm
from mpc_arpo_project_tpu.rollout import continuous
from tools.ref_sim import simulate_continuous


def _configs(noisy=False, delta_v=False, T_final=15.0):
    v_ecr = 50000.0 * np.ones(5)
    v_ecr[-2] *= -1
    v_ecr[-1] = 0.0
    mpc = MPCParams(
        8e2 * np.diag([0.2**2, 10**2, 3.8**2, 900.0]),
        1000**2 * np.eye(2),
        5**2 * np.eye(5),
        v_ecr,
        {"Nx": 40, "Nc": 5, "Nb": 5},
        (0.2, 0.2),
    )
    fail = FailsafeParams(
        0.005 * np.diag([0.0001, 1, 100000.0, 1.0, 0.01]),
        100 * np.eye(2),
        np.eye(1, 4),
        np.zeros((2, 2)),
    )
    debris = Debris((40.0, 0.0), 5.0, 20.0)
    noise = Noise((0.0012, 0.0012), 10) if noisy else None
    sim = SimConditions(
        np.array([100.0, 10.0, 0.0, 0.0]),
        np.array([2.5, 0.0, 0.0, 0.0]),
        2.5,
        10 * np.pi / 180,
        1.5,
        1.107e-3,
        0.5,
        True,
        (0.2, 45.0),
        noise,
        False,
        T_cont=1e-3,
        T_final=T_final,
        isDeltaV=delta_v,
    )
    return sim, mpc, fail, debris


@pytest.mark.parametrize("noisy,delta_v", [(False, False), (True, False), (False, True)])
def test_continuous_matches_oracle(noisy, delta_v):
    sim, mpc, fail, debris = _configs(noisy, delta_v)
    settings = admm.ADMMSettings(max_iter=1000)
    engine = continuous.build_engine(sim, mpc, fail, debris, settings=settings,
                                     dtype=jnp.float64)
    rng = np.random.RandomState(11)
    n_total = engine.n_ticks * engine.n_sub
    n_draws = n_total // engine.noise_int_sub + 2
    draws = rng.normal(size=(n_draws, 2))

    out = jax.jit(continuous.rollout, static_argnames=("substep_telemetry",))(
        engine, engine.sig_cont * jnp.asarray(draws)[:, None, :]
    )
    out = jax.tree.map(lambda x: np.asarray(x) if x is not None else None, out)

    D = np.asarray(engine.base.prob.D)
    E = np.asarray(engine.base.prob.E)
    c = float(engine.base.prob.c)
    runo = simulate_continuous(
        sim, mpc, fail, debris, noise_draws=draws,
        solver_kwargs=dict(scaling_override=(D, E, c), max_iter=1000),
    )

    assert int(out.i_term_sub[0]) == runo["i_term_sub"]
    np.testing.assert_array_equal(out.ctrl_seq[:, 0], runo["ctrl_seq"][1:])
    # RK4 is implemented identically on both sides; fp differences stay tiny
    # unless a non-converged solver step amplifies them
    np.testing.assert_allclose(out.x_true_ticks[:, 0, :], runo["x_ticks"], atol=1e-6)
    np.testing.assert_allclose(out.ctrls[:, 0, :], runo["ctrls"], atol=1e-6)
    np.testing.assert_allclose(out.x_est[:, 0, :], runo["x_est"], atol=1e-5)
    assert bool(out.success[0]) == runo["success"]


def test_continuous_full_approach():
    """Full-length noiseless continuous radial approach reaches the platform
    with MPC active throughout (the reference's traj_eval_radialC scenario)."""
    sim, mpc, fail, debris = _configs(False, False, T_final=150.0)
    engine = continuous.build_engine(sim, mpc, fail, debris,
                                     settings=admm.ADMMSettings(max_iter=2000),
                                     dtype=jnp.float64)
    draws = continuous.make_noise_draws(engine, jax.random.key(0), 1)
    out = jax.jit(continuous.rollout, static_argnames=("substep_telemetry",))(
        engine, draws
    )
    assert int(out.i_term_sub[0]) < engine.n_ticks * engine.n_sub
    codes = np.asarray(out.ctrl_seq[:, 0])
    used = codes[codes > 0]
    assert (used == 1).all()
    xt = np.asarray(out.x_true_ticks[:, 0, :2])
    assert np.linalg.norm(xt - np.array([2.5, 0.0]), axis=1).min() < 1.0
