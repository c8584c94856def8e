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


def _in_track_configs(T_final=15.0):
    """In-track variant (reference `test/traj_eval_in_track.py` geometry:
    swap_xy weights, debris at (0, 40), hatch rotated 90 deg) on the
    continuous-time nonlinear plant — the reference has no in-track
    continuous driver, so the oracle twin is the acceptance reference."""
    v_ecr = 50000.0 * np.ones(5)
    v_ecr[-2] *= -1
    v_ecr[-1] = 1e-09
    mpc = MPCParams(
        8e2 * np.diag([0.2**2, 10**2, 3.8**2, 900.0]),
        1000**2 * np.eye(2),
        5**2 * np.diag([1.5, 1.5, 1.0, 1.0, 1e5]),
        v_ecr,
        {"Nx": 40, "Nc": 5, "Nb": 5},
        (0.2, 0.2),
        swap_xy=True,
    )
    fail = FailsafeParams(
        0.005 * np.diag([0.0001, 1, 100000.0, 1.0, 0.01]),
        100 * np.eye(2),
        np.eye(1, 4),
        np.zeros((2, 2)),
    )
    debris = Debris((0.0, 40.0), 5.0, 20.0)
    sim = SimConditions(
        np.array([-10.0, 100.0, 0.0, 0.0]),
        np.array([0.0, 2.5, 0.0, 0.0]),
        2.5,
        10 * np.pi / 180,
        1.5,
        1.107e-3,
        0.5,
        False,
        (0.2, 45.0),
        None,
        True,
        T_cont=1e-3,
        T_final=T_final,
    )
    return sim, mpc, fail, debris


def test_continuous_in_track_matches_oracle():
    """In-track continuous rollout (swap_xy, rotated hatch, in-track
    termination axis) must reproduce the fp64 oracle twin tick-for-tick."""
    sim, mpc, fail, debris = _in_track_configs()
    settings = admm.ADMMSettings(max_iter=1000)
    engine = continuous.build_engine(sim, mpc, fail, debris, settings=settings,
                                     dtype=jnp.float64)
    rng = np.random.RandomState(5)
    n_total = engine.n_ticks * engine.n_sub
    draws = rng.normal(size=(n_total // engine.noise_int_sub + 2, 2))

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
    np.testing.assert_allclose(out.x_true_ticks[:, 0, :], runo["x_ticks"],
                               atol=1e-6)
    np.testing.assert_allclose(out.ctrls[:, 0, :], runo["ctrls"], atol=1e-6)


def test_noise_convention_decision():
    """Documents the noise-convention choice (SURVEY quirk / VERDICT r1 #5).

    The reference draws ``ct.white_noise(..., dt=1e-3)`` — samples with std
    sigma/sqrt(dt) — and adds the HELD draw as a position jump every 1 ms
    substep (`trajectorySimulateC.py:296-307,374`). As written, that is a
    drift of (sigma/sqrt(dt))/dt m/s: ~38 m/s at the reference's own
    sigma=0.0012, i.e. the literal formula is divergent and cannot be what
    produced any sensible trajectory. The framework therefore defaults to
    the Brownian-increment scaling sigma*sqrt(dt) (a consistent
    discretization of continuous process noise) and keeps the literal
    convention available for formula-level comparison. This test pins both:
    the literal convention must reproduce the reference formula's drift
    magnitude, and the brownian default must keep noise at a physically
    sensible scale."""
    sim, mpc, fail, debris = _configs(noisy=True, delta_v=False, T_final=5.0)
    rng = np.random.RandomState(7)

    outs = {}
    for conv in ("brownian", "white_noise_per_dt"):
        engine = continuous.build_engine(
            sim, mpc, fail, debris,
            settings=admm.ADMMSettings(max_iter=500),
            dtype=jnp.float64, noise_convention=conv,
        )
        n_total = engine.n_ticks * engine.n_sub
        draws = rng.normal(size=(n_total // engine.noise_int_sub + 2, 2))
        out = jax.jit(continuous.rollout,
                      static_argnames=("substep_telemetry",))(
            engine, engine.sig_cont * jnp.asarray(draws)[:, None, :]
        )
        outs[conv] = (engine, np.asarray(out.x_true_ticks[:, 0, :]))

    dt_c = float(sim.T_cont)
    sig = sim.noise.noise_std[0]
    # literal convention: per-substep jump std == sigma/sqrt(dt), the
    # reference formula — 1000x the brownian jump at dt=1e-3
    eng_lit, x_lit = outs["white_noise_per_dt"]
    eng_br, x_br = outs["brownian"]
    np.testing.assert_allclose(float(eng_lit.sig_cont), sig / np.sqrt(dt_c))
    np.testing.assert_allclose(float(eng_br.sig_cont), sig * np.sqrt(dt_c))
    # reference-as-written: tens of meters of drift within 5 s even at
    # sigma=0.0012 — the uncontrolled position error dwarfs the approach
    drift_lit = np.abs(x_lit[1:, :2] - x_lit[:1, :2]).max()
    drift_br = np.abs(x_br[1:, :2] - x_br[:1, :2]).max()
    assert drift_lit > 10.0, drift_lit
    # brownian: bounded, same order as the deterministic approach motion
    assert drift_br < 5.0, drift_br


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


def test_continuous_solver_telemetry():
    """ContinuousOut carries per-tick solver-effort telemetry (iters,
    done_iters) with the same semantics as the discrete RolloutOut
    (rollout/discrete.py:95-99), and mc.chunk_stats aggregates it — the
    continuous analogue of the telemetry that drives stall/cap tuning."""
    from mpc_arpo_project_tpu.parallel import mc

    sim, mpc, fail, debris = _configs(False, False, T_final=10.0)
    engine = continuous.build_engine(sim, mpc, fail, debris,
                                     settings=admm.ADMMSettings(max_iter=500),
                                     dtype=jnp.float64)
    B = 2
    draws = continuous.make_noise_draws(engine, jax.random.key(3), B)
    out = jax.jit(continuous.rollout, static_argnames=("substep_telemetry",))(
        engine, draws
    )
    n_ticks = engine.n_ticks - 1  # ticks run j = 1 .. n_ticks-1
    assert out.iters.shape == (n_ticks,)
    assert out.done_iters.shape == (n_ticks, B)
    iters = np.asarray(out.iters)
    done = np.asarray(out.done_iters)
    alive = np.asarray(out.ctrl_seq) > 0
    # every alive tick ran the solver; per-problem effort is bounded by the
    # tick's batch iteration count and zero for dead problems
    assert (iters > 0).all()
    assert (done[alive] >= 1).all()
    assert (done <= iters[:, None]).all()
    assert (done[~alive] == 0).all()

    st = mc.chunk_stats(engine, draws)
    assert int(np.asarray(st.sum_iters)) == int(iters.sum())


def test_continuous_rollout_chunked_matches_rollout():
    """rollout_chunked (host-dispatched seg-tick segments, added for the
    full-scale 300k-substep TPU artifact) must be semantically identical to
    the in-graph rollout — including a remainder segment when seg does not
    divide the tick count."""
    sim, mpc, fail, debris = _configs(True, False, T_final=10.0)
    engine = continuous.build_engine(sim, mpc, fail, debris,
                                     settings=admm.ADMMSettings(max_iter=500),
                                     dtype=jnp.float64)
    B = 2
    draws = continuous.make_noise_draws(engine, jax.random.key(5), B)
    ref = jax.jit(continuous.rollout, static_argnames=("substep_telemetry",))(
        engine, draws
    )
    # n_ticks-1 = 19 ticks; seg=8 leaves a remainder segment of 3
    out = continuous.rollout_chunked(engine, draws, seg=8)
    np.testing.assert_array_equal(np.asarray(ref.ctrl_seq),
                                  np.asarray(out.ctrl_seq))
    np.testing.assert_array_equal(np.asarray(ref.status),
                                  np.asarray(out.status))
    np.testing.assert_array_equal(np.asarray(ref.i_term_sub),
                                  np.asarray(out.i_term_sub))
    np.testing.assert_array_equal(np.asarray(ref.success),
                                  np.asarray(out.success))
    # XLA re-fuses differently when the tick scan is split across segment
    # dispatches: fp64 re-association only (measured max 8e-12)
    np.testing.assert_allclose(np.asarray(ref.x_true_ticks),
                               np.asarray(out.x_true_ticks),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ref.x_est),
                               np.asarray(out.x_est), rtol=0, atol=1e-9)
