"""Batched ADMM solver unit tests: KKT optimality on the real MPC QP,
iterate-level parity with the pinned-scaling oracle, infeasibility statuses,
and mixed-batch independence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_arpo_project_tpu.config import SimConditions, MPCParams, Debris
from mpc_arpo_project_tpu.ops import admm, constraints
from mpc_arpo_project_tpu.ops.qp_builder import QPDims, build_qp, materialize_A
from tools.osqp_ref import OSQPRef
from tools.ref_sim import discretize_np, synth_gains_np, configure_dynamic_np
from mpc_arpo_project_tpu.config import FailsafeParams


@pytest.fixture(scope="module")
def problem():
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
    sim = SimConditions(
        np.array([100.0, 10.0, 0.0, 0.0]), np.array([2.5, 0.0, 0.0, 0.0]), 2.5,
        10 * np.pi / 180, 1.5, 1.107e-3, 0.5, True, (0.2, 45.0), None, False,
        T_final=150.0,
    )
    fail = FailsafeParams(
        0.005 * np.diag([0.0001, 1, 100000.0, 1.0, 0.01]), 100 * np.eye(2),
        np.eye(1, 4), np.zeros((2, 2)),
    )
    debris = Debris((40.0, 0.0), 5.0, 20.0)
    Ad, Bd = discretize_np(sim.mean_mtn, sim.time_stp, False)
    K, QN, *_ = synth_gains_np(Ad, Bd, mpc, fail)
    dims = QPDims(Nx=mpc.Nx, Nc=mpc.Nc, Nb=mpc.Nb)
    static = build_qp(dims, sim, mpc, Ad, Bd, K, QN)

    xe = np.concatenate([sim.x0, [0.0, 0.0]])
    c1, c2, slope, xmin, xmax = configure_dynamic_np(sim, debris, xe.copy())
    geom = constraints.make_geometry(sim, debris)
    dyn = constraints.configure(geom, jnp.asarray(xe))
    lineq, uineq = constraints.assemble_bounds(
        dyn, jnp.asarray(xe), dims, jnp.asarray(static.umin), jnp.asarray(static.umax),
        geom.is_reject,
    )
    leq = jnp.asarray(static.leq)
    l = np.asarray(jnp.concatenate([leq, lineq]))
    u = np.asarray(jnp.concatenate([leq, uineq]))
    prob = admm.prepare_problem(static, dims, nominal_coeffs=(c1, c2, -slope),
                                dtype=jnp.float64)
    return dict(sim=sim, mpc=mpc, dims=dims, static=static, prob=prob,
                coeffs=(c1, c2, -slope), l=l, u=u)


def _solve_batch(p, l, u, B=3):
    prob = p["prob"]
    c1, c2, s = p["coeffs"]
    coeffs = (jnp.full(B, c1, dtype=jnp.float64), jnp.full(B, c2, dtype=jnp.float64),
              jnp.full(B, s, dtype=jnp.float64))
    lB = jnp.tile(jnp.asarray(l)[None], (B, 1))
    uB = jnp.tile(jnp.asarray(u)[None], (B, 1))
    return admm.admm_solve(prob, coeffs, lB, uB, admm.init_state(prob, B))


def test_matches_pinned_oracle_exactly(problem):
    p = problem
    res = _solve_batch(p, p["l"], p["u"])
    c1, c2, s = p["coeffs"]
    A_np = materialize_A(p["static"], c1, c2, s)
    D = np.asarray(p["prob"].D)
    E = np.asarray(p["prob"].E)
    c = float(p["prob"].c)
    oracle = OSQPRef(p["static"].P, p["static"].q, A_np, p["l"], p["u"],
                     scaling_override=(D, E, c))
    r = oracle.solve()
    assert r.status == "solved"
    assert np.all(np.asarray(res.status) == admm.SOLVED)
    np.testing.assert_allclose(np.asarray(res.x[0]), r.x, atol=1e-9)
    assert int(res.iters) == r.iters


def test_accuracy_mode_control_deviation(problem):
    """The BASELINE acceptance: in accuracy mode, the extracted control must
    be within 1e-4 of an INDEPENDENTLY-equilibrated, tightly-converged,
    polished oracle solve of the same QP. Uses a mid-flight state (the t=0 QP
    is degenerate — its funnel rows are active at equality with zero velocity,
    where first-order methods converge sublinearly; the closed loop only ever
    solves it once)."""
    p = problem
    dims = p["dims"]
    sim = p["sim"]
    xe = jnp.asarray([30.0, 3.0, -0.8, 0.1, 0.1, -0.05])
    geom = constraints.make_geometry(sim, Debris((40.0, 0.0), 5.0, 20.0))
    dyn = constraints.configure(geom, xe)
    lineq, uineq = constraints.assemble_bounds(
        dyn, xe, dims, jnp.asarray(p["static"].umin), jnp.asarray(p["static"].umax),
        geom.is_reject,
    )
    leq = jnp.asarray(p["static"].leq).at[:4].set(-xe[:4])
    l = jnp.concatenate([leq, lineq])
    u = jnp.concatenate([leq, uineq])
    prob = admm.prepare_problem(
        p["static"], dims, nominal_coeffs=(float(dyn.c1), float(dyn.c2), float(dyn.s)),
        dtype=jnp.float64,
    )
    coeffs = (dyn.c1[None], dyn.c2[None], dyn.s[None])
    st = admm.ADMMSettings(eps_abs=1e-5, eps_rel=1e-10, max_iter=10000)
    res = admm.admm_solve(prob, coeffs, l[None], u[None], admm.init_state(prob, 1), st)

    A_np = materialize_A(p["static"], float(dyn.c1), float(dyn.c2), float(dyn.s))
    oracle = OSQPRef(p["static"].P, p["static"].q, A_np, np.asarray(l), np.asarray(u),
                     eps_abs=1e-6, eps_rel=1e-10, max_iter=100000)
    r = oracle.polish(oracle.solve())
    i0 = (dims.Nx + 1) * 4
    dev = np.abs(np.asarray(res.x[0, i0 : i0 + 2]) - r.x[i0 : i0 + 2]).max()
    assert dev < 1e-4, dev
    # and primal feasibility of the full solution
    Ax = A_np @ np.asarray(res.x[0])
    viol = max(np.maximum(Ax - np.asarray(u), 0).max(), np.maximum(np.asarray(l) - Ax, 0).max())
    assert viol < 1e-4


def test_infeasible_detection_and_mixed_batch(problem):
    p = problem
    dims = p["dims"]
    l2 = p["l"].copy()
    for j in range(dims.Nb + 1):
        l2[dims.n_eq + j * 5 + 4] = 1e3  # debris line contradicts the cone
    prob = p["prob"]
    c1, c2, s = p["coeffs"]
    B = 4
    coeffs = (jnp.full(B, c1, dtype=jnp.float64), jnp.full(B, c2, dtype=jnp.float64),
              jnp.full(B, s, dtype=jnp.float64))
    lmix = jnp.stack([jnp.asarray(p["l"]), jnp.asarray(l2),
                      jnp.asarray(p["l"]), jnp.asarray(l2)])
    uB = jnp.tile(jnp.asarray(p["u"])[None], (B, 1))
    res = admm.admm_solve(prob, coeffs, lmix, uB, admm.init_state(prob, B))
    st = np.asarray(res.status)
    assert st[0] == admm.SOLVED and st[2] == admm.SOLVED
    assert st[1] == admm.PRIMAL_INFEASIBLE and st[3] == admm.PRIMAL_INFEASIBLE
    # feasible members must be unperturbed by infeasible neighbors
    res_clean = _solve_batch(p, p["l"], p["u"], B=1)
    np.testing.assert_allclose(np.asarray(res.x[0]), np.asarray(res_clean.x[0]),
                               atol=1e-10)


def test_warm_start_reduces_iterations(problem):
    p = problem
    res1 = _solve_batch(p, p["l"], p["u"])
    # perturb bounds slightly (as a control step would) and re-solve warm
    l2 = p["l"].copy()
    l2[:4] -= 0.01
    u2 = p["u"].copy()
    u2[:4] -= 0.01
    B = 3
    c1, c2, s = p["coeffs"]
    coeffs = (jnp.full(B, c1, dtype=jnp.float64), jnp.full(B, c2, dtype=jnp.float64),
              jnp.full(B, s, dtype=jnp.float64))
    lB = jnp.tile(jnp.asarray(l2)[None], (B, 1))
    uB = jnp.tile(jnp.asarray(u2)[None], (B, 1))
    res_warm = admm.admm_solve(p["prob"], coeffs, lB, uB, res1.state)
    res_cold = admm.admm_solve(p["prob"], coeffs, lB, uB,
                               admm.init_state(p["prob"], B))
    assert int(res_warm.iters) <= int(res_cold.iters)
    assert np.all(np.asarray(res_warm.status) == admm.SOLVED)


def test_active_mask_skips_problems(problem):
    """admm_solve(active=...): inactive problems are frozen (iterates pass
    through, status UNSOLVED) and never drag the batch iteration count."""
    p = problem
    B = 4
    c1, c2, s = p["coeffs"]
    coeffs = (jnp.full(B, c1, dtype=jnp.float64), jnp.full(B, c2, dtype=jnp.float64),
              jnp.full(B, s, dtype=jnp.float64))
    lB = jnp.tile(jnp.asarray(p["l"])[None], (B, 1))
    uB = jnp.tile(jnp.asarray(p["u"])[None], (B, 1))
    st0 = admm.init_state(p["prob"], B)
    active = jnp.array([True, False, True, False])
    res = admm.admm_solve(p["prob"], coeffs, lB, uB, st0, active=active)
    st = np.asarray(res.status)
    assert st[0] == admm.SOLVED and st[2] == admm.SOLVED
    assert st[1] == admm.UNSOLVED and st[3] == admm.UNSOLVED
    # frozen iterates: skipped problems keep their warm-start state
    np.testing.assert_array_equal(np.asarray(res.state.xbar[1]),
                                  np.asarray(st0.xbar[1]))
    np.testing.assert_array_equal(np.asarray(res.state.ybar[3]),
                                  np.asarray(st0.ybar[3]))
    # all-inactive batch: zero chunks executed
    res_none = admm.admm_solve(p["prob"], coeffs, lB, uB, st0,
                               active=jnp.zeros(B, dtype=bool))
    assert int(res_none.iters) == 0
    # active results identical to an unmasked solve
    res_full = admm.admm_solve(p["prob"], coeffs, lB, uB, st0)
    np.testing.assert_allclose(np.asarray(res.x[0]), np.asarray(res_full.x[0]),
                               atol=1e-12)


def test_stall_exit_cuts_plateau(problem):
    """Opt-in stall exit: a problem that makes no residual progress exits
    with MAX_ITER well before the cap; converging problems are untouched."""
    p = problem
    dims = p["dims"]
    # marginally-conflicting debris row: produces the plateau regime (neither
    # converges nor yields a Farkas certificate quickly)
    l2 = p["l"].copy()
    for j in range(dims.Nb + 1):
        l2[dims.n_eq + j * 5 + 4] = 1e3
    u2 = p["u"].copy()
    for j in range(dims.Nb + 1):
        u2[dims.n_eq + j * 5 + 4] = 1e3 + 1e-6  # pin to a near-equality band
    B = 2
    c1, c2, s = p["coeffs"]
    coeffs = (jnp.full(B, c1, dtype=jnp.float64), jnp.full(B, c2, dtype=jnp.float64),
              jnp.full(B, s, dtype=jnp.float64))
    lmix = jnp.stack([jnp.asarray(p["l"]), jnp.asarray(l2)])
    umix = jnp.stack([jnp.asarray(p["u"]), jnp.asarray(u2)])
    st = admm.ADMMSettings(max_iter=4000, stall_exit_chunks=8)
    res = admm.admm_solve(p["prob"], coeffs, lmix, umix,
                          admm.init_state(p["prob"], B, st), st)
    s_arr = np.asarray(res.status)
    assert s_arr[0] == admm.SOLVED
    # the conflicted problem must terminate one way or another well under cap
    assert s_arr[1] in (admm.PRIMAL_INFEASIBLE, admm.MAX_ITER)
    assert int(res.iters) < 4000
    # feasible member's solution unaffected by the stall machinery
    res_ref = _solve_batch(p, p["l"], p["u"], B=1)
    np.testing.assert_allclose(np.asarray(res.x[0]), np.asarray(res_ref.x[0]),
                               atol=1e-10)


def test_status_cross_check_vs_real_osqp(problem):
    """Cross-validate status semantics against the REAL `osqp` package (the
    binary the reference drives via prob.solve()) when it is installed —
    the accumulated-delta infeasibility certificate was applied to both
    in-repo oracles in the same change as the solver, so without this check
    the 'OSQP-faithful' parity is self-referential (ADVICE r1). Skipped
    when osqp is absent from the environment."""
    osqp = pytest.importorskip("osqp")
    import scipy.sparse as sp

    p = problem
    dims = p["dims"]
    static = p["static"]
    c1, c2, s = p["coeffs"]
    A = materialize_A(static, c1, c2, s)

    def real_status(l, u):
        m = osqp.OSQP()
        m.setup(sp.csc_matrix(static.P), static.q, sp.csc_matrix(A),
                l, u, verbose=False)
        return m.solve().info.status

    def ours(l, u):
        lB = jnp.asarray(l)[None]
        uB = jnp.asarray(u)[None]
        coeffs = tuple(jnp.full(1, v, dtype=jnp.float64) for v in (c1, c2, s))
        res = admm.admm_solve(p["prob"], coeffs, lB, uB,
                              admm.init_state(p["prob"], 1))
        return int(res.status[0])

    # feasible fixture
    assert real_status(p["l"], p["u"]).startswith("solved")
    assert ours(p["l"], p["u"]) == admm.SOLVED
    # genuinely primal-infeasible fixture (debris lower bound 1e3)
    l2 = p["l"].copy()
    for j in range(dims.Nb + 1):
        l2[dims.n_eq + j * 5 + 4] = 1e3
    assert "infeasible" in real_status(l2, p["u"])
    assert ours(l2, p["u"]) == admm.PRIMAL_INFEASIBLE
