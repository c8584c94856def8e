"""Pallas solve-path tests (interpret mode on CPU): the fused-chunk +
Newton-Schulz path must reproduce the exact Cholesky path, warm-start across
solves, recover from rho jumps / coefficient flips via the safe-inverse
fallback, and detect infeasibility."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_arpo_project_tpu.config import SimConditions, MPCParams, FailsafeParams, Debris
from mpc_arpo_project_tpu.ops import admm, admm_pallas, constraints
from mpc_arpo_project_tpu.ops.qp_builder import QPDims, build_qp
from tools.ref_sim import discretize_np, synth_gains_np


@pytest.fixture(scope="module")
def setup():
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
        0.005 * np.diag([0.0001, 1, 100000.0, 1.0, 0.01]), 100 * np.eye(2),
        np.eye(1, 4), np.zeros((2, 2)),
    )
    sim = SimConditions(
        np.array([100.0, 10.0, 0.0, 0.0]), np.array([2.5, 0.0, 0.0, 0.0]), 2.5,
        10 * np.pi / 180, 1.5, 1.107e-3, 0.5, True, (0.2, 45.0), None, False,
        T_final=150.0,
    )
    debris = Debris((40.0, 0.0), 5.0, 20.0)
    Ad, Bd = discretize_np(sim.mean_mtn, sim.time_stp, False)
    K, QN, *_ = synth_gains_np(Ad, Bd, mpc, fail)
    dims = QPDims(Nx=mpc.Nx, Nc=mpc.Nc, Nb=mpc.Nb)
    static = build_qp(dims, sim, mpc, Ad, Bd, K, QN)
    geom = constraints.make_geometry(sim, debris)
    xe = jnp.asarray(np.concatenate([sim.x0, [0.0, 0.0]]))
    dyn = constraints.configure(geom, xe)
    lineq, uineq = constraints.assemble_bounds(
        dyn, xe, dims, jnp.asarray(static.umin), jnp.asarray(static.umax),
        geom.is_reject,
    )
    leq = jnp.asarray(static.leq)
    l = jnp.concatenate([leq, lineq])
    u = jnp.concatenate([leq, uineq])
    prob = admm.prepare_problem(
        static, dims, nominal_coeffs=(float(dyn.c1), float(dyn.c2), float(dyn.s)),
        dtype=jnp.float64,
    )
    B = 8
    coeffs = (jnp.full(B, dyn.c1), jnp.full(B, dyn.c2), jnp.full(B, dyn.s))
    lB = jnp.tile(l[None], (B, 1))
    uB = jnp.tile(u[None], (B, 1))
    return dict(prob=prob, dims=dims, coeffs=coeffs, l=lB, u=uB, B=B,
                static=static,
                nominal=(float(dyn.c1), float(dyn.c2), float(dyn.s)))


def test_correction_factorization_exact(setup):
    """The compact gather/scatter correction factorization (gsel/scat and
    rsel/gscat with the iota group mask) must reproduce the exact A_k and
    A_k' matvecs of the stacked-AK form for random vectors and coefficient
    signs."""
    p = setup
    prob = p["prob"]
    B = p["B"]
    rng = np.random.RandomState(3)
    c1 = jnp.asarray(rng.choice([-1.0, 1.0], B))
    c2 = jnp.asarray(rng.choice([-1.0, 1.0], B))
    s = jnp.asarray(rng.normal(size=B))
    coeffs = (c1, c2, s)
    nz = prob.Pbar.shape[0]
    m = prob.A0bar.shape[0]
    xv = jnp.asarray(rng.normal(size=(B, nz)))
    wv = jnp.asarray(rng.normal(size=(B, m)))
    # reference: the stacked-AK route used by the chol path
    ax_ref = admm._matvec_A(prob, coeffs, xv)
    atw_ref = admm._matvec_AT(prob, coeffs, wv)
    # compact route, as the kernel computes it
    gw = prob.gsel.shape[1] // 3
    col = np.arange(3 * gw)
    wsel = jnp.where(
        jnp.asarray(col < gw), c1[:, None],
        jnp.where(jnp.asarray(col < 2 * gw), c2[:, None], s[:, None]))
    ax = xv @ prob.A0bar.T + (wsel * (xv @ prob.gsel)) @ prob.scat
    atw = wv @ prob.A0bar + (wsel * (wv @ prob.rsel)) @ prob.gscat
    np.testing.assert_allclose(np.asarray(ax), np.asarray(ax_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(atw), np.asarray(atw_ref), atol=1e-12)


def test_pallas_matches_chol_exactly(setup):
    p = setup
    st_c = admm.ADMMSettings(solve_mode="chol")
    st_p = admm.ADMMSettings(solve_mode="pallas")
    rc = admm.admm_solve(p["prob"], p["coeffs"], p["l"], p["u"],
                         admm.init_state(p["prob"], p["B"], st_c), st_c)
    rp = admm.admm_solve(p["prob"], p["coeffs"], p["l"], p["u"],
                         admm.init_state(p["prob"], p["B"], st_p), st_p)
    assert int(rc.iters) == int(rp.iters)
    np.testing.assert_array_equal(np.asarray(rc.status), np.asarray(rp.status))
    np.testing.assert_allclose(np.asarray(rc.x), np.asarray(rp.x), atol=1e-9)


def test_pallas_warm_start_and_minv_carry(setup):
    p = setup
    st_p = admm.ADMMSettings(solve_mode="pallas")
    r1 = admm.admm_solve(p["prob"], p["coeffs"], p["l"], p["u"],
                         admm.init_state(p["prob"], p["B"], st_p), st_p)
    l2 = p["l"].at[:, :4].add(-0.01)
    u2 = p["u"].at[:, :4].add(-0.01)
    r2 = admm.admm_solve(p["prob"], p["coeffs"], l2, u2, r1.state, st_p)
    assert int(r2.iters) < int(r1.iters)
    assert np.all(np.asarray(r2.status) == admm.SOLVED)


def test_safe_inverse_recovers_from_coefficient_flip(setup):
    """Flipping the funnel signs changes M substantially; the warm NS refresh
    alone would diverge — the residual-checked fallback must cold restart."""
    p = setup
    st_p = admm.ADMMSettings(solve_mode="pallas")
    r1 = admm.admm_solve(p["prob"], p["coeffs"], p["l"], p["u"],
                         admm.init_state(p["prob"], p["B"], st_p), st_p)
    c1, c2, s = p["coeffs"]
    flipped = (-c1, -c2, s)
    r2 = admm.admm_solve(p["prob"], flipped, p["l"], p["u"], r1.state, st_p)
    # must not blow up: statuses decided, solution finite
    assert np.isfinite(np.asarray(r2.x)).all()
    st = np.asarray(r2.status)
    assert ((st == admm.SOLVED) | (st == admm.PRIMAL_INFEASIBLE)
            | (st == admm.MAX_ITER)).all()


def test_pallas_infeasibility(setup):
    p = setup
    dims = p["dims"]
    st_p = admm.ADMMSettings(solve_mode="pallas")
    l3 = np.asarray(p["l"]).copy()
    for j in range(dims.Nb + 1):
        l3[:, dims.n_eq + j * 5 + 4] = 1e3
    r = admm.admm_solve(p["prob"], p["coeffs"], jnp.asarray(l3), p["u"],
                        admm.init_state(p["prob"], p["B"], st_p), st_p)
    assert np.all(np.asarray(r.status) == admm.PRIMAL_INFEASIBLE)


def test_newton_schulz_inverse_quality(setup):
    p = setup
    M = admm._build_M(p["prob"], p["coeffs"], jnp.ones(p["B"]), jnp.float64(1e-6))
    X0 = admm_pallas.cold_start_inverse(M)
    X, res = admm_pallas.newton_schulz_inverse(M, X0, n_iter=45)
    assert float(res.max()) < 1e-10
    I = np.eye(M.shape[1])
    err = np.abs(I - np.asarray(M[0]) @ np.asarray(X[0])).max()
    assert err < 1e-10


def test_pallas_mode_full_rollout_matches_chol():
    """End-to-end closed-loop rollout with solve_mode='pallas' (padded
    problem, Minv carried through the scan, refresh gating) must match the
    chol-mode rollout in every discrete decision and closely in values."""
    import jax
    from mpc_arpo_project_tpu.config import SimConditions, Noise
    from mpc_arpo_project_tpu.rollout import discrete

    v_ecr = 50000.0 * np.ones(5)
    v_ecr[-2] *= -1
    v_ecr[-1] = 0.0
    mpc = MPCParams(
        8e2 * np.diag([0.2**2, 10**2, 3.8**2, 900.0]), 1000**2 * np.eye(2),
        5**2 * np.eye(5), v_ecr, {"Nx": 40, "Nc": 5, "Nb": 5}, (0.2, 0.2),
    )
    fail = FailsafeParams(
        0.005 * np.diag([0.0001, 1, 100000.0, 1.0, 0.01]), 100 * np.eye(2),
        np.eye(1, 4), np.zeros((2, 2)),
    )
    debris = Debris((40.0, 0.0), 5.0, 20.0)
    sim = SimConditions(
        np.array([100.0, 10.0, 0.0, 0.0]), np.array([2.5, 0.0, 0.0, 0.0]), 2.5,
        10 * np.pi / 180, 1.5, 1.107e-3, 0.5, True, (0.2, 45.0),
        Noise((0.3, 0.3), 10), False, T_final=15.0,
    )
    outs = {}
    for mode in ("chol", "pallas"):
        st = admm.ADMMSettings(max_iter=500, solve_mode=mode)
        eng = discrete.build_engine(sim, mpc, fail, debris, settings=st,
                                    dtype=jnp.float64)
        rng = np.random.RandomState(9)
        draws = rng.normal(size=(eng.nsim // eng.noise_rep + 2, 2, 4))
        noise = discrete.noise_sequence_from_draws(eng, draws)
        outs[mode] = jax.tree.map(
            np.asarray, jax.jit(discrete.rollout)(eng, noise)
        )
    a, b = outs["chol"], outs["pallas"]
    # the inverse-based solve is intentionally inexact between refreshes, so
    # solver decisions may flip at solved/max-iter boundaries on noisy steps;
    # assert macro-equivalence (termination, success, trajectory scale) and
    # near-identical controller usage
    np.testing.assert_array_equal(a.i_term, b.i_term)
    np.testing.assert_array_equal(a.success, b.success)
    mismatch = np.mean(a.ctrl_seq != b.ctrl_seq)
    assert mismatch < 0.15, f"controller-code mismatch fraction {mismatch}"
    # a single solver-decision flip on a noisy step shifts the trajectory by
    # a couple of meters on this ~90 m approach; macro scale must agree
    np.testing.assert_allclose(a.x_true, b.x_true, atol=3.0)


def test_ns_fused_masked_refresh(setup):
    """ns_fused: in-kernel M construction must reproduce _build_M's inverse
    (cold start), and rows with need=False must pass through untouched."""
    p = setup
    prob = p["prob"]
    B = p["B"]
    c1, c2, s = p["coeffs"]
    sigma = 1e-6
    rho_scale = jnp.ones(B, dtype=jnp.float64)
    nz = prob.Pbar.shape[0]
    stack = jnp.concatenate(
        [(prob.Pbar + sigma * jnp.eye(nz, dtype=jnp.float64))[None],
         prob.G[None], prob.Fstack], axis=0)
    r = rho_scale
    w = jnp.stack([jnp.ones_like(r), r, r * c1, r * c2, r * c1 * c2,
                   r * s, r * s * s, jnp.zeros_like(r)], axis=1)
    X_prev = jnp.tile(jnp.eye(nz, dtype=jnp.float64)[None], (B, 1, 1))
    need = jnp.arange(B) % 2 == 0  # refresh even rows only
    X, res = admm_pallas.ns_fused(stack, w, X_prev, need, n_iter=45, cold=True)
    M = admm._build_M(prob, p["coeffs"], rho_scale, jnp.float64(sigma))
    I = np.eye(nz)
    # needy rows: true inverse of the structured M
    err = np.abs(I - np.asarray(M[0]) @ np.asarray(X[0])).max()
    assert err < 1e-10
    assert float(np.asarray(res)[0]) < 1e-10
    # non-needy rows: identity passed through, residual reads 0
    np.testing.assert_array_equal(np.asarray(X[1]), I)
    assert float(np.asarray(res)[1]) == 0.0
    # all-skip tile path: nothing computed anywhere
    X2, res2 = admm_pallas.ns_fused(stack, w, X_prev,
                                    jnp.zeros(B, dtype=bool), n_iter=3, cold=False)
    np.testing.assert_array_equal(np.asarray(X2), np.asarray(X_prev))
    assert np.all(np.asarray(res2) == 0.0)


def test_overtime_lane_matches_single_lane(setup):
    """The compacted overtime lane must be exact: a B=16 batch with a mix of
    easy (solved), infeasible, and near-boundary problems solved with
    overtime_div=4 (phase switch at 4 slots) must reproduce the
    single-lane solve's statuses and solutions bit-for-bit up to fp
    tolerance — per-problem math is independent of batch position."""
    p = setup
    dims = p["dims"]
    B = 16
    c1, c2, s = p["coeffs"]
    coeffs = tuple(jnp.tile(v[:1], B) for v in (c1, c2, s))
    l = jnp.tile(p["l"][:1], (B, 1))
    u = jnp.tile(p["u"][:1], (B, 1))
    # make problems 3, 7, 12 primal infeasible (they grind / certify late),
    # and perturb the rest so convergence iterations differ
    l_np = np.asarray(l).copy()
    for j in range(dims.Nb + 1):
        l_np[[3, 7, 12], dims.n_eq + j * 5 + 4] = 1e3
    l_np[1::2, :4] -= 0.005
    l = jnp.asarray(l_np)
    base = admm.ADMMSettings(solve_mode="pallas", pallas_tile=4, max_iter=2000)
    st_one = base._replace(overtime_div=0)
    st_two = base._replace(overtime_div=4)
    r_one = admm.admm_solve(p["prob"], coeffs, l, u,
                            admm.init_state(p["prob"], B, st_one), st_one)
    r_two = admm.admm_solve(p["prob"], coeffs, l, u,
                            admm.init_state(p["prob"], B, st_two), st_two)
    np.testing.assert_array_equal(np.asarray(r_one.status),
                                  np.asarray(r_two.status))
    solved = np.asarray(r_one.status) == admm.SOLVED
    np.testing.assert_allclose(np.asarray(r_one.x)[solved],
                               np.asarray(r_two.x)[solved], atol=1e-9)
    # warm-start state rows must come back unpermuted
    np.testing.assert_allclose(np.asarray(r_one.state.xbar)[solved],
                               np.asarray(r_two.state.xbar)[solved], atol=1e-9)


def test_masked_refresh_recovers_from_warm_overflow(setup):
    """ADVICE r1 (high): a warm NS pass that overflows fp32/fp64 leaves
    non-finite rows; the kernel blend nd*Xf + (1-nd)*x_ref re-NaNs them on the
    cold retry (IEEE 0*inf=NaN), so plain ns_fused never recovers.
    masked_safe_refresh must sanitize bad rows and recover unconditionally."""
    p = setup
    prob = p["prob"]
    B = p["B"]
    c1, c2, s = p["coeffs"]
    sigma = 1e-6
    nz = prob.Pbar.shape[0]
    stack = jnp.concatenate(
        [(prob.Pbar + sigma * jnp.eye(nz, dtype=jnp.float64))[None],
         prob.G[None], prob.Fstack], axis=0)
    r = jnp.ones(B, dtype=jnp.float64)
    w = jnp.stack([jnp.ones_like(r), r, r * c1, r * c2, r * c1 * c2,
                   r * s, r * s * s, jnp.zeros_like(r)], axis=1)
    # poison row 0 with a huge warm start (diverges doubly-exponentially to
    # inf within 3 NS iterations) and row 2 with NaN outright
    M = np.asarray(admm._build_M(prob, p["coeffs"], r, jnp.float64(sigma)))
    X_good = np.linalg.inv(M[0])
    X_prev = np.tile(X_good[None], (B, 1, 1))
    X_prev[0] *= 1e200
    X_prev[2] = np.nan
    X_prev = jnp.asarray(X_prev)
    need = jnp.asarray([True, False, True, False] * (B // 4))

    # precondition: the plain warm+cold ns_fused sequence cannot recover
    Xw, rw = admm_pallas.ns_fused(stack, w, X_prev, need, n_iter=3, cold=False)
    bad = need & ((rw > 1e-2) | ~jnp.isfinite(rw))
    assert bool(bad[0]) and bool(bad[2])
    Xc, _ = admm_pallas.ns_fused(stack, w, Xw, bad, n_iter=45, cold=True)
    assert not np.isfinite(np.asarray(Xc[0])).all()  # the bug being fixed

    # the fix: masked_safe_refresh recovers every row
    X = admm_pallas.masked_safe_refresh(stack, w, X_prev, need,
                                        warm_iters=3, cold_iters=45)
    X = np.asarray(X)
    assert np.isfinite(X).all()
    I = np.eye(nz)
    for row in (0, 2):  # recovered to a true inverse
        assert np.abs(I - M[row] @ X[row]).max() < 1e-8
    np.testing.assert_array_equal(X[1], np.asarray(X_prev[1]))  # passthrough


def test_pallas_solve_recovers_from_poisoned_state(setup):
    """Non-finite warm-start iterates (fp32 overflow in a previous capped
    solve) must be sanitized at solve entry instead of permanently pinning the
    scenario at MAX_ITER."""
    p = setup
    st_p = admm.ADMMSettings(solve_mode="pallas")
    state = admm.init_state(p["prob"], p["B"], st_p)
    r1 = admm.admm_solve(p["prob"], p["coeffs"], p["l"], p["u"], state, st_p)
    assert np.all(np.asarray(r1.status) == admm.SOLVED)
    # poison rows 0 and 3 of the warm-start state as a diverged solve would
    s1 = r1.state
    xb = np.asarray(s1.xbar).copy(); xb[0] = np.nan
    yb = np.asarray(s1.ybar).copy(); yb[3] = np.inf
    mv = np.asarray(s1.minv).copy(); mv[0] = np.nan
    poisoned = s1._replace(xbar=jnp.asarray(xb), ybar=jnp.asarray(yb),
                           minv=jnp.asarray(mv))
    r2 = admm.admm_solve(p["prob"], p["coeffs"], p["l"], p["u"], poisoned, st_p)
    assert np.all(np.asarray(r2.status) == admm.SOLVED)
    assert np.isfinite(np.asarray(r2.x)).all()
    np.testing.assert_allclose(np.asarray(r2.x)[0], np.asarray(r1.x)[0],
                               atol=1e-6)
