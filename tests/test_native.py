"""Native C++ reference-solver tests: must agree with the NumPy oracle
iteration for iteration on the flagship QP, detect infeasibility, and support
the update/warm-start cycle the closed loop uses."""

import numpy as np
import pytest

from mpc_arpo_project_tpu.config import SimConditions, MPCParams, FailsafeParams, Debris
from mpc_arpo_project_tpu.ops.qp_builder import QPDims, build_qp, materialize_A
from tools.ref_sim import discretize_np, synth_gains_np, configure_dynamic_np, bounds_np
from tools import native_solver

pytestmark = pytest.mark.skipif(
    not native_solver.available(), reason="native toolchain unavailable"
)


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
    fail = FailsafeParams(
        0.005 * np.diag([0.0001, 1, 100000.0, 1.0, 0.01]),
        100 * np.eye(2),
        np.eye(1, 4),
        np.zeros((2, 2)),
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
    xe = np.concatenate([sim.x0, [0.0, 0.0]])
    c1, c2, slope, xmin, xmax = configure_dynamic_np(sim, debris, xe.copy())
    lineq, uineq = bounds_np(dims, xmin, xmax, static.umin, static.umax, 1.0, xe[4:6])
    leq = np.concatenate([-sim.x0, np.zeros(dims.Nx * 4)])
    l = np.concatenate([leq, lineq])
    u = np.concatenate([leq, uineq])
    A = materialize_A(static, c1, c2, -slope)
    return dict(static=static, dims=dims, A=A, l=l, u=u)


def test_native_matches_numpy_oracle(problem):
    from tools.osqp_ref import OSQPRef

    p = problem
    nat = native_solver.NativeOSQPRef(p["static"].P, p["static"].q, p["A"], p["l"], p["u"])
    ref = OSQPRef(p["static"].P, p["static"].q, p["A"], p["l"], p["u"])
    rn = nat.solve()
    rr = ref.solve()
    assert rn.status == rr.status == "solved"
    assert rn.iters == rr.iters
    np.testing.assert_allclose(rn.x, rr.x, atol=1e-10)


def test_native_update_and_warm_start(problem):
    p = problem
    nat = native_solver.NativeOSQPRef(p["static"].P, p["static"].q, p["A"], p["l"], p["u"])
    r1 = nat.solve()
    l2 = p["l"].copy()
    u2 = p["u"].copy()
    l2[:4] -= 0.01
    u2[:4] -= 0.01
    nat.update(l=l2, u=u2)
    r2 = nat.solve()  # warm-started internally
    assert r2.status == "solved"
    assert r2.iters <= r1.iters + 200


def test_native_detects_infeasibility(problem):
    p = problem
    dims = p["dims"]
    l2 = p["l"].copy()
    for j in range(dims.Nb + 1):
        l2[dims.n_eq + j * 5 + 4] = 1e3
    nat = native_solver.NativeOSQPRef(p["static"].P, p["static"].q, p["A"], l2, p["u"])
    assert nat.solve().status == "primal infeasible"
