"""QP-builder independence test: the dense assembly must reproduce, entry for
entry, the reference's scipy.sparse construction — re-implemented here
verbatim-style (kron products, `simhelpers.py:142-172` +
`trajectorySimulate.py:216-229`) so a builder bug cannot pass silently through
parity tests that share the builder."""

import numpy as np
import scipy.linalg
from scipy import sparse

from mpc_arpo_project_tpu.config import SimConditions, MPCParams, Debris
from mpc_arpo_project_tpu.ops.qp_builder import QPDims, build_qp, materialize_A
from tools.ref_sim import discretize_np


def _config():
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
        np.array([100.0, 10.0, 0.0, 0.0]),
        np.array([2.5, 0.0, 0.0, 0.0]),
        2.5,
        10 * np.pi / 180,
        1.5,
        1.107e-3,
        0.5,
        True,
        (0.2, 45.0),
        None,
        False,
        T_final=150.0,
    )
    return sim, mpc


def _reference_sparse_construction(sim, mpc, Ad, Bd, K, QN, C):
    """The reference's own sparse assembly, lifted structurally from
    `trajectorySimulate.py:216-229` and `simhelpers.py:109-113,142-172`."""
    nx, nu = 4, 2
    ny, ndi = 5, 2
    Nx, Nc = mpc.Nx, mpc.Nc
    Q, Ru, Rs = mpc.Q_state, mpc.R_input, mpc.R_slack
    Vecr = mpc.V_ecr
    xr = sim.xr
    R = scipy.linalg.block_diag(Ru, Rs)
    P = scipy.linalg.block_diag(
        np.kron(np.eye(Nx), Q), QN, np.kron(np.eye(Nc), R), np.eye(ndi)
    )
    q = np.hstack(
        [np.kron(np.ones(Nx), -Q @ xr), -QN @ xr, np.zeros(Nc * (nu + ny)), np.zeros(ndi)]
    )
    Ads = sparse.csc_matrix(Ad)
    Bds = sparse.csc_matrix(Bd)
    Ax1 = sparse.kron(sparse.eye(Nc + 1), -sparse.eye(nx)) + sparse.kron(
        sparse.eye(Nc + 1, k=-1), Ads
    )
    Ax2 = sparse.kron(sparse.eye(Nx - Nc), -sparse.eye(nx)) + sparse.kron(
        sparse.eye(Nx - Nc, k=-1), (Ads - Bds @ K)
    )
    Ax3 = sparse.block_diag([Ax1, Ax2], format="csr")
    Ax4 = sparse.lil_matrix((Nx + 1, Nx + 1))
    Ax4[Nc + 1, Nc] = 1
    Ax4 = sparse.kron(Ax4.tocsr(), (Ads - Bds @ K))
    Ax = Ax3 + Ax4
    BuI = sparse.vstack(
        [sparse.csc_matrix((1, Nc)), sparse.eye(Nc), sparse.csc_matrix((Nx - Nc, Nc))]
    )
    Bdaug = sparse.hstack([Bds, np.zeros([nx, ny])])
    Bu = sparse.kron(BuI, Bdaug)
    Aeq = sparse.hstack([Ax, Bu])

    D = np.hstack([np.zeros([ny, nu]), np.diag(Vecr)])
    Aineq1 = sparse.kron(sparse.eye(Nx + 1), C)
    Aineq2 = sparse.kron(sparse.eye(Nc), sparse.eye(nu + ny))
    Block12 = sparse.vstack(
        [
            np.kron(np.eye(Nc), D),
            np.kron(np.zeros([(Nx + 1) - Nc, Nc]), np.zeros([ny, nu + ny])),
        ]
    )
    Block21 = sparse.coo_matrix((Nc * (nu + ny), (Nx + 1) * nx))
    AextCol = sparse.vstack(
        [
            np.zeros([nx, ndi]),
            np.kron(np.ones([Nx, 1]), np.vstack([np.eye(ndi), np.zeros([nx - ndi, ndi])])),
            np.kron(np.zeros([(Nx + 1), 1]), np.zeros([ny, ndi])),
            np.kron(np.zeros([(Nc), 1]), np.zeros([nu + ny, ndi])),
        ]
    )
    AextRow = sparse.csc_matrix(
        np.hstack(
            [
                np.kron(np.ones([1, Nx + 1]), np.zeros([ndi, nx])),
                np.kron(np.ones([1, Nc]), np.zeros([ndi, nu + ny])),
                np.eye(ndi),
            ]
        )
    )
    Aineq = sparse.block_array(([Aineq1, Block12], [Block21, Aineq2]))
    A = sparse.vstack([Aeq, Aineq], format="csc")
    A = sparse.hstack([A, AextCol])
    A = sparse.vstack([A, AextRow])
    return P, q, np.asarray(A.todense())


def test_dense_assembly_matches_reference_sparse():
    sim, mpc = _config()
    Ad, Bd = discretize_np(sim.mean_mtn, sim.time_stp, False)
    Q, Ru = mpc.Q_state, mpc.R_input
    S = scipy.linalg.solve_discrete_are(Ad, Bd, Q, Ru)
    K = np.linalg.solve(Ru + Bd.T @ S @ Bd, Bd.T @ S @ Ad)

    dims = QPDims(Nx=mpc.Nx, Nc=mpc.Nc, Nb=mpc.Nb)
    static = build_qp(dims, sim, mpc, Ad, Bd, K, S)

    # a representative dynamic configuration
    c1, c2, s = -1.0, 1.0, 0.3
    A_mine = materialize_A(static, c1, c2, s)

    from mpc_arpo_project_tpu.ops.qp_builder import static_C

    C = static_C(sim, slope0=-s)
    C[3, 2] = c1
    C[3, 3] = c2
    P_ref, q_ref, A_ref = _reference_sparse_construction(sim, mpc, Ad, Bd, K, S, C)

    assert static.P.shape == (dims.nz, dims.nz)
    assert A_mine.shape == (dims.m, dims.nz)
    np.testing.assert_allclose(static.P, P_ref, rtol=0, atol=0)
    np.testing.assert_allclose(static.q, q_ref, rtol=0, atol=0)
    np.testing.assert_allclose(A_mine, A_ref, rtol=0, atol=1e-15)


def test_dims_match_reference_counts():
    # 201 vars / 406 rows at Nx=40, Nc=Nb=5 (SURVEY §2.3)
    dims = QPDims(Nx=40, Nc=5, Nb=5)
    assert dims.nz == 201
    assert dims.m == 406
    # 241 / 496 at the N=50 metric horizon
    dims50 = QPDims(Nx=50, Nc=5, Nb=5)
    assert dims50.nz == 241
    assert dims50.m == 496
