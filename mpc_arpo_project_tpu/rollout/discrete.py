"""Discrete-time linear closed-loop rollout as one jitted ``lax.scan`` program.

The TPU-native replacement for the reference's serial Python loop
`trajectorySimulate` (`/root/reference/src/trajectorySimulate.py:17-388`):
one scan step = {batched ADMM QP solve -> in-graph failsafe switching ->
saturation -> plant step -> UKF -> dynamic constraint rebuild}, carried over a
whole scenario batch. Early termination becomes an ``alive`` mask (the
reference ``break`` at `:288-293`); all telemetry is emitted as stacked
fixed-shape arrays.

Reference quirks reproduced bit-for-bit (verified against tools/ref_sim.py):
  * one-step input delay — the plant propagates with the previous step's
    control (`:322-325`);
  * sequential 2-norm saturation that recomputes the norm after scaling the
    first component (`:317-319`);
  * the failsafe controllers read the *stored* estimate, which for in-track
    runs was x/y-swapped in place by the constraint reconfiguration of the
    previous step (`simhelpers.py:72`);
  * shared failsafe integrator state reset on MPC success (`:303-313`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from mpc_arpo_project_tpu.config import SimConditions, MPCParams, FailsafeParams, Debris
from mpc_arpo_project_tpu.models import cw
from mpc_arpo_project_tpu.ops import admm, constraints, riccati, ukf
from mpc_arpo_project_tpu.ops.qp_builder import QPDims, build_qp


@flax.struct.dataclass
class DiscreteEngine:
    """Compiled, device-resident engine for one scenario family.

    A pytree: shape/branch-affecting config fields are static aux data
    (``pytree_node=False``), everything else is arrays — so engines cross jit
    boundaries without static_argnames bookkeeping and can be sharded.
    """

    # static aux data (hashable)
    dims: QPDims = flax.struct.field(pytree_node=False)
    in_track: bool = flax.struct.field(pytree_node=False)
    has_noise: bool = flax.struct.field(pytree_node=False)
    nsim: int = flax.struct.field(pytree_node=False)
    settings: admm.ADMMSettings = flax.struct.field(pytree_node=False)
    # dynamics & gains
    Ad: jnp.ndarray
    Bd: jnp.ndarray
    Kpf: jnp.ndarray
    Kif: jnp.ndarray
    K_total: jnp.ndarray
    K_i: jnp.ndarray
    Crefx: jnp.ndarray
    # observer
    Ao: jnp.ndarray
    Bou: jnp.ndarray
    Qw: jnp.ndarray
    R_meas: jnp.ndarray
    ukf_w: ukf.MerweWeights
    # QP
    prob: admm.ADMMProblem
    leq0: jnp.ndarray  # (n_eq,) template
    umin: jnp.ndarray
    umax: jnp.ndarray
    # geometry / scenario scalars
    geom: constraints.ConstraintGeom
    x0: jnp.ndarray  # (4,)
    xr: jnp.ndarray  # (4,)
    rp: jnp.ndarray
    rtol: jnp.ndarray
    sig_diag: jnp.ndarray  # (4,) noise sigma diagonal
    noise_rep: int = flax.struct.field(pytree_node=False)
    dist_tol: jnp.ndarray
    ang_tol: jnp.ndarray
    debris_center: jnp.ndarray  # (2,) ORIGINAL (unswapped) center for failsafe test
    debris_half: jnp.ndarray
    # estimator selection: 'ukf' (production, range/bearing measurement) or
    # 'kf' (steady-state Kalman filter with linear position measurement — the
    # `misc/MPCrendezvousKALMANONLY.py:62-89` analogue on the augmented
    # offset-free observer; cheapest estimator in the family)
    estimator: str = flax.struct.field(pytree_node=False, default="ukf")
    Co: Optional[jnp.ndarray] = None  # (2, 6) linear measurement (kf only)
    L_kf: Optional[jnp.ndarray] = None  # (6, 2) steady-state gain (kf only)


class RolloutOut(NamedTuple):
    """Stacked telemetry, shapes (T+1, B, ...) unless noted; index 0 holds the
    initial condition so column layouts match the reference's SimRun arrays."""

    x_true: jnp.ndarray  # (T+1, B, 4)
    x_est: jnp.ndarray  # (T+1, B, 6) — stored (possibly swapped) estimates
    ctrls: jnp.ndarray  # (T+1, B, 2)
    noise: jnp.ndarray  # (T+1, B, 4)
    ctrl_seq: jnp.ndarray  # (T, B) int32 codes 0/1/2/3
    status: jnp.ndarray  # (T, B) solver statuses
    iters: jnp.ndarray  # (T,) ADMM iterations per step (batch max)
    i_term: jnp.ndarray  # (B,) termination step (== nsim if none)
    success: jnp.ndarray  # (B,) bool
    final_rho: jnp.ndarray  # (B,)
    done_iters: jnp.ndarray  # (T, B) per-problem iterations to finish
    # residual / tolerance ratios at solver exit (<=1 converged, ~1-3 a
    # plateau just above tolerance, >>1 unconverged; raw residual where the
    # solve path does not report its tolerance denominator)
    pri_res: jnp.ndarray  # (T, B)
    dua_res: jnp.ndarray  # (T, B)


def build_engine(
    sim: SimConditions,
    mpc: MPCParams,
    fail: FailsafeParams,
    debris: Optional[Debris],
    settings: admm.ADMMSettings = admm.ADMMSettings(),
    dtype=jnp.float32,
    synthesis: str = "scipy",
    estimator: str = "ukf",
) -> DiscreteEngine:
    """Host-side engine construction (once per scenario family).

    Synthesis runs in float64 precision and is cast to ``dtype`` so fp32
    rollouts use fp64-accurate gains (the reference synthesizes in float64
    throughout). ``synthesis`` selects the backend: 'scipy' (LAPACK DARE /
    acker via tools/ref_sim, the default) or 'jax' (the in-graph structured-
    doubling DARE + Ackermann of ``ops.riccati`` on the CPU backend — the
    jittable/vmappable path promised by SURVEY §5.6; pinned against the scipy
    goldens in tests/test_riccati.py)."""
    T = sim.time_stp
    dims = QPDims(Nx=mpc.Nx, Nc=mpc.Nc, Nb=mpc.Nb)

    # float64 synthesis on host
    from tools import ref_sim as _synth  # NumPy/SciPy float64 path

    Ad, Bd = _synth.discretize_np(sim.mean_mtn, T, sim.isDeltaV)
    if synthesis == "jax":
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            f64 = jnp.float64  # honored when jax_enable_x64 is on
            Adj, Bdj = jnp.asarray(Ad, f64), jnp.asarray(Bd, f64)
            Kj, QNj = riccati.dlqr(Adj, Bdj, jnp.asarray(mpc.Q_state, f64),
                                   jnp.asarray(mpc.R_input, f64))
            _, Kpfj, Kifj = riccati.dlqr_integral(
                Adj, Bdj, jnp.asarray(fail.Q_fail, f64),
                jnp.asarray(fail.R_fail, f64), jnp.asarray(fail.C_int, f64))
            Ktj, Kij = riccati.deadbeat_debris_gains(Adj, Bdj)
        K, QN, Kpf, Kif, K_total, K_i = (
            np.asarray(v) for v in (Kj, QNj, Kpfj, Kifj, Ktj, Kij))
    else:
        K, QN, Kpf, Kif, K_total, K_i = _synth.synth_gains_np(Ad, Bd, mpc, fail)
    static = build_qp(dims, sim, mpc, Ad, Bd, K, QN)
    # Equilibrate on the INITIAL constraint matrix, exactly as the reference's
    # OSQP setup does (scaling is computed once, at setup, with the initial A;
    # `trajectorySimulate.py:234,245` — prob.update never re-equilibrates).
    c1_0, c2_0, s0, _, _ = _synth.configure_dynamic_np(
        sim, debris, np.concatenate([sim.x0, [0.0, 0.0]])
    )
    prob = admm.prepare_problem(
        static, dims, settings, nominal_coeffs=(c1_0, c2_0, -s0), dtype=dtype,
        # MXU-aligned padding for the Pallas kernels (see prepare_problem)
        pad=(settings.solve_mode in ("pallas", "eig")),
    )

    Ao = np.zeros((6, 6))
    Ao[:4, :4] = Ad
    Ao[4:, 4:] = np.eye(2)
    Ao[0, 4] = 1.0
    Ao[1, 5] = 1.0
    Bou = np.vstack([Bd, np.zeros((2, 2))])

    if sim.noise is not None:
        sig = np.array([sim.noise.noise_std[0], sim.noise.noise_std[1], 0.0, 0.0])
        noise_rep = int(sim.noise.noise_length)
        has_noise = True
    else:
        sig = np.zeros(4)
        noise_rep = 1
        has_noise = False
    Qw = np.zeros((6, 6))
    Qw[:4, :4] = 0.001 * np.eye(4)
    Qw[4, 4] = (T * sig[0]) ** 2
    Qw[5, 5] = (T * sig[1]) ** 2

    if estimator == "kf":
        from mpc_arpo_project_tpu.ops import kalman

        Co = np.hstack([np.eye(2, 4), np.zeros((2, 2))])
        L_kf, _ = kalman.steady_state_gain_np(
            Ao, Co, Qw + 1e-9 * np.eye(6), 1e-4 * np.eye(2))
    elif estimator == "ukf":
        Co = L_kf = None
    else:
        raise ValueError(f"unknown estimator {estimator!r}")

    geom = constraints.make_geometry(sim, debris, dtype=dtype)
    if debris is not None:
        d_center = np.asarray(debris.center, dtype=np.float64)
        d_half = debris.side_length / 2.0
    else:
        d_center = np.array([-np.inf, -np.inf])
        d_half = 0.0

    as_dt = lambda x: jnp.asarray(x, dtype=dtype)
    return DiscreteEngine(
        dims=dims,
        in_track=bool(sim.inTrack),
        has_noise=has_noise,
        nsim=sim.nsim,
        settings=settings,
        Ad=as_dt(Ad),
        Bd=as_dt(Bd),
        Kpf=as_dt(Kpf),
        Kif=as_dt(Kif),
        K_total=as_dt(K_total),
        K_i=as_dt(K_i),
        Crefx=as_dt(fail.C_int),
        Ao=as_dt(Ao),
        Bou=as_dt(Bou),
        Qw=as_dt(Qw),
        R_meas=as_dt(np.zeros((2, 2))),
        ukf_w=ukf.merwe_weights(6, 0.1, 2.0, -1.0, dtype=dtype),
        prob=prob,
        leq0=as_dt(static.leq),
        umin=as_dt(static.umin),
        umax=as_dt(static.umax),
        geom=geom,
        x0=as_dt(sim.x0),
        xr=as_dt(sim.xr),
        rp=as_dt(sim.r_p),
        rtol=as_dt(sim.r_tol),
        sig_diag=as_dt(sig),
        noise_rep=noise_rep,
        dist_tol=as_dt(sim.suc_cond[0]),
        ang_tol=as_dt(sim.suc_cond[1]),
        debris_center=as_dt(d_center),
        debris_half=as_dt(d_half),
        estimator=estimator,
        Co=None if Co is None else as_dt(Co),
        L_kf=None if L_kf is None else as_dt(L_kf),
    )


def make_noise_sequence(engine: DiscreteEngine, key, batch: int) -> jnp.ndarray:
    """(T, B, 4) held-noise sequence: one standard-normal draw per hold
    interval, scaled by the sigma diagonal (`trajectorySimulate.py:268,351-356`)."""
    n_draws = engine.nsim // engine.noise_rep + 2
    draws = jax.random.normal(key, (n_draws, batch, 4), dtype=engine.sig_diag.dtype)
    scaled = draws * engine.sig_diag[None, None, :]
    idx = jnp.arange(engine.nsim) // engine.noise_rep
    return scaled[idx]


def make_noise_sequence_multi(
    engine: DiscreteEngine, key, hold_lengths: np.ndarray
) -> jnp.ndarray:
    """(T, B, 4) held-noise sequence with a PER-SCENARIO hold length.

    The reference's noise hold-length (`Noise.noise_length`,
    `trajectorySimulate.py:351-356`) only shapes the noise *data*, not the
    program — so a sweep over hold lengths (`test/disturbRejComp.py:77-88`)
    can run as ONE batch under one compiled rollout instead of one engine
    rebuild per length. ``hold_lengths``: (B,) ints.
    """
    hold = np.asarray(hold_lengths, dtype=np.int64)
    B = hold.shape[0]
    n_draws = int(engine.nsim // max(int(hold.min()), 1) + 2)
    draws = jax.random.normal(key, (n_draws, B, 4), dtype=engine.sig_diag.dtype)
    scaled = draws * engine.sig_diag[None, None, :]
    idx = jnp.arange(engine.nsim)[:, None] // jnp.asarray(hold)[None, :]  # (T, B)
    return jnp.take_along_axis(scaled, idx[:, :, None], axis=0)


def noise_sequence_from_draws(engine: DiscreteEngine, draws: np.ndarray) -> jnp.ndarray:
    """Build the (T, B, 4) sequence from explicit standard-normal draws
    (n_draws, B, 4) — used by parity tests to feed the oracle's exact noise."""
    scaled = jnp.asarray(draws, dtype=engine.sig_diag.dtype) * engine.sig_diag[None, None, :]
    idx = jnp.arange(engine.nsim) // engine.noise_rep
    return scaled[idx]


class _Carry(NamedTuple):
    x_true: jnp.ndarray  # (B, 4)
    xest: jnp.ndarray  # (B, 6) fresh (unswapped) estimate
    xest_stored: jnp.ndarray  # (B, 6) telemetry/failsafe view (swapped for in-track)
    P: jnp.ndarray  # (B, 6, 6)
    xintf: jnp.ndarray  # (B,) failsafe integrator
    prev_u: jnp.ndarray  # (B, 2) control applied to the plant this step
    l: jnp.ndarray  # (B, m)
    u: jnp.ndarray  # (B, m)
    c1: jnp.ndarray  # (B,)
    c2: jnp.ndarray
    s: jnp.ndarray
    admm_state: admm.ADMMState
    alive: jnp.ndarray  # (B,) bool
    i_term: jnp.ndarray  # (B,) int32
    succ: jnp.ndarray  # (B,) bool — incremental success scan


def _init_carry(
    engine: DiscreteEngine, batch: int, x0b: jnp.ndarray,
    is_reject_b: Optional[jnp.ndarray] = None,
) -> _Carry:
    dims = engine.dims
    dt = engine.Ad.dtype
    if is_reject_b is None:
        is_reject_b = jnp.broadcast_to(engine.geom.is_reject, (batch,))
    xest0 = jnp.concatenate([x0b, jnp.zeros((batch, 2), dtype=dt)], axis=1)
    P0 = jnp.zeros((6, 6), dtype=dt).at[:4, :4].set(1e-20 * jnp.eye(4, dtype=dt))
    P0 = P0.at[4:, 4:].set(jnp.eye(2, dtype=dt))
    P0 = jnp.broadcast_to(P0, (batch, 6, 6))

    # initial constraint configuration (`trajectorySimulate.py:234`) — on a
    # temp copy, so the in-track swap does not leak into the stored estimate
    dyn = jax.vmap(lambda e: constraints.configure(engine.geom, e))(xest0)
    lineq, uineq = jax.vmap(
        lambda d, e, r: constraints.assemble_bounds(
            d, e, dims, engine.umin, engine.umax, r
        )
    )(dyn, xest0, is_reject_b)
    leq = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros(4, dtype=dt), engine.leq0[4:]]), (batch, dims.n_eq)
    )
    leq = leq.at[:, :4].set(-x0b)
    l = jnp.concatenate([leq, lineq], axis=1)
    u = jnp.concatenate([leq, uineq], axis=1)

    return _Carry(
        x_true=x0b,
        xest=xest0,
        xest_stored=xest0,
        P=P0,
        xintf=jnp.zeros((batch,), dtype=dt),
        prev_u=jnp.zeros((batch, 2), dtype=dt),
        l=l,
        u=u,
        c1=dyn.c1,
        c2=dyn.c2,
        s=dyn.s,
        admm_state=admm.init_state(engine.prob, batch, engine.settings),
        alive=jnp.ones((batch,), dtype=bool),
        i_term=jnp.full((batch,), engine.nsim, dtype=jnp.int32),
        succ=jnp.zeros((batch,), dtype=bool),
    )


def _step(engine: DiscreteEngine, carry: _Carry, step_in,
          is_reject_b: Optional[jnp.ndarray] = None):
    i, noise_i = step_in
    if is_reject_b is None:
        is_reject_b = jnp.broadcast_to(
            engine.geom.is_reject, carry.x_true.shape[:1]
        )
    dims = engine.dims
    dt = engine.Ad.dtype
    B = carry.x_true.shape[0]

    # --- termination (`trajectorySimulate.py:288-293`)
    pos_norm = jnp.linalg.norm(carry.x_true[:, :2], axis=1)
    back = jnp.where(
        jnp.asarray(engine.in_track), carry.x_true[:, 1], carry.x_true[:, 0]
    )
    term_now = (pos_norm < engine.rp) | (back < engine.rp - engine.rtol)
    newly_dead = carry.alive & term_now
    alive = carry.alive & ~term_now
    i_term = jnp.where(newly_dead, i, carry.i_term)

    # incremental success scan (`trajectorySimulate.py:370-376`): candidate
    # states are x_k for 1 <= k < i_term; x_i is a candidate exactly when the
    # scenario is still alive after this step's termination check
    dist_k = jnp.linalg.norm(carry.x_true[:, :2] - engine.xr[:2][None, :], axis=1)
    ang_k = jnp.abs(jnp.arctan(carry.x_true[:, 3] / carry.x_true[:, 2])) * (
        180.0 / jnp.pi
    )
    ok_k = (dist_k <= engine.dist_tol) & (ang_k <= engine.ang_tol)
    succ = carry.succ | (alive & (i >= 1) & ok_k)

    # --- QP solve (warm-started); dead scenarios are skipped inside the
    # solver (batch iteration count is a max over problems — see admm_solve)
    res = admm.admm_solve(
        engine.prob,
        (carry.c1, carry.c2, carry.s),
        carry.l,
        carry.u,
        carry.admm_state,
        engine.settings,
        active=alive,
    )
    solved = res.status == admm.SOLVED

    # --- controller hierarchy (`trajectorySimulate.py:299-314`)
    i0u = (dims.Nx + 1) * dims.nx
    u_mpc = res.x[:, i0u : i0u + 2]

    e = carry.xest_stored  # swapped view for in-track (see module docstring)
    cx, cy = engine.debris_center[0], engine.debris_center[1]
    h = engine.debris_half
    in_box = (
        (e[:, 0] - (cx + h) < 0)
        & (e[:, 0] - (cx - h) > 0)
        & (e[:, 1] < cy + h)
        & (e[:, 1] > cy - h)
    )
    # deadbeat debris avoidance
    xintf_db = carry.xintf + e[:, 1] - (cy + h)
    u_db = -(e[:, :4] @ engine.K_total.T) - xintf_db[:, None] * engine.K_i[:, 0][None, :]
    # LQR failsafe homing
    xintf_fs = carry.xintf + (e[:, :4] @ engine.Crefx[0]) - engine.xr[0]
    u_fs = -(e[:, :4] @ engine.Kpf.T) - xintf_fs[:, None] * engine.Kif[:, 0][None, :]

    u_fail = jnp.where(in_box[:, None], u_db, u_fs)
    xintf_new = jnp.where(solved, 0.0, jnp.where(in_box, xintf_db, xintf_fs))
    ctrl = jnp.where(solved[:, None], u_mpc, u_fail)
    code = jnp.where(
        solved, admm.SOLVED, jnp.where(in_box, 3, 2)
    ).astype(jnp.int32)

    # --- sequential saturation quirk (`trajectorySimulate.py:317-319`)
    umax0 = engine.umax[0]
    n1 = jnp.linalg.norm(ctrl, axis=1)
    over = n1 > umax0
    c0 = jnp.where(over, ctrl[:, 0] * umax0 / n1, ctrl[:, 0])
    n2 = jnp.sqrt(c0**2 + ctrl[:, 1] ** 2)
    c1_ = jnp.where(over, ctrl[:, 1] * umax0 / n2, ctrl[:, 1])
    ctrl = jnp.stack([c0, c1_], axis=1)

    # --- plant step with the PREVIOUS control (`:322-325`)
    x_next = carry.x_true @ engine.Ad.T + carry.prev_u @ engine.Bd.T + noise_i

    # --- estimation (`:329-337`)
    if engine.has_noise and engine.estimator == "kf":
        # steady-state KF variant: linear position measurement + fixed gain
        # (the `misc/MPCrendezvousKALMANONLY.py:74-89` analogue); covariance
        # is static by construction
        from mpc_arpo_project_tpu.ops import kalman

        xest_next = jax.vmap(
            lambda x, uu, zz: kalman.kf_step(
                x, uu, zz, engine.Ao, engine.Bou, engine.Co, engine.L_kf
            )
        )(carry.xest, carry.prev_u, x_next[:, :2])
        P_next = carry.P
    elif engine.has_noise:
        z = jnp.stack(
            [
                jnp.linalg.norm(x_next[:, :2], axis=1),
                jnp.arctan2(x_next[:, 1], x_next[:, 0]),
            ],
            axis=1,
        )

        def kf_step(x, P, uu, zz):
            st = ukf.step(
                ukf.UKFState(x=x, P=P),
                uu,
                zz,
                engine.ukf_w,
                engine.Ao,
                engine.Bou,
                engine.Qw,
                engine.R_meas,
            )
            return st.x, st.P

        xest_next, P_next = jax.vmap(kf_step)(carry.xest, carry.P, carry.prev_u, z)
    else:
        xest_next = jnp.concatenate([x_next, jnp.zeros((B, 2), dtype=dt)], axis=1)
        P_next = carry.P

    # --- bound + constraint updates (`:340-348`)
    dyn = jax.vmap(lambda ee: constraints.configure(engine.geom, ee))(xest_next)
    lineq, uineq = jax.vmap(
        lambda d, ee, r: constraints.assemble_bounds(
            d, ee, dims, engine.umin, engine.umax, r
        )
    )(dyn, xest_next, is_reject_b)
    l_new = carry.l.at[:, :4].set(-xest_next[:, :4])
    u_new = carry.u.at[:, :4].set(-xest_next[:, :4])
    l_new = l_new.at[:, dims.n_eq :].set(lineq)
    u_new = u_new.at[:, dims.n_eq :].set(uineq)

    # --- freeze dead scenarios
    def keep(new, old):
        mask = alive.reshape((B,) + (1,) * (new.ndim - 1))
        return jnp.where(mask, new, old)

    new_carry = _Carry(
        x_true=keep(x_next, carry.x_true),
        xest=keep(xest_next, carry.xest),
        xest_stored=keep(dyn.xest_stored, carry.xest_stored),
        P=keep(P_next, carry.P),
        xintf=keep(xintf_new, carry.xintf),
        prev_u=keep(ctrl, carry.prev_u),
        l=keep(l_new, carry.l),
        u=keep(u_new, carry.u),
        c1=keep(dyn.c1, carry.c1),
        c2=keep(dyn.c2, carry.c2),
        s=keep(dyn.s, carry.s),
        admm_state=admm.ADMMState(
            xbar=keep(res.state.xbar, carry.admm_state.xbar),
            ybar=keep(res.state.ybar, carry.admm_state.ybar),
            zbar=keep(res.state.zbar, carry.admm_state.zbar),
            rho_scale=keep(res.state.rho_scale, carry.admm_state.rho_scale),
            minv=keep(res.state.minv, carry.admm_state.minv),
            minv_ok=res.state.minv_ok,
            ref_coef=keep(res.state.ref_coef, carry.admm_state.ref_coef),
        ),
        alive=alive,
        i_term=i_term,
        succ=succ,
    )
    out = (
        keep(x_next, carry.x_true),
        keep(dyn.xest_stored, carry.xest_stored),
        keep(ctrl, jnp.zeros_like(ctrl)),
        noise_i,
        jnp.where(alive, code, 0),
        jnp.where(alive, res.status, -1),
        res.iters,
        jnp.where(alive, res.done_iters, 0),
        # res/tol RATIO when the solver reports a usable tolerance
        # (converged <= 1); raw residual fallback otherwise. Guard against
        # non-finite tols: inf/inf = NaN poisoned the round-3 diagnostics.
        jnp.where(alive,
                  jnp.where((res.pri_tol > 0) & jnp.isfinite(res.pri_tol),
                            res.pri_res / res.pri_tol, res.pri_res),
                  0.0),
        jnp.where(alive,
                  jnp.where((res.dua_tol > 0) & jnp.isfinite(res.dua_tol),
                            res.dua_res / res.dua_tol, res.dua_res),
                  0.0),
    )
    return new_carry, out


def rollout(
    engine: DiscreteEngine,
    noise_seq: jnp.ndarray,
    x0b: Optional[jnp.ndarray] = None,
    is_reject_b: Optional[jnp.ndarray] = None,
) -> RolloutOut:
    """Run the full closed loop for a scenario batch.

    Args:
        noise_seq: (T, B, 4) pre-scaled noise sequence (see
            ``make_noise_sequence``; zeros for noiseless runs).
        x0b: optional (B, 4) initial states; defaults to the engine's x0.
        is_reject_b: optional (B,) per-scenario offset-free switch (0./1.) —
            overrides the engine's scalar, so reject / no-reject study arms
            (`test/disturbRejComp.py:87-88`) share one compiled program.
    """
    T, B = noise_seq.shape[0], noise_seq.shape[1]
    assert T == engine.nsim
    if x0b is None:
        x0b = jnp.broadcast_to(engine.x0, (B, 4))
    # full-precision matmuls throughout (TPU MXU defaults to bf16 multiplies,
    # which breaks solver convergence and estimator accuracy in fp32)
    with jax.default_matmul_precision("highest"):
        carry0 = _init_carry(engine, B, x0b, is_reject_b)
        steps = (jnp.arange(T, dtype=jnp.int32), noise_seq)
        carry, outs = jax.lax.scan(
            lambda c, x: _step(engine, c, x, is_reject_b), carry0, steps
        )
    (x_true_s, xest_s, ctrl_s, noise_s, code_s, status_s, iters_s,
     done_iters_s, rp_s, rd_s) = outs

    # prepend initial column (reference stores initial conditions at index 0)
    x_true = jnp.concatenate([x0b[None], x_true_s], axis=0)
    xest0 = jnp.concatenate([x0b, jnp.zeros((B, 2), dtype=x0b.dtype)], axis=1)
    x_est = jnp.concatenate([xest0[None], xest_s], axis=0)
    ctrls = jnp.concatenate([jnp.zeros((1, B, 2), dtype=x0b.dtype), ctrl_s], axis=0)
    noise = jnp.concatenate([noise_seq[:1], noise_s], axis=0)

    return RolloutOut(
        x_true=x_true,
        x_est=x_est,
        ctrls=ctrls,
        noise=noise,
        ctrl_seq=code_s,
        status=status_s,
        iters=iters_s,
        i_term=carry.i_term,
        success=carry.succ,
        final_rho=carry.admm_state.rho_scale,
        done_iters=done_iters_s,
        pri_res=rp_s,
        dua_res=rd_s,
    )


def rollout_chunked(
    engine: DiscreteEngine,
    noise_seq: jnp.ndarray,
    x0b: Optional[jnp.ndarray] = None,
    seg: int = 25,
    progress=None,
    is_reject_b: Optional[jnp.ndarray] = None,
) -> RolloutOut:
    """Identical semantics to :func:`rollout`, dispatched in ``seg``-step
    segments from the host: one compiled executable reused per segment, short
    per-dispatch device kernels (long single kernels can exceed runtime/RPC
    limits on remote-attached TPUs), and an optional per-segment ``progress``
    callback."""
    T, B = noise_seq.shape[0], noise_seq.shape[1]
    assert T == engine.nsim and T % seg == 0, (T, seg)
    if x0b is None:
        x0b = jnp.broadcast_to(engine.x0, (B, 4))

    @jax.jit
    def segment(carry, idx_seg, noise_seg):
        with jax.default_matmul_precision("highest"):
            return jax.lax.scan(
                lambda c, x: _step(engine, c, x, is_reject_b),
                carry, (idx_seg, noise_seg)
            )

    with jax.default_matmul_precision("highest"):
        carry = _init_carry(engine, B, x0b, is_reject_b)
    outs = []
    for s0 in range(0, T, seg):
        idx = jnp.arange(s0, s0 + seg, dtype=jnp.int32)
        carry, o = segment(carry, idx, noise_seq[s0 : s0 + seg])
        outs.append(o)
        if progress is not None:
            progress(s0 + seg, T, carry)

    cat = lambda xs: jnp.concatenate(xs, axis=0)
    (x_true_s, xest_s, ctrl_s, noise_s, code_s, status_s, iters_s,
     done_iters_s, rp_s, rd_s) = (cat([o[k] for o in outs]) for k in range(10))
    x_true = jnp.concatenate([x0b[None], x_true_s], axis=0)
    xest0 = jnp.concatenate([x0b, jnp.zeros((B, 2), dtype=x0b.dtype)], axis=1)
    x_est = jnp.concatenate([xest0[None], xest_s], axis=0)
    ctrls = jnp.concatenate([jnp.zeros((1, B, 2), dtype=x0b.dtype), ctrl_s], axis=0)
    noise = jnp.concatenate([noise_seq[:1], noise_s], axis=0)
    return RolloutOut(
        x_true=x_true,
        x_est=x_est,
        ctrls=ctrls,
        noise=noise,
        ctrl_seq=code_s,
        status=status_s,
        iters=iters_s,
        i_term=carry.i_term,
        success=carry.succ,
        final_rho=carry.admm_state.rho_scale,
        done_iters=done_iters_s,
        pri_res=rp_s,
        dua_res=rd_s,
    )
