"""Continuous-time nonlinear closed-loop rollout: nested scan with sample-and-hold.

TPU-native replacement for `trajectorySimulateC`
(`/root/reference/src/trajectorySimulateC.py:17-446`): the controller runs at
the discrete period T (same QP/failsafe machinery as ``rollout.discrete``)
while the nonlinear two-body plant integrates at T_cont with fixed-step RK4 —
an outer ``lax.scan`` over control ticks containing an inner ``lax.scan`` over
the T/T_cont substeps (the reference's "crappy sample and hold", `:335,384`).

Reference semantics reproduced:
  * the first T seconds idle with zero control before the first tick
    (`:289-292,325`: loop starts at substep 500 with ctrl pre-filled to 0);
  * one-substep input delay after each tick — the plant's first substep after
    a tick still integrates the previous hold value (`:373` uses
    ``ctrls[:, i]``);
  * delta-v input model: integrate with u = 0 and add the velocity impulse
    once, at the substep following the tick (`:376-380`);
  * band-limited white noise: draws scaled by 1/sqrt(T_cont), held over
    ``noise_length * T`` intervals, added to the *position* states every
    substep (`:296-307,374`) — including the reference's use of sigma_x for
    both axes (`:296`);
  * UKF process noise built with the T*(T/T_cont) Bnoise scale (`:310-313`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from mpc_arpo_project_tpu.config import SimConditions, MPCParams, FailsafeParams, Debris
from mpc_arpo_project_tpu.models import nonlinear
from mpc_arpo_project_tpu.ops import admm, constraints, ukf
from mpc_arpo_project_tpu.rollout import discrete as dd


@flax.struct.dataclass
class ContinuousEngine:
    base: dd.DiscreteEngine  # all the discrete machinery (QP, gains, UKF, geom)
    n_sub: int = flax.struct.field(pytree_node=False)  # substeps per tick (T/T_cont)
    n_ticks: int = flax.struct.field(pytree_node=False)  # discrete steps
    T_cont: jnp.ndarray = 0.0
    mean_mtn: jnp.ndarray = 0.0
    is_delta_v: bool = flax.struct.field(pytree_node=False, default=False)
    noise_int_sub: int = flax.struct.field(pytree_node=False, default=1)  # substeps per noise draw
    sig_cont: jnp.ndarray = 0.0  # per-substep position-jump sigma


class ContinuousOut(NamedTuple):
    x_true_ticks: jnp.ndarray  # (n_ticks+1, B, 4) truth at tick boundaries
    x_sub: Optional[jnp.ndarray]  # (n_ticks, n_sub, B, 4) substep truth (optional)
    x_est: jnp.ndarray  # (n_ticks+1, B, 6)
    ctrls: jnp.ndarray  # (n_ticks+1, B, 2) per-tick applied control
    ctrl_seq: jnp.ndarray  # (n_ticks, B)
    status: jnp.ndarray  # (n_ticks, B)
    i_term_sub: jnp.ndarray  # (B,) termination substep index (== n_total if none)
    success: jnp.ndarray  # (B,)
    iters: jnp.ndarray  # (n_ticks,) ADMM iterations per tick (batch max)
    done_iters: jnp.ndarray  # (n_ticks, B) per-problem iterations to finish


def build_engine(
    sim: SimConditions,
    mpc: MPCParams,
    fail: FailsafeParams,
    debris: Optional[Debris],
    settings: admm.ADMMSettings = admm.ADMMSettings(),
    dtype=jnp.float32,
    noise_convention: str = "brownian",
    estimator: str = "ukf",
) -> ContinuousEngine:
    """noise_convention:
      * "brownian" (default): per-substep position jump sigma = sig*sqrt(dt) —
        the Brownian-increment scaling that makes a per-substep additive jump
        a sane discretization of continuous process noise;
      * "white_noise_per_dt": sigma/sqrt(dt) — what the reference's
        ``ct.white_noise(..., dt=1e-3)`` draws produce as written
        (`trajectorySimulateC.py:296-307`). Because the reference adds the
        draw directly as a position jump every substep (not scaled by dt),
        this yields a held drift of tens of m/s even at sigma=0.0012 and
        diverges; kept only for literal-formula comparison.
    Both use sigma_x for BOTH axes, as the reference does (`:296`).
    """
    assert np.isfinite(sim.T_cont), "continuous engine needs T_cont"
    base = dd.build_engine(sim, mpc, fail, debris, settings=settings,
                           dtype=dtype, estimator=estimator)
    n_sub = int(round(sim.time_stp / sim.T_cont))
    n_ticks = int(sim.T_final / sim.time_stp)
    if sim.noise is not None:
        sig_x = sim.noise.noise_std[0]
        noise_rep = int(sim.noise.noise_length)
    else:
        sig_x = 0.0
        noise_rep = 1
    if noise_convention == "brownian":
        sig_cont = sig_x * np.sqrt(sim.T_cont)
    elif noise_convention == "white_noise_per_dt":
        sig_cont = sig_x / np.sqrt(sim.T_cont)
    else:
        raise ValueError(noise_convention)
    noise_int_sub = noise_rep * n_sub  # substeps per held draw

    # continuous-sim UKF process noise overrides the discrete one
    # (`trajectorySimulateC.py:310-313`)
    T = sim.time_stp
    Qw = np.zeros((6, 6))
    Qw[:4, :4] = 0.001 * np.eye(4)
    Qw[4, 4] = (T * n_sub * sig_x) ** 2
    Qw[5, 5] = (T * n_sub * sim.noise.noise_std[1] if sim.noise else 0.0) ** 2
    base = base.replace(Qw=jnp.asarray(Qw, dtype=dtype))
    if estimator == "kf":
        # re-synthesize the steady-state gain against the continuous-sim
        # process noise that replaced the discrete Qw above
        from mpc_arpo_project_tpu.ops import kalman

        Co = np.hstack([np.eye(2, 4), np.zeros((2, 2))])
        L_kf, _ = kalman.steady_state_gain_np(
            np.asarray(base.Ao, dtype=np.float64), Co,
            Qw + 1e-9 * np.eye(6), 1e-4 * np.eye(2))
        base = base.replace(L_kf=jnp.asarray(L_kf, dtype=dtype))

    return ContinuousEngine(
        base=base,
        n_sub=n_sub,
        n_ticks=n_ticks,
        T_cont=jnp.asarray(sim.T_cont, dtype=dtype),
        mean_mtn=jnp.asarray(sim.mean_mtn, dtype=dtype),
        is_delta_v=bool(sim.isDeltaV),
        noise_int_sub=noise_int_sub,
        sig_cont=jnp.asarray(sig_cont, dtype=dtype),
    )


def make_noise_draws(engine: ContinuousEngine, key, batch: int) -> jnp.ndarray:
    """(n_draws, B, 2) pre-scaled held white-noise draws."""
    n_total = engine.n_ticks * engine.n_sub
    n_draws = n_total // engine.noise_int_sub + 2
    dt = engine.base.Ad.dtype
    return engine.sig_cont * jax.random.normal(key, (n_draws, batch, 2), dtype=dt)


class _CCarry(NamedTuple):
    x_true: jnp.ndarray  # (B, 4)
    xest: jnp.ndarray
    xest_stored: jnp.ndarray
    P: jnp.ndarray
    xintf: jnp.ndarray
    prev_u: jnp.ndarray  # (B, 2) previous tick's control (for the delay substep + UKF)
    l: jnp.ndarray
    u: jnp.ndarray
    c1: jnp.ndarray
    c2: jnp.ndarray
    s: jnp.ndarray
    admm_state: admm.ADMMState
    alive: jnp.ndarray
    i_term_sub: jnp.ndarray  # (B,) int32 substep index of termination
    succ: jnp.ndarray


def _tick(engine: ContinuousEngine, carry: _CCarry, tick_in, noise_draws, substep_telemetry):
    """One control tick: solve/switch like the discrete step, then integrate
    n_sub RK4 substeps with sample-and-hold."""
    j, = tick_in
    base = engine.base
    dims = base.dims
    B = carry.x_true.shape[0]
    dt = base.Ad.dtype
    n_sub = engine.n_sub

    # --- QP solve + controller selection (identical machinery to discrete);
    # dead scenarios are skipped inside the solver (see admm_solve)
    res = admm.admm_solve(
        base.prob, (carry.c1, carry.c2, carry.s), carry.l, carry.u,
        carry.admm_state, base.settings, active=carry.alive,
    )
    solved = res.status == admm.SOLVED
    i0u = (dims.Nx + 1) * dims.nx
    u_mpc = res.x[:, i0u : i0u + 2]
    e = carry.xest_stored
    cx, cy = base.debris_center[0], base.debris_center[1]
    h = base.debris_half
    in_box = (
        (e[:, 0] - (cx + h) < 0) & (e[:, 0] - (cx - h) > 0)
        & (e[:, 1] < cy + h) & (e[:, 1] > cy - h)
    )
    xintf_db = carry.xintf + e[:, 1] - (cy + h)
    u_db = -(e[:, :4] @ base.K_total.T) - xintf_db[:, None] * base.K_i[:, 0][None, :]
    xintf_fs = carry.xintf + (e[:, :4] @ base.Crefx[0]) - base.xr[0]
    u_fs = -(e[:, :4] @ base.Kpf.T) - xintf_fs[:, None] * base.Kif[:, 0][None, :]
    u_fail = jnp.where(in_box[:, None], u_db, u_fs)
    xintf_new = jnp.where(solved, 0.0, jnp.where(in_box, xintf_db, xintf_fs))
    ctrl = jnp.where(solved[:, None], u_mpc, u_fail)
    code = jnp.where(solved, 1, jnp.where(in_box, 3, 2)).astype(jnp.int32)

    umax0 = base.umax[0]
    n1 = jnp.linalg.norm(ctrl, axis=1)
    over = n1 > umax0
    c0 = jnp.where(over, ctrl[:, 0] * umax0 / n1, ctrl[:, 0])
    n2 = jnp.sqrt(c0**2 + ctrl[:, 1] ** 2)
    c1v = jnp.where(over, ctrl[:, 1] * umax0 / n2, ctrl[:, 1])
    ctrl = jnp.stack([c0, c1v], axis=1)

    # --- integrate n_sub substeps with sample-and-hold + 1-substep delay
    def substep(sub_carry, k):
        x, alive, i_term_sub, succ = sub_carry
        gi = j * n_sub + k  # global substep index (tick j covers [j*ns, (j+1)*ns))

        # termination check on the current state (`:328-333`)
        pos_norm = jnp.linalg.norm(x[:, :2], axis=1)
        back = jnp.where(jnp.asarray(base.in_track), x[:, 1], x[:, 0])
        term_now = (pos_norm < base.rp) | (back < base.rp - base.rtol)
        newly_dead = alive & term_now
        alive = alive & ~term_now
        i_term_sub = jnp.where(newly_dead, gi, i_term_sub)

        # success candidates: states with 1 <= index < i_term_sub
        dist_k = jnp.linalg.norm(x[:, :2] - base.xr[:2][None, :], axis=1)
        ang_k = jnp.abs(jnp.arctan(x[:, 3] / x[:, 2])) * (180.0 / jnp.pi)
        ok_k = (dist_k <= base.dist_tol) & (ang_k <= base.ang_tol)
        succ = succ | (alive & (gi >= 1) & ok_k)

        # input: the first substep of the tick still integrates the previous
        # hold value (1-substep delay, `:373`); thereafter the new control
        u_now = jnp.where(k == 0, carry.prev_u, ctrl)
        if engine.is_delta_v:
            # integrate unforced; the *previous* tick's delta-v impulse is
            # applied at the tick substep (`:376-380`: ctrls[:, i] is the held
            # pre-update value at the tick iteration)
            x_next = nonlinear.rk4_step(
                x, jnp.zeros_like(u_now), engine.mean_mtn, engine.T_cont
            )
            x_next = x_next.at[:, 2:].add(
                jnp.where(k == 0, carry.prev_u, jnp.zeros_like(u_now))
            )
        else:
            x_next = nonlinear.rk4_step(x, u_now, engine.mean_mtn, engine.T_cont)

        # held white noise added to positions every substep (`:374`)
        draw = noise_draws[gi // engine.noise_int_sub]
        x_next = x_next.at[:, :2].add(draw)

        x_new = jnp.where(alive[:, None], x_next, x)
        out = x_new if substep_telemetry else None
        return (x_new, alive, i_term_sub, succ), out

    (x_end, alive, i_term_sub, succ), x_sub = jax.lax.scan(
        substep, (carry.x_true, carry.alive, carry.i_term_sub, carry.succ),
        jnp.arange(n_sub, dtype=jnp.int32),
    )
    # the state one substep after the tick — what the reference measures
    # (`:388`: ymeas uses xtrueP[:, i+1] right after the tick substep)
    if substep_telemetry:
        x_after_first = x_sub[0]
    else:
        # recompute substep 0 only (cheap: one RK4 step)
        if engine.is_delta_v:
            x_af = nonlinear.rk4_step(
                carry.x_true, jnp.zeros_like(ctrl), engine.mean_mtn, engine.T_cont
            )
            x_af = x_af.at[:, 2:].add(carry.prev_u)
        else:
            x_af = nonlinear.rk4_step(
                carry.x_true, carry.prev_u, engine.mean_mtn, engine.T_cont
            )
        x_af = x_af.at[:, :2].add(noise_draws[(j * n_sub) // engine.noise_int_sub])
        x_after_first = jnp.where(carry.alive[:, None], x_af, carry.x_true)

    # --- measurement + UKF one substep after the tick (`:384-394`), with the
    # previous tick's held control in the predict step (`:390`: ctrls[:, i]
    # is the value applied over the interval that just ended)
    if base.has_noise and base.estimator == "kf":
        from mpc_arpo_project_tpu.ops import kalman

        xest_next = jax.vmap(
            lambda xk, uu, zz: kalman.kf_step(
                xk, uu, zz, base.Ao, base.Bou, base.Co, base.L_kf
            )
        )(carry.xest, carry.prev_u, x_after_first[:, :2])
        P_next = carry.P
    elif base.has_noise:
        z = jnp.stack(
            [jnp.linalg.norm(x_after_first[:, :2], axis=1),
             jnp.arctan2(x_after_first[:, 1], x_after_first[:, 0])], axis=1,
        )

        def kf_step(xk, Pk, uu, zz):
            st = ukf.step(ukf.UKFState(x=xk, P=Pk), uu, zz, base.ukf_w,
                          base.Ao, base.Bou, base.Qw, base.R_meas)
            return st.x, st.P

        xest_next, P_next = jax.vmap(kf_step)(carry.xest, carry.P, carry.prev_u, z)
    else:
        xest_next = jnp.concatenate([x_after_first, jnp.zeros((B, 2), dtype=dt)], axis=1)
        P_next = carry.P

    dyn = jax.vmap(lambda ee: constraints.configure(base.geom, ee))(xest_next)
    lineq, uineq = jax.vmap(
        lambda d, ee: constraints.assemble_bounds(
            d, ee, dims, base.umin, base.umax, base.geom.is_reject
        )
    )(dyn, xest_next)
    l_new = carry.l.at[:, :4].set(-xest_next[:, :4])
    u_new = carry.u.at[:, :4].set(-xest_next[:, :4])
    l_new = l_new.at[:, dims.n_eq :].set(lineq)
    u_new = u_new.at[:, dims.n_eq :].set(uineq)

    def keep(new, old):
        mask = alive.reshape((B,) + (1,) * (new.ndim - 1))
        return jnp.where(mask, new, old)

    new_carry = _CCarry(
        x_true=x_end,
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
        i_term_sub=i_term_sub,
        succ=succ,
    )
    outs = (
        x_end,
        keep(dyn.xest_stored, carry.xest_stored),
        # control/code recorded with PRE-tick aliveness: a tick that started
        # before mid-block termination still recorded its control (reference
        # writes ctrls at tick processing before the break can occur)
        jnp.where(carry.alive[:, None], ctrl, 0.0),
        jnp.where(carry.alive, code, 0),
        jnp.where(carry.alive, res.status, -1),
        res.iters,
        jnp.where(carry.alive, res.done_iters, 0),
        x_sub,
    )
    return new_carry, outs


def rollout(
    engine: ContinuousEngine,
    noise_draws: jnp.ndarray,
    x0b: Optional[jnp.ndarray] = None,
    substep_telemetry: bool = False,
) -> ContinuousOut:
    """Run the continuous-time closed loop for a scenario batch.

    noise_draws: (n_draws, B, 2) from ``make_noise_draws`` (zeros allowed).
    """
    base = engine.base
    B = noise_draws.shape[1]
    dt = base.Ad.dtype
    if x0b is None:
        x0b = jnp.broadcast_to(base.x0, (B, 4)).astype(dt)

    dcarry = dd._init_carry(base, B, x0b)
    n_total = engine.n_ticks * engine.n_sub
    carry = _CCarry(
        x_true=x0b,
        xest=dcarry.xest,
        xest_stored=dcarry.xest_stored,
        P=dcarry.P,
        xintf=dcarry.xintf,
        prev_u=jnp.zeros((B, 2), dtype=dt),
        l=dcarry.l,
        u=dcarry.u,
        c1=dcarry.c1,
        c2=dcarry.c2,
        s=dcarry.s,
        admm_state=dcarry.admm_state,
        alive=jnp.ones((B,), dtype=bool),
        i_term_sub=jnp.full((B,), n_total, dtype=jnp.int32),
        succ=jnp.zeros((B,), dtype=bool),
    )

    # the reference idles the first T seconds (substeps [0, n_sub)) with zero
    # control and no plant motion recorded beyond the hold (`:289-292,325`);
    # ticks then run j = 1 .. n_ticks-1
    def tick_fn(c, j):
        return _tick(engine, c, (j,), noise_draws, substep_telemetry)

    ticks = jnp.arange(1, engine.n_ticks, dtype=jnp.int32)
    # full-precision matmuls (see rollout.discrete)
    with jax.default_matmul_precision("highest"):
        carry, outs = jax.lax.scan(tick_fn, carry, ticks)
    (x_ticks_s, xest_s, ctrl_s, code_s, status_s, iters_s, done_iters_s,
     x_sub_s) = outs

    x_true_ticks = jnp.concatenate([x0b[None], x0b[None], x_ticks_s], axis=0)
    xest0 = jnp.concatenate([x0b, jnp.zeros((B, 2), dtype=dt)], axis=1)
    x_est = jnp.concatenate([xest0[None], xest0[None], xest_s], axis=0)
    ctrls = jnp.concatenate([jnp.zeros((2, B, 2), dtype=dt), ctrl_s], axis=0)

    return ContinuousOut(
        x_true_ticks=x_true_ticks,
        x_sub=x_sub_s if substep_telemetry else None,
        x_est=x_est,
        ctrls=ctrls,
        ctrl_seq=code_s,
        status=status_s,
        i_term_sub=carry.i_term_sub,
        success=carry.succ,
        iters=iters_s,
        done_iters=done_iters_s,
    )


def rollout_chunked(
    engine: ContinuousEngine,
    noise_draws: jnp.ndarray,
    x0b: Optional[jnp.ndarray] = None,
    seg: int = 25,
    progress=None,
) -> ContinuousOut:
    """Identical semantics to :func:`rollout`, dispatched in ``seg``-tick
    segments from the host (see rollout.discrete.rollout_chunked: one
    compiled segment program reused across dispatches keeps device kernels
    short for remote-attached TPUs and enables progress callbacks). The
    reference's flagship continuous run is 300 s @ 1 ms = 300k RK45 substeps
    (`/root/reference/test/traj_eval_radialC.py:37-38`) — far too long for a
    single in-graph scan dispatch over a remote tunnel. Tick counts not
    divisible by ``seg`` compile one extra remainder-length program."""
    base = engine.base
    B = noise_draws.shape[1]
    dt = base.Ad.dtype
    if x0b is None:
        x0b = jnp.broadcast_to(base.x0, (B, 4)).astype(dt)

    dcarry = dd._init_carry(base, B, x0b)
    n_total = engine.n_ticks * engine.n_sub
    carry = _CCarry(
        x_true=x0b, xest=dcarry.xest, xest_stored=dcarry.xest_stored,
        P=dcarry.P, xintf=dcarry.xintf,
        prev_u=jnp.zeros((B, 2), dtype=dt),
        l=dcarry.l, u=dcarry.u, c1=dcarry.c1, c2=dcarry.c2, s=dcarry.s,
        admm_state=dcarry.admm_state,
        alive=jnp.ones((B,), dtype=bool),
        i_term_sub=jnp.full((B,), n_total, dtype=jnp.int32),
        succ=jnp.zeros((B,), dtype=bool),
    )

    @jax.jit
    def segment(c, ticks_seg):
        with jax.default_matmul_precision("highest"):
            return jax.lax.scan(
                lambda cc, j: _tick(engine, cc, (j,), noise_draws, False),
                c, ticks_seg)

    outs = []
    ticks = np.arange(1, engine.n_ticks, dtype=np.int32)
    for s0 in range(0, len(ticks), seg):
        carry, o = segment(carry, jnp.asarray(ticks[s0:s0 + seg]))
        outs.append(o)
        if progress is not None:
            progress(int(ticks[min(s0 + seg, len(ticks)) - 1]) + 1,
                     engine.n_ticks, carry)

    cat = lambda xs: jnp.concatenate(xs, axis=0)
    # outs[7] (x_sub) is None with substep_telemetry=False
    (x_ticks_s, xest_s, ctrl_s, code_s, status_s, iters_s, done_iters_s) = (
        cat([o[k] for o in outs]) for k in range(7))
    x_true_ticks = jnp.concatenate([x0b[None], x0b[None], x_ticks_s], axis=0)
    xest0 = jnp.concatenate([x0b, jnp.zeros((B, 2), dtype=dt)], axis=1)
    x_est = jnp.concatenate([xest0[None], xest0[None], xest_s], axis=0)
    ctrls = jnp.concatenate([jnp.zeros((2, B, 2), dtype=dt), ctrl_s], axis=0)
    return ContinuousOut(
        x_true_ticks=x_true_ticks, x_sub=None, x_est=x_est, ctrls=ctrls,
        ctrl_seq=code_s, status=status_s, i_term_sub=carry.i_term_sub,
        success=carry.succ, iters=iters_s, done_iters=done_iters_s,
    )
