"""Batched, in-graph OSQP-style ADMM QP solver — the framework's hot kernel.

This replaces the OSQP C core the reference calls through Python bindings
(`/root/reference/src/trajectorySimulate.py:242-245,296,342,348`) with a
TPU-native design (algorithm per Stellato et al., arXiv:1711.08013):

* **One scenario batch, shared weights.** All per-iteration matrix products
  use matrices *shared across the batch* (`A0bar`, `Pbar`): a batch of
  iterates (B, nz) multiplies one (m, nz) matrix — a single large MXU matmul —
  instead of B independent sparse matvecs. Per-scenario constraint variation
  is exactly three scalars (c1, c2, s — see ``ops.qp_builder``) applied as
  gather/scatter corrections.

* **Structured normal-matrix assembly.** The ADMM linear system matrix
  M = P + sigma*I + A' diag(rho) A differs per scenario only through those
  scalars, so M_k = (Pbar + sigma I) + theta_k * (G + c1*F1 + c2*F2 +
  c1*c2*F12 + s*F3 + s^2*F33) with five fixed precomputed matrices
  (c1^2 = c2^2 = 1 terms folded into G) — no per-scenario assembly, ever.

* **Two solve paths** (``settings.solve_mode``): 'chol' — batched Cholesky
  once per step + triangular solves per iteration (exact; the CPU/oracle
  parity path); 'pallas' — fused-chunk TPU kernels with Newton-Schulz
  inverse maintenance and no decompositions anywhere (see ops.admm_pallas).

* **Static shapes, masked convergence.** A ``lax.while_loop`` runs blocks of
  ``check_every`` iterations; per-problem ``done`` masks freeze converged /
  infeasible problems, reproducing OSQP's termination + primal/dual
  infeasibility certificates (which drive the reference's failsafe switching,
  `trajectorySimulate.py:299-314`). Adaptive rho triggers mid-solve at
  OSQP's default 50-iteration cadence (deterministic iteration counts where
  OSQP's trigger is wall-clock-based) with a masked batched refactor/refresh.

* **Ruiz equilibration** is computed once on the initial-state problem —
  exactly when the reference's OSQP setup computes it — and shared: scaling
  is a preconditioner, so sharing it keeps all matrices batch-shared while
  preserving exactness of the solution.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpc_arpo_project_tpu.ops.qp_builder import QPDims, QPStatic, materialize_A

MIN_SCALING = 1e-4
MAX_SCALING = 1e4
RHO_MIN = 1e-6
RHO_MAX = 1e6
RHO_EQ_SCALE = 1e3

# status codes (failsafe switching keys off SOLVED, cf. reference
# `trajectorySimulate.py:299`)
UNSOLVED = 0
SOLVED = 1
MAX_ITER = 2
PRIMAL_INFEASIBLE = 3
DUAL_INFEASIBLE = 4


class ADMMSettings(NamedTuple):
    """Solver settings; defaults mirror OSQP's (`osqp` v0.6 defaults, which the
    reference uses implicitly via ``prob.setup(..., verbose=False)``)."""

    sigma: float = 1e-6
    alpha: float = 1.6
    rho_bar: float = 0.1
    eps_abs: float = 1e-3
    eps_rel: float = 1e-3
    eps_pinf: float = 1e-4
    eps_dinf: float = 1e-4
    max_iter: int = 4000
    check_every: int = 25
    scaling_iters: int = 10
    adaptive_rho: bool = True
    adaptive_rho_interval: int = 50  # must be a multiple of check_every
    adaptive_rho_tol: float = 5.0
    # see prim_infeas: minimum decisively-negative support (scaled units)
    pinf_support_margin: float = 1.0
    # 'chol': exact batched Cholesky + triangular solves (XLA; oracle-parity
    # path). 'pallas': fused-chunk Pallas kernels with Newton-Schulz inverse
    # maintenance (round-2 TPU path; see ops.admm_pallas). 'eig':
    # shared-basis generalized-eigendecomposition solve — per-combo
    # eigenbases + exact debris Woodbury correction, no iterative
    # refinement needed (round-3 TPU production path; see ops.admm_eig).
    solve_mode: str = "chol"
    ns_warm_iters: int = 3
    ns_cold_iters: int = 45
    # Newton-Schulz iterations for the (K, K) Woodbury inner inverse in
    # 'eig' mode (warm = previous T^{-1}; cold = norm-scaled T', needs the
    # full basin-entry run — measured ~25 iters on the flagship problem)
    eig_warm_iters: int = 3
    eig_cold_iters: int = 30
    # refresh capacity divisor: each Woodbury-inner refresh fire first
    # compacts needy rows (argsort gather) into a buffer of n_slots/div rows
    # and refreshes only those — per-row refresh math is independent, so
    # results are bit-identical to a full-width refresh; a lax.cond falls
    # back to full width when more rows are needy than the buffer holds
    # (synchronized debris-approach windows). Round-3 trace: the full-width
    # refresh fired ~once per 2 chunks (~28x/step) and its batched (K,K)
    # matmuls + YT gathers dominated the per-chunk glue. 0/1 disables.
    # A/B on the flagship bench (B=1024, n_slots=1152): div 8 -> 4,704/s,
    # 16 -> 5,164, 32 -> 5,565 (cap 36 rows), 64 -> 5,126 (overflow
    # fallbacks win back the cost) — vs 3,866 full-width.
    eig_refresh_cap_div: int = 32
    # MXU precision for the Woodbury-inner NS refresh matmuls only (the
    # fused solve kernel keeps mxu_precision). Measured negative result
    # (round 3, flagship bench): "high" (3-pass bf16) is NOT a win — wall
    # unchanged (5,344 vs 5,565/s) while the ~1e-6 tinv plateau perturbs
    # iterates enough to move the status mix 2 points AWAY from the fp64
    # oracle (SOLVED 60.6% vs 62.9%) and drop mean iters 1539 -> 1400:
    # the refresh is gather/launch-bound, not matmul-pass-bound, so the
    # cheaper passes buy nothing and cost acceptance margin. Keep HIGHEST.
    eig_refresh_precision: str = "highest"
    # cold-restart rows whose residuals go non-finite mid-solve (fp32
    # overflow — see the sigma=0.01 diagnostic note in the body). No effect
    # on fp64 or on healthy rows; disable to reproduce the round-3 behavior.
    eig_nan_reset: bool = True
    # per-problem T^{-1} application strategy on debris tiles (see
    # admm_eig.eig_chunk): 'loop' = bt batch-1 (1,K)@(K,K) dots (round-3
    # shipped), 'vpu' = broadcast-multiply-reduce (K*K MACs/problem as
    # elementwise VPU work instead of 1/128-utilized MXU passes),
    # 'blockdiag' = one (bt, bt*K)@(bt*K, K) block-diagonal MXU matmul.
    eig_apply: str = "loop"
    # fp32 robustification of huge debris slopes (the round-3 sigma=0.01
    # docking-gap mechanism): the slope s = (y_est-vy)/(x_est-vx) blows up
    # to ~1e5 when the chaser crosses the chosen bbox vertex's x-coordinate
    # (reference computes it unguarded, `simhelpers.py:83-101`, and fp64
    # OSQP absorbs it), and the ADMM normal matrix conditioning grows ~s^2
    # (measured: cond(T) 1.5e3 at s=10 -> 1.2e9 at s=1e4) — far beyond fp32
    # for ~0.25-0.5% of steps, which then DIVERGE (non-finite residuals,
    # MAX_ITER exits, failsafe takes over; docking drops ~20 points at
    # sigma=0.01). Fix: per-problem row equilibration of the debris rows
    # INSIDE the eig solve — rows scaled by alpha = min(1, smax/|s|), an
    # exact rescaling of the same QP (bounds, slack coupling and duals warp
    # by alpha; the optimum is identical) that caps the correction
    # coefficients at smax-level conditioning. alpha == 1 exactly (bit-
    # identical path) whenever |s| <= smax. 0 disables.
    eig_deb_equil_smax: float = 32.0
    # fp32 dual-plateau rho rescue ('eig' mode; round-5 sigma=0.01 root-cause
    # fix). Measured mechanism (tools/first_divergence.py, step 65 of the
    # sigma=0.01 rollout — the FIRST production-vs-oracle status flip for 32
    # of 45 gap scenarios): when the debris window engages, 13 problems hit
    # an fp32 ITERATE-floor where the primal residual converges (~0.2x tol)
    # but the dual plateaus at 1.9-5.6x tol — fp64-re-evaluating the same
    # iterate reproduces the plateau exactly, so it is the iterate, not the
    # residual computation. The rp/rd ratio (~0.26) sits INSIDE OSQP's
    # adaptive-rho deadband (1/5), so rho never rebalances; fp64 grinds
    # through the slow high-rho dual tail (100 iters), fp32's noise floor
    # cannot. Rescue: when a row has primal converged, dual plateaued, and
    # no residual progress for eig_rescue_chunks check intervals, force the
    # STANDARD OSQP rho update through the deadband (same ratio formula,
    # same refresh machinery). Measured on the captured step-65 carry:
    # 13/13 rows SOLVED in 25-225 iters vs 0/13 stall-exits at 375-425.
    # Genuinely-hard plateau rows (rp > tol — see probe_stall phase 2) never
    # satisfy the primal-converged gate, and each rescue resets the stall
    # clock at most eig_rescue_max times, so hopeless rows still exit.
    # Round-5 phase 2 (step-67 capture, tools/first_divergence.py): the
    # mirror class — BOTH residuals stuck just above tolerance (rp 1.1-1.7x)
    # or primal plateaued a decade above — responds to rho DECREASE: from
    # the same carry, rho x0.1 solves 33/46 recorded MAX_ITER rows (more
    # than fp64 chol at the carried rho: 14/46 — the QPs are solvable, the
    # warm-carried shared rho is simply mismatched once the debris window
    # re-shapes the active set). Policy: when a stuck row's rp/rd ratio is
    # decisive (outside [1/amin, amin]) use the standard OSQP rescale;
    # otherwise nudge rho by eig_rescue_factor (down — measured direction).
    # The near gate keeps genuinely divergent rows (res >> tol) from burning
    # rescue rounds.
    # Closed-loop A/B (sigma=0.01, n=128, identical draws): narrow 'dual'
    # rescue 85/128 dockings vs baseline 83 vs GENERALIZED 'near' rescue
    # (factor 0.1) 75 — rescuing the both-above class perturbs rows whose
    # MAX_ITER->failsafe exit was benign, and loses more trajectories than
    # the per-step solves it wins. Keep 'dual' (the measured iterate-floor
    # class) as the default; 'near' stays for experiments.
    eig_rho_rescue: bool = True
    eig_rescue_mode: str = "dual"
    eig_rescue_chunks: int = 6
    eig_rescue_max: int = 4
    eig_rescue_amin: float = 2.0
    eig_rescue_factor: float = 0.1
    eig_rescue_near: float = 50.0
    # Inter-step rho step-down after a primal-plateau MAX_ITER exit
    # (rp > tol, rd <= tol): the step-67 capture shows those rows solve from
    # the SAME warm start at a decade-lower rho (33/46 at x0.1 vs 0/46).
    # Closed-loop A/B said NO: sigma=0.01 dockings 85 -> 79 with 0.25 (and
    # the mid-solve 'near' rescue on the same class measured 75) — the
    # primal-plateau failsafe exits are evidently protective, and biasing
    # the carried rho perturbs later solves. DISABLED by default; kept as a
    # measured negative result. 0/1 disables.
    eig_exit_rho_down: float = 0.0
    # 'eig' straggler compaction: at each listed chunk count the batch is
    # re-sorted WITHIN combo groups so still-running problems pack into the
    # fewest tiles (pure permutation of independent problems — iterates are
    # bit-identical, scattered back at the end). Without it stragglers stay
    # scattered and one active problem per tile keeps every tile computing:
    # measured (bench flagship, B=1024) ~23% of problems remain past 600
    # iterations spread over ~all 36 tiles, so the tail runs near-full-batch
    # cost. () disables.
    eig_compact_chunks: tuple = (2, 4, 8, 16, 24)
    # iteration multiplier for chunks after the LAST compaction point: the
    # straggler tail runs mult*check_every iterations per kernel launch,
    # amortizing launch + skipped-tile DMA overhead (statuses/telemetry
    # quantize at the coarser cadence; convergence checks unchanged in kind).
    # 1 = OSQP-faithful check cadence everywhere (default). Measured (bench
    # flagship, round 3): mult=4 INCREASES mean iterations 22% (residuals are
    # non-monotone, so coarser checks miss eps-dips) and loses throughput.
    eig_tail_mult: int = 1
    # batch-tile width for the fused kernels; 32 measured ~2x faster than 8
    # at B=1024 (wider rows through the MXU weight path), still ~16 MB/tile
    # double-buffered VMEM. _tile_width() halves it until it divides B.
    pallas_tile: int = 32
    # iterative-refinement steps inside the Pallas solve: each step SQUARES
    # the effective inverse error, which both fixes fp32 floors and buys
    # staleness tolerance for the refresh gating below. One step with a
    # 2%-drift gate solves to ~4e-4 effective inverse error (well under the
    # measured ~4e-3 stall threshold) at ~25% less per-iteration cost than
    # two steps with a 5% gate.
    ir_steps: int = 1
    # refresh the inverse when the slope coefficient drifts this far
    # (relative) from the refresh point
    ns_refresh_drift: float = 0.02
    # stall exit (0 = disabled, the OSQP-faithful default): declare MAX_ITER
    # early when neither residual has improved by >= 5% for this many check
    # intervals. Marginally-infeasible QPs in this problem family plateau
    # (verified not to converge even at fp64 with 8000 iterations) yet evade
    # the Farkas certificate; the batch iteration count is a max over
    # problems, so one plateaued problem otherwise drags every remaining
    # control step to the iteration cap. Closed-loop behavior is unchanged
    # in kind: the step falls back to the failsafe exactly as the capped
    # solve would.
    stall_exit_chunks: int = 0
    stall_improve: float = 0.95
    # second-phase stall tightening: after ``stall_tighten_chunks`` chunks a
    # problem must improve a residual by (1 - stall_improve2) per window to
    # keep running. Measured on the bench flagship config (B=1024,
    # max_iter=4000, Nx=50, sigma=0.75) with the round-2 'pallas' kernel:
    # solves that DID converge finished at p50=25 / p99=475 iterations (the
    # round-2 bench with tightening active reads p99=600-725 — the quantized
    # post-tighten view of the same tail), while stall-exited problems burned
    # p50=425 / p90=975 iterations producing iterates the failsafe discards —
    # a slow-but-steady 5% drip let them evade the single-phase exit for
    # thousands of iterations. Solves still converging past 1000 iterations
    # are <0.3% of SOLVED, so the tight phase shifts the status mix by well
    # under a point. Percentiles drift with config: requalify before reusing
    # them to tune other scenarios.
    stall_improve2: float = 0.75
    stall_tighten_chunks: int = 40
    # compact sparse needy sets into a B/div buffer before a Newton-Schulz
    # refresh (the masked refresh kernel skips whole tiles only — one needy
    # problem makes its tile recompute NS for all bt problems). 0 disables.
    refresh_compact_div: int = 8
    # overtime cascade ('pallas' mode): each time the active count fits in
    # half the current lane width, compact the stragglers (argsort gather)
    # into the smaller lane and keep iterating there, halving from B/2 down
    # to ~B/overtime_div. Straggler QPs (cap-bound marginally-infeasible
    # ones especially — 4-20% of steps in the flagship scenario) otherwise
    # keep EVERY batch tile streaming its inverses through the MXU for
    # thousands of iterations; per-problem math is independent, so
    # compaction is exact. 0/1 disables; ignored when B // div is not
    # meaningfully smaller than B.
    overtime_div: int = 32
    # MXU pass count for fp32 dots inside the Pallas kernels: 'highest'
    # (6-pass fp32, exact) or 'default' (single bf16 pass — breaks fp32 ADMM
    # convergence, diagnostic only; Mosaic does not implement 'high').
    mxu_precision: str = "highest"
    # two-limb bf16 Minv apply in the chunk kernel (fp32 only): the inverse
    # and rhs are split hi/lo once per chunk and applied as three single-pass
    # bf16 dots (~2^-16 relative error, far below the inverse-error stall
    # threshold) — measured ~2x cheaper than the 6-pass fp32 matvec, which
    # is the single most expensive per-iteration op.
    minv_two_limb: bool = True


class ADMMProblem(NamedTuple):
    """Device-resident problem data, shared across the scenario batch."""

    Pbar: jnp.ndarray  # (nz, nz) scaled quadratic cost
    qbar: jnp.ndarray  # (nz,) or (B, nz) scaled linear cost
    A0bar: jnp.ndarray  # (m, nz) scaled base constraint matrix
    AK: jnp.ndarray  # (4m, nz) stacked [A0bar; S1bar; S2bar; S3bar] — the
    # scatter patterns stored as dense one-hot matrices so per-iteration
    # corrections are MXU matmuls instead of TPU-hostile scatters
    G: jnp.ndarray  # (nz, nz) rho-proportional base of the normal matrix
    Fstack: jnp.ndarray  # (5, nz, nz) structured corrections [F1,F2,F12,F3,F33]
    rho_vec: jnp.ndarray  # (m,) base rho vector (eq rows boosted 1e3x)
    D: jnp.ndarray  # (nz,) column scaling
    E: jnp.ndarray  # (m,) row scaling
    Dinv: jnp.ndarray
    Einv: jnp.ndarray
    c: jnp.ndarray  # () cost scaling
    sc1: jnp.ndarray  # (Nx+1,) scaled multiplier for c1 entries: E[fr]*D[velx]
    sc2: jnp.ndarray  # (Nx+1,)
    sc3: jnp.ndarray  # (Nx+1,)
    fun_rows: jnp.ndarray  # (Nx+1,) int32
    deb_rows: jnp.ndarray
    velx_cols: jnp.ndarray
    vely_cols: jnp.ndarray
    posx_cols: jnp.ndarray
    # compact correction factorization for the fused TPU kernel (see
    # ops.admm_pallas._chunk_kernel): the three dynamic one-hot scatter
    # patterns expressed as gather/scatter matmul pairs of width 3*gw
    # (gw = Nx+1 rounded up to 64), with the scaled coefficient vectors
    # folded in. A_k x = A0 x + (wsel_k * (x @ gsel)) @ scat, where wsel_k
    # is the per-problem [c1|c2|s] group mask built from an iota compare —
    # everything rides the MXU at 1/3 the FLOPs of the 4-stacked-AK form,
    # with no TPU-hostile scatters or unaligned lane ops.
    gsel: jnp.ndarray  # (nz, 3*gw)
    scat: jnp.ndarray  # (3*gw, m)
    rsel: jnp.ndarray  # (m, 3*gw)
    gscat: jnp.ndarray  # (3*gw, nz)
    # shared-basis ('eig') solve data (None unless prepared with
    # solve_mode='eig'; see ops.admm_eig for the factorization):
    # per-combo stacks indexed by combo = (c1>0)*2 + (c2>0)
    eig_A: Optional[jnp.ndarray] = None  # (4, m, nz) A_c = A0bar + c1 S1 + c2 S2
    eig_W: Optional[jnp.ndarray] = None  # (4, nz, nz) generalized eigenbasis
    eig_lam: Optional[jnp.ndarray] = None  # (4, nz) eigenvalues of (H_c, base)
    eig_YT: Optional[jnp.ndarray] = None  # (4, K, nz) Z' W_c
    eig_w33row: Optional[jnp.ndarray] = None  # (1, K) D33 diagonal
    eig_w33col: Optional[jnp.ndarray] = None  # (K, K) same, lane-broadcast
    eig_K1: Optional[jnp.ndarray] = None  # (K, K) block-swap matrix
    eig_wuurow: Optional[jnp.ndarray] = None  # (1, K) U-block equil diag
    eig_wuucol: Optional[jnp.ndarray] = None  # (K, K) same, lane-broadcast


class ADMMState(NamedTuple):
    """Warm-start state carried across control steps (scaled iterates)."""

    xbar: jnp.ndarray  # (B, nz)
    ybar: jnp.ndarray  # (B, m)
    zbar: jnp.ndarray  # (B, m)
    rho_scale: jnp.ndarray  # (B,) per-problem scalar multiplier on rho_vec
    # inverse-maintenance state ('pallas' mode; (B,1,1) dummy otherwise)
    minv: jnp.ndarray  # (B, nz, nz) approximate inverse normal matrix
    minv_ok: jnp.ndarray  # () bool — False until the first cold start ran
    # the (coeffs, rho) the inverse was last refreshed at: refreshes happen
    # only when these move materially, so most control steps launch NO
    # Newton-Schulz kernel at all
    ref_coef: jnp.ndarray  # (B, 4): c1, c2, s, rho_scale at last refresh


class ADMMResult(NamedTuple):
    x: jnp.ndarray  # (B, nz) unscaled primal solution
    status: jnp.ndarray  # (B,) int32 status codes
    iters: jnp.ndarray  # () iterations executed (batch-uniform)
    pri_res: jnp.ndarray  # (B,) final unscaled primal residual
    dua_res: jnp.ndarray  # (B,) final unscaled dual residual
    state: ADMMState
    # per-problem iterations until the problem finished (converged /
    # certified / stalled); == iters for problems that ran to the cap,
    # 0 for inactive problems. Drives straggler/tail diagnostics.
    done_iters: jnp.ndarray = jnp.zeros((), dtype=jnp.int32)  # (B,)
    # convergence-test denominators (eps_abs + eps_rel * rel_scale) frozen at
    # the same chunk as pri_res/dua_res: res/tol ratios <= 1 mean converged,
    # ~1-3 mean a plateau just above tolerance (fp32 floor diagnostics),
    # >> 1 genuinely unconverged. 0 where never computed.
    pri_tol: jnp.ndarray = jnp.zeros(())  # (B,)
    dua_tol: jnp.ndarray = jnp.zeros(())  # (B,)


# --------------------------------------------------------------------------
# setup (host-side, float64 numpy)
# --------------------------------------------------------------------------

def _ruiz(P, q, A, iters):
    n, m = P.shape[0], A.shape[0]
    D = np.ones(n)
    E = np.ones(m)
    c = 1.0
    Ps, As, qs = P.copy(), A.copy(), q.copy()
    for _ in range(iters):
        norm_cols_n = np.maximum(np.abs(Ps).max(axis=0, initial=0.0),
                                 np.abs(As).max(axis=0, initial=0.0))
        norm_cols_m = np.abs(As).max(axis=1, initial=0.0)
        norms = np.clip(np.concatenate([norm_cols_n, norm_cols_m]), MIN_SCALING, MAX_SCALING)
        delta = 1.0 / np.sqrt(norms)
        dn, dm = delta[:n], delta[n:]
        Ps = Ps * dn[:, None] * dn[None, :]
        As = As * dm[:, None] * dn[None, :]
        qs = qs * dn
        D *= dn
        E *= dm
        norm_P_cols = np.abs(Ps).max(axis=0, initial=0.0)
        gamma = 1.0 / max(
            np.clip(max(norm_P_cols.mean(), np.abs(qs).max(initial=0.0)),
                    MIN_SCALING, MAX_SCALING),
            MIN_SCALING,
        )
        Ps *= gamma
        qs *= gamma
        c *= gamma
    return Ps, qs, As, D, E, c


def prepare_problem(
    static: QPStatic,
    dims: QPDims,
    settings: ADMMSettings = ADMMSettings(),
    nominal_coeffs=(1.0, 1.0, 0.0),
    dtype=jnp.float32,
    pad: bool = False,
) -> ADMMProblem:
    """Equilibrate once on the nominal problem and precompute the structured
    normal-matrix pieces. Host-side float64; result cast to ``dtype``.

    ``pad=True`` rounds nz up to a multiple of 128 and m to a multiple of 256
    with inert rows/columns (zero constraint rows with l = u = 0, unit cost
    diagonal on dummy variables) — odd dimensions (241/496) force constant
    vector-register relayouts in the TPU kernels; aligned shapes run the MXU
    paths at full tile width. Solutions are unchanged: padded variables decay
    to zero and padded rows never activate. ``admm_solve`` pads incoming
    bound vectors automatically."""
    P, q, A0 = static.P, static.q, static.A0
    # scaling computed on a representative materialized A
    A_nom = materialize_A(static, *nominal_coeffs)
    _, _, _, D, E, c = _ruiz(P, q, A_nom, settings.scaling_iters)

    Pbar = c * (P * D[:, None] * D[None, :])
    qbar = c * (D * q)
    A0bar = A0 * E[:, None] * D[None, :]

    rho = np.full(dims.m, np.clip(settings.rho_bar, RHO_MIN, RHO_MAX))
    rho[static.eq_mask] = np.clip(settings.rho_bar * RHO_EQ_SCALE, RHO_MIN, RHO_MAX)

    fr, dr = static.fun_rows, static.deb_rows
    vx, vy, px = static.velx_cols, static.vely_cols, static.posx_cols
    sc1 = E[fr] * D[vx]
    sc2 = E[fr] * D[vy]
    sc3 = E[dr] * D[px]
    rho_f = rho[fr]
    rho_d = rho[dr]

    nz = dims.nz
    af = A0bar[fr, :]  # (Nx+1, nz) scaled base funnel rows
    ad = A0bar[dr, :]

    def sym_outer(rows_vals, cols, weights):
        # sum_j w_j (row_j e_{c_j}' + e_{c_j} row_j')
        Mx = np.zeros((nz, nz))
        contrib = weights[:, None] * rows_vals  # (Nx+1, nz)
        np.add.at(Mx, cols, contrib)  # e_c row' part (rows of Mx at cols indices)
        return Mx + Mx.T

    F1 = sym_outer(af, vx, rho_f * sc1)
    F2 = sym_outer(af, vy, rho_f * sc2)
    F3 = sym_outer(ad, px, rho_d * sc3)
    F12 = np.zeros((nz, nz))
    np.add.at(F12, (vx, vy), rho_f * sc1 * sc2)
    F12 = F12 + F12.T
    F33 = np.zeros((nz, nz))
    np.add.at(F33, (px, px), rho_d * sc3 **2)

    G = A0bar.T @ (rho[:, None] * A0bar)
    # fold the constant c1^2, c2^2 diagonal terms into G
    np.add.at(G, (vx, vx), rho_f * sc1**2)
    np.add.at(G, (vy, vy), rho_f * sc2**2)

    # dense one-hot scatter patterns, scaled (see ADMMProblem.AK)
    m_rows = dims.m
    S1b = np.zeros((m_rows, nz))
    S1b[fr, vx] = sc1
    S2b = np.zeros((m_rows, nz))
    S2b[fr, vy] = sc2
    S3b = np.zeros((m_rows, nz))
    S3b[dr, px] = sc3

    if pad:
        nz_p = -(-nz // 128) * 128
        m_p = -(-m_rows // 256) * 256

        def pad_mat(Mx, r, cdim):
            out = np.zeros((r, cdim))
            out[: Mx.shape[0], : Mx.shape[1]] = Mx
            return out

        def pad_vec(v, n, fill=0.0):
            out = np.full(n, fill)
            out[: v.shape[0]] = v
            return out

        Pbar = pad_mat(Pbar, nz_p, nz_p)
        Pbar[nz:, nz:] = np.eye(nz_p - nz)  # unit cost diag on dummies
        qbar = pad_vec(qbar, nz_p)
        A0bar = pad_mat(A0bar, m_p, nz_p)
        S1b = pad_mat(S1b, m_p, nz_p)
        S2b = pad_mat(S2b, m_p, nz_p)
        S3b = pad_mat(S3b, m_p, nz_p)
        G = pad_mat(G, nz_p, nz_p)
        F1 = pad_mat(F1, nz_p, nz_p)
        F2 = pad_mat(F2, nz_p, nz_p)
        F12 = pad_mat(F12, nz_p, nz_p)
        F3 = pad_mat(F3, nz_p, nz_p)
        F33 = pad_mat(F33, nz_p, nz_p)
        rho = pad_vec(rho, m_p, fill=np.clip(settings.rho_bar, RHO_MIN, RHO_MAX))
        D = pad_vec(D, nz_p, fill=1.0)
        E = pad_vec(E, m_p, fill=1.0)

    # ---- compact correction factorization (see ADMMProblem.gsel): groups of
    # width gw = ceil(L/64)*64 so the per-problem [c1|c2|s] weight mask is a
    # pair of aligned iota compares in the kernel
    L = fr.shape[0]  # Nx+1 horizon blocks
    nz_now, m_now = Pbar.shape[0], A0bar.shape[0]
    gw = -(-L // 64) * 64
    jj = np.arange(L)
    gsel = np.zeros((nz_now, 3 * gw))
    gsel[vx, jj] = sc1
    gsel[vy, gw + jj] = sc2
    gsel[px, 2 * gw + jj] = sc3
    scat = np.zeros((3 * gw, m_now))
    scat[jj, fr] = 1.0
    scat[gw + jj, fr] = 1.0
    scat[2 * gw + jj, dr] = 1.0
    rsel = np.zeros((m_now, 3 * gw))
    rsel[fr, jj] = sc1
    rsel[fr, gw + jj] = sc2
    rsel[dr, 2 * gw + jj] = sc3
    gscat = np.zeros((3 * gw, nz_now))
    gscat[jj, vx] = 1.0
    gscat[gw + jj, vy] = 1.0
    gscat[2 * gw + jj, px] = 1.0

    AK = np.concatenate([A0bar, S1b, S2b, S3b], axis=0)

    # ---- shared-basis ('eig') solve data: per-combo generalized
    # eigendecompositions + the debris Woodbury factor (see ops.admm_eig).
    eig_data = {}
    if settings.solve_mode == "eig":
        import scipy.linalg as sla

        base = Pbar + settings.sigma * np.eye(nz_now)
        # rebuild the F-structure on the (possibly padded) dims: weights for
        # the debris factor Z = [U3 | E3], U3[:, j] = rho_j*sc3_j * ad_j
        w3 = rho[dr] * sc3
        Kw = 2 * gw
        Z = np.zeros((nz_now, Kw))
        for j in range(L):
            Z[:, j] = w3[j] * A0bar[dr[j], :]
            Z[px[j], gw + j] = 1.0
        w33 = np.zeros(Kw)
        w33[gw : gw + L] = rho[dr] * sc3**2
        K1 = np.zeros((Kw, Kw))
        K1[:gw, gw:] = np.eye(gw)
        K1[gw:, :gw] = np.eye(gw)

        A_st, W_st, lam_st, YT_st = [], [], [], []
        for combo in range(4):
            c1v = 1.0 if combo & 2 else -1.0
            c2v = 1.0 if combo & 1 else -1.0
            H = G + c1v * F1 + c2v * F2 + c1v * c2v * F12
            lam, V = sla.eigh(H, base)
            A_st.append(A0bar + c1v * S1b + c2v * S2b)
            W_st.append(V)
            lam_st.append(lam)
            YT_st.append(Z.T @ V)
        # debris-row equilibration term (eig_deb_equil_smax): scaling row j
        # by alpha adds (alpha^2-1)*rho_j*ad_j ad_j' to the correction; in
        # the Z basis that is diagonal on the U-block with entries
        # 1/(rho_j*sc3_j^2) (U3_j = rho_j*sc3_j * ad_j)
        wuu = np.zeros(Kw)
        wuu[:L] = 1.0 / (rho[dr] * sc3**2)
        eig_data = dict(
            eig_A=jnp.asarray(np.stack(A_st), dtype=dtype),
            eig_W=jnp.asarray(np.stack(W_st), dtype=dtype),
            eig_lam=jnp.asarray(np.stack(lam_st), dtype=dtype),
            eig_YT=jnp.asarray(np.stack(YT_st), dtype=dtype),
            eig_w33row=jnp.asarray(w33[None, :], dtype=dtype),
            eig_w33col=jnp.asarray(np.tile(w33[:, None], (1, Kw)), dtype=dtype),
            eig_K1=jnp.asarray(K1, dtype=dtype),
            eig_wuurow=jnp.asarray(wuu[None, :], dtype=dtype),
            eig_wuucol=jnp.asarray(np.tile(wuu[:, None], (1, Kw)), dtype=dtype),
        )

    as_dt = lambda x: jnp.asarray(x, dtype=dtype)
    as_i = lambda x: jnp.asarray(x, dtype=jnp.int32)
    return ADMMProblem(
        Pbar=as_dt(Pbar),
        qbar=as_dt(qbar),
        A0bar=as_dt(A0bar),
        AK=as_dt(AK),
        G=as_dt(G),
        Fstack=as_dt(np.stack([F1, F2, F12, F3, F33])),
        rho_vec=as_dt(rho),
        D=as_dt(D),
        E=as_dt(E),
        Dinv=as_dt(1.0 / D),
        Einv=as_dt(1.0 / E),
        c=as_dt(c),
        sc1=as_dt(sc1),
        sc2=as_dt(sc2),
        sc3=as_dt(sc3),
        fun_rows=as_i(fr),
        deb_rows=as_i(dr),
        velx_cols=as_i(vx),
        vely_cols=as_i(vy),
        posx_cols=as_i(px),
        gsel=as_dt(gsel),
        scat=as_dt(scat),
        rsel=as_dt(rsel),
        gscat=as_dt(gscat),
        **eig_data,
    )


def init_state(
    prob: ADMMProblem, batch: int, settings: ADMMSettings = ADMMSettings()
) -> ADMMState:
    nz = prob.Pbar.shape[0]
    m = prob.A0bar.shape[0]
    dt = prob.Pbar.dtype
    if settings.solve_mode == "pallas":
        minv_shape = (batch, nz, nz)
    elif settings.solve_mode == "eig":
        # 'eig' reuses the minv slot for the (K, K) debris Woodbury inner
        # inverse T^{-1} — 4x smaller than the old per-problem Minv
        minv_shape = (batch, prob.eig_YT.shape[1], prob.eig_YT.shape[1])
    else:
        minv_shape = (batch, 1, 1)
    return ADMMState(
        xbar=jnp.zeros((batch, nz), dtype=dt),
        ybar=jnp.zeros((batch, m), dtype=dt),
        zbar=jnp.zeros((batch, m), dtype=dt),
        rho_scale=jnp.ones((batch,), dtype=dt),
        minv=jnp.zeros(minv_shape, dtype=dt),
        minv_ok=jnp.zeros((), dtype=bool),
        ref_coef=jnp.zeros((batch, 4), dtype=dt),
    )


# --------------------------------------------------------------------------
# batched structured matvecs (scaled space)
# --------------------------------------------------------------------------

def _matvec_A(prob: ADMMProblem, coeffs, x):
    """Abar_k @ x for the whole batch as ONE shared dense matmul.

    Abar_k = A0bar + c1 S1bar + c2 S2bar + s S3bar with the one-hot patterns
    stacked into AK; corrections come out of the same matmul and combine with
    per-problem scalars (TPU scatters would serialize; matmuls ride the MXU).
    x: (B, nz) -> (B, m)."""
    c1, c2, s = coeffs
    m = prob.A0bar.shape[0]
    y = x @ prob.AK.T  # (B, 4m)
    return (
        y[:, :m]
        + c1[:, None] * y[:, m : 2 * m]
        + c2[:, None] * y[:, 2 * m : 3 * m]
        + s[:, None] * y[:, 3 * m :]
    )


def _matvec_AT(prob: ADMMProblem, coeffs, w):
    """Abar_k' @ w for the whole batch as ONE shared dense matmul:
    A' w = [w, c1 w, c2 w, s w] @ AK. w: (B, m) -> (B, nz)."""
    c1, c2, s = coeffs
    w4 = jnp.concatenate(
        [w, c1[:, None] * w, c2[:, None] * w, s[:, None] * w], axis=1
    )
    return w4 @ prob.AK


def _build_M(prob: ADMMProblem, coeffs, rho_scale, sigma):
    """Batched normal matrix M_k = Pbar + sigma I + theta_k (G + sum w_t F_t)."""
    c1, c2, s = coeffs
    w = jnp.stack([c1, c2, c1 * c2, s, s * s], axis=-1)  # (B, 5)
    corr = jnp.tensordot(w, prob.Fstack, axes=([1], [0]))  # (B, nz, nz)
    nz = prob.Pbar.shape[0]
    base = prob.Pbar + sigma * jnp.eye(nz, dtype=prob.Pbar.dtype)
    return base[None] + rho_scale[:, None, None] * (prob.G[None] + corr)


# --------------------------------------------------------------------------
# solve
# --------------------------------------------------------------------------

def admm_solve(
    prob: ADMMProblem,
    coeffs,
    l: jnp.ndarray,
    u: jnp.ndarray,
    state: ADMMState,
    settings: ADMMSettings = ADMMSettings(),
    qbar: Optional[jnp.ndarray] = None,
    active: Optional[jnp.ndarray] = None,
) -> ADMMResult:
    """Solve the batch of QPs defined by (prob, coeffs, l, u), warm-started.

    Args:
        coeffs: tuple (c1, c2, s) of (B,) arrays — the dynamic A entries.
        l, u: (B, m) UNscaled bounds.
        state: warm-start iterates from the previous control step.
        qbar: optional per-problem scaled linear cost (B, nz); defaults to the
            shared ``prob.qbar``.
        active: optional (B,) bool mask — inactive problems are skipped
            entirely (iterates frozen, status UNSOLVED). The rollout passes
            its ``alive`` mask: batch iteration count is the max over
            problems, so a single dead scenario frozen in a non-convergent
            state would otherwise drag every remaining control step to the
            iteration cap.
    Returns an ADMMResult with the unscaled primal solution and OSQP-style
    per-problem status codes.
    """
    # TPU MXU default precision is bf16 multiplies — fatal for ADMM
    # convergence in fp32; force full-precision matmuls for the whole solve
    # (the Pallas kernels set their own per-dot precision from
    # settings.mxu_precision)
    with jax.default_matmul_precision("highest"):
        return _admm_solve_impl(prob, coeffs, l, u, state, settings, qbar, active)


def _admm_solve_impl(prob, coeffs, l, u, state, settings, qbar, active=None):
    dt = prob.Pbar.dtype
    B = l.shape[0]
    if qbar is None:
        qbar = jnp.broadcast_to(prob.qbar, (B,) + prob.qbar.shape[-1:])

    # pad bounds to the problem's (possibly MXU-aligned) row count with inert
    # l = u = 0 rows (see prepare_problem(pad=True))
    m_prob = prob.A0bar.shape[0]
    if l.shape[1] < m_prob:
        padw = ((0, 0), (0, m_prob - l.shape[1]))
        l = jnp.pad(l, padw)
        u = jnp.pad(u, padw)

    lbar = prob.E * l
    ubar = prob.E * u
    if active is None:
        active = jnp.ones((B,), dtype=bool)
    if settings.solve_mode == "pallas":
        return _solve_pallas(prob, coeffs, lbar, ubar, state, settings, qbar, active)
    if settings.solve_mode == "eig":
        return _solve_eig(prob, coeffs, lbar, ubar, state, settings, qbar, active)
    sigma = jnp.asarray(settings.sigma, dtype=dt)
    alpha = jnp.asarray(settings.alpha, dtype=dt)

    def factor(rho_scale):
        M = _build_M(prob, coeffs, rho_scale, sigma)
        return jnp.linalg.cholesky(M)  # (B, nz, nz), batched

    def solve_M(L, rhs):
        # batched triangular solves with the per-problem Cholesky factor
        ylow = jax.lax.linalg.triangular_solve(
            L, rhs[..., None], left_side=True, lower=True, transpose_a=False
        )
        xs = jax.lax.linalg.triangular_solve(
            L, ylow, left_side=True, lower=True, transpose_a=True
        )
        return xs[..., 0]

    def residuals(x, y, z):
        Ax = _matvec_A(prob, coeffs, x)
        rp_vec = prob.Einv * (Ax - z)
        rp = jnp.abs(rp_vec).max(axis=1)
        rp_rel = jnp.maximum(
            jnp.abs(prob.Einv * Ax).max(axis=1), jnp.abs(prob.Einv * z).max(axis=1)
        )
        Px = x @ prob.Pbar
        Aty = _matvec_AT(prob, coeffs, y)
        cinv = 1.0 / prob.c
        rd = cinv * jnp.abs(prob.Dinv * (Px + qbar + Aty)).max(axis=1)
        rd_rel = cinv * jnp.maximum(
            jnp.abs(prob.Dinv * Px).max(axis=1),
            jnp.maximum(
                jnp.abs(prob.Dinv * Aty).max(axis=1),
                jnp.abs(prob.Dinv * qbar).max(axis=1),
            ),
        )
        return rp, rp_rel, rd, rd_rel

    def prim_infeas(dy):
        """Farkas certificate in SCALED space (as OSQP does): unscaled tests
        false-positive on feasible problems with large ||x||, since
        ||A'v|| <= eps*||v|| admits support values of order ||x||*eps*||v||."""
        # project delta-y onto the polar of the recession cone of [l, u]
        u_inf = ~jnp.isfinite(ubar)
        l_inf = ~jnp.isfinite(lbar)
        v = jnp.where(u_inf & l_inf, 0.0, dy)
        v = jnp.where(u_inf & ~l_inf, jnp.minimum(v, 0.0), v)
        v = jnp.where(l_inf & ~u_inf, jnp.maximum(v, 0.0), v)
        nv = jnp.abs(v).max(axis=1)
        Atv = _matvec_AT(prob, coeffs, v)
        t1 = jnp.abs(Atv).max(axis=1) <= settings.eps_pinf * nv
        vp = jnp.maximum(v, 0.0)
        vm = jnp.minimum(v, 0.0)
        sup = (jnp.where(vp > 0, ubar, 0.0) * vp).sum(axis=1) + (
            jnp.where(vm < 0, lbar, 0.0) * vm
        ).sum(axis=1)
        # decisively-negative support margin: with only ||A'v|| <= eps||v||,
        # Farkas admits |sup| ~ ||x||_1 * eps * ||v|| for feasible problems;
        # genuine constraint conflicts in this family give sup/||v|| ~ -1e3
        thresh = max(settings.eps_pinf, settings.pinf_support_margin)
        t2 = (sup <= -thresh * nv) & jnp.isfinite(sup)
        # absolute gate (as OSQP): near convergence delta-y -> 0 and the
        # normalized certificate tests become pure round-off noise
        return t1 & t2 & (nv > settings.eps_pinf)

    def dual_infeas(dx):
        """Unboundedness certificate in SCALED space (see prim_infeas)."""
        v = dx
        nv = jnp.abs(v).max(axis=1)
        Pv = dx @ prob.Pbar
        t1 = jnp.abs(Pv).max(axis=1) <= settings.eps_dinf * nv
        qv = (qbar * v).sum(axis=1)
        t2 = qv <= -settings.eps_dinf * nv
        Av = _matvec_A(prob, coeffs, dx)
        eps = settings.eps_dinf * nv[:, None]
        up_ok = jnp.where(jnp.isfinite(ubar), Av <= eps, True).all(axis=1)
        lo_ok = jnp.where(jnp.isfinite(lbar), Av >= -eps, True).all(axis=1)
        # absolute gate (as OSQP); see prim_infeas
        return t1 & t2 & up_ok & lo_ok & (nv > settings.eps_dinf)

    def one_iter(carry, _):
        x, y, z, L, rho_scale = carry
        rho = rho_scale[:, None] * prob.rho_vec
        rhs = sigma * x - qbar + _matvec_AT(prob, coeffs, rho * z - y)
        xt = solve_M(L, rhs)
        zt = _matvec_A(prob, coeffs, xt)
        x_n = alpha * xt + (1 - alpha) * x
        z_tmp = alpha * zt + (1 - alpha) * z
        z_n = jnp.clip(z_tmp + y / rho, lbar, ubar)
        y_n = y + rho * (z_tmp - z_n)
        return (x_n, y_n, z_n, L, rho_scale), None

    n_checks = settings.max_iter // settings.check_every
    adapt_stride = max(1, settings.adaptive_rho_interval // settings.check_every)

    def cond(carry):
        done, chunk = carry[5], carry[7]
        return (~jnp.all(done)) & (chunk < n_checks)

    def body(carry):
        (x, y, z, rp_prev, rd_prev, done, status, chunk, L, rho_scale,
         best_rp, best_rd, last_prog, done_chunk, tp_prev, td_prev) = carry
        done_in = done
        (x_n, y_n, z_n, _, _), _ = jax.lax.scan(
            one_iter,
            (x, y, z, L, rho_scale),
            None,
            length=settings.check_every,
        )
        # infeasibility certificates test the delta ACCUMULATED over the whole
        # check interval, not a single-iteration delta: along a divergence ray
        # successive deltas share the recession direction, so the accumulated
        # delta carries check_every-fold the signal while active-set chatter
        # (and, at fp32, round-off of order eps*||y||, which exceeds a
        # single-iteration delta once ||y|| grows along the ray) averages out.
        # Single-iteration deltas made detection a per-chunk coin flip and
        # stalled fp32 solves at the iteration cap (measured; the NumPy/C++
        # oracles apply the identical rule).
        dx = x_n - x
        dy = y_n - y
        rp, rp_rel, rd, rd_rel = residuals(x_n, y_n, z_n)
        # done problems keep the residuals they finished at (x_n keeps
        # drifting for them; their iterates are frozen below)
        rp = jnp.where(done, rp_prev, rp)
        rd = jnp.where(done, rd_prev, rd)
        tp = jnp.where(done, tp_prev,
                       settings.eps_abs + settings.eps_rel * rp_rel)
        td = jnp.where(done, td_prev,
                       settings.eps_abs + settings.eps_rel * rd_rel)
        conv = (rp <= settings.eps_abs + settings.eps_rel * rp_rel) & (
            rd <= settings.eps_abs + settings.eps_rel * rd_rel
        )
        pinf = prim_infeas(dy)
        dinf = dual_infeas(dx)
        new_status = jnp.where(
            conv,
            SOLVED,
            jnp.where(pinf, PRIMAL_INFEASIBLE, jnp.where(dinf, DUAL_INFEASIBLE, UNSOLVED)),
        ).astype(jnp.int32)
        status = jnp.where(done, status, new_status)
        newly_done = conv | pinf | dinf
        # freeze finished problems
        keep = done[:, None]
        x = jnp.where(keep, x, x_n)
        y = jnp.where(keep, y, y_n)
        z = jnp.where(keep, z, z_n)
        done = done | newly_done

        if settings.stall_exit_chunks:
            thr = jnp.where(chunk + 1 >= settings.stall_tighten_chunks,
                            settings.stall_improve2, settings.stall_improve)
            improved = (rp <= thr * best_rp) | (rd <= thr * best_rd)
            last_prog = jnp.where(done | improved, chunk + 1, last_prog)
            stalled = (~done) & (chunk + 1 - last_prog >= settings.stall_exit_chunks)
            status = jnp.where(stalled, MAX_ITER, status)
            done = done | stalled
        best_rp = jnp.minimum(best_rp, rp)
        best_rd = jnp.minimum(best_rd, rd)

        # OSQP-style mid-solve rho adaptation (every adaptive_rho_interval
        # iterations): per-problem scalar rescale + batched refactor, executed
        # only when some problem actually triggers
        if settings.adaptive_rho:
            num = rp / jnp.maximum(rp_rel, 1e-10)
            den = jnp.maximum(rd / jnp.maximum(rd_rel, 1e-10), 1e-10)
            ratio = jnp.sqrt(num / den)
            trig = (
                ((ratio > settings.adaptive_rho_tol)
                 | (ratio < 1.0 / settings.adaptive_rho_tol))
                & ~done
                & ((chunk + 1) % adapt_stride == 0)
            )
            new_scale = jnp.where(trig, rho_scale * ratio, rho_scale)
            # keep eq rows (rho * 1e3) within RHO_MAX: the structured normal
            # matrix scales rho uniformly, so clamp the scalar instead of
            # clipping per-row like OSQP does
            new_scale = jnp.clip(
                new_scale,
                RHO_MIN / settings.rho_bar,
                RHO_MAX / (settings.rho_bar * RHO_EQ_SCALE),
            )
            L = jax.lax.cond(jnp.any(trig), lambda: factor(new_scale), lambda: L)
            rho_scale = new_scale

        done_chunk = jnp.where(done & ~done_in, chunk + 1, done_chunk)
        return (x, y, z, rp, rd, done, status, chunk + 1, L, rho_scale,
                best_rp, best_rd, last_prog, done_chunk, tp, td)

    rp0 = jnp.full((B,), jnp.inf, dtype=dt)
    carry0 = (
        state.xbar,
        state.ybar,
        state.zbar,
        rp0,
        rp0,
        ~active,  # inactive problems start done (status UNSOLVED, frozen)
        jnp.zeros((B,), dtype=jnp.int32),
        jnp.zeros((), dtype=jnp.int32),
        factor(state.rho_scale),
        state.rho_scale,
        rp0,  # best_rp
        rp0,  # best_rd
        jnp.zeros((B,), dtype=jnp.int32),  # last progress chunk
        jnp.zeros((B,), dtype=jnp.int32),  # done_chunk
        jnp.zeros((B,), dtype=dt),  # pri tol at exit
        jnp.zeros((B,), dtype=dt),  # dua tol at exit
    )
    (x, y, z, rp, rd, done, status, chunks, _, rho_scale,
     _, _, _, done_chunk, rp_tol, rd_tol) = jax.lax.while_loop(
        cond, body, carry0)
    status = jnp.where(done, status, MAX_ITER).astype(jnp.int32)
    done_chunk = jnp.where(active & (done_chunk == 0), chunks, done_chunk)

    return ADMMResult(
        x=prob.D * x,
        status=status,
        iters=chunks * settings.check_every,
        pri_res=rp,
        dua_res=rd,
        state=ADMMState(xbar=x, ybar=y, zbar=z, rho_scale=rho_scale,
                        minv=state.minv, minv_ok=state.minv_ok,
                        ref_coef=state.ref_coef),
        done_iters=done_chunk * settings.check_every,
        pri_tol=rp_tol,
        dua_tol=rd_tol,
    )


def _tile_width(B: int, pallas_tile: int) -> int:
    bt = max(1, pallas_tile)
    while B % bt:
        bt //= 2
    return max(bt, 1)


def _solve_pallas(prob, coeffs, lbar, ubar, state, settings, qbar, active):
    """Fused-chunk solve path: one Pallas kernel launch per check interval,
    Newton-Schulz inverse maintenance instead of factorization (see
    ops.admm_pallas for the rationale).

    Straggler cascade: a full-batch loop while most problems are working,
    then — each time the active count fits half the current lane — the
    stragglers are compacted (argsort gather) into a lane of half the width
    and iterated there, down to ~``B // overtime_div`` slots. Per-problem
    math is independent, so the gathers are exact; the cascade exists
    because the 4000-iteration cap-bound problems (the reference's own OSQP
    budget, `trajectorySimulate.py:296` with default settings) otherwise
    keep every tile of the full batch busy streaming inverses for the whole
    cap."""
    from mpc_arpo_project_tpu.ops import admm_pallas

    dt = prob.Pbar.dtype
    B = lbar.shape[0]
    nz = prob.Pbar.shape[0]
    m = prob.A0bar.shape[0]
    bt = _tile_width(B, settings.pallas_tile)
    c1, c2, s = coeffs
    coef = jnp.stack([jnp.ones_like(c1), c1, c2, s], axis=1)
    sigma = float(settings.sigma)

    # shared structure stack for IN-KERNEL normal-matrix construction:
    # M_k = base + rho_k*(G + c1 F1 + c2 F2 + c1c2 F12 + s F3 + s^2 F33) —
    # the batched (B, nz, nz) M tensor is never materialized in HBM and the
    # refresh kernel skips tiles with no needy problem (see ns_fused)
    ns_stack = jnp.concatenate(
        [(prob.Pbar + sigma * jnp.eye(nz, dtype=dt))[None], prob.G[None],
         prob.Fstack], axis=0)
    # the same 7 matrices lane-concatenated for the chunk kernel's structured
    # M v refinement products (see admm_pallas.matvec_M)
    stack7 = jnp.concatenate([ns_stack[t] for t in range(7)], axis=1)

    def make_ns_weights(coef_l):
        cc1, cc2, ss = coef_l[:, 1], coef_l[:, 2], coef_l[:, 3]

        def ns_weights(rho_scale):
            r = rho_scale
            return jnp.stack(
                [jnp.ones_like(r), r, r * cc1, r * cc2, r * cc1 * cc2,
                 r * ss, r * ss * ss, jnp.zeros_like(r)], axis=1)

        return ns_weights

    def make_ns_refresh(coef_l, bt_l):
        ns_weights = make_ns_weights(coef_l)
        B_l = coef_l.shape[0]

        def full_refresh(minv, rho_scale, needmask):
            w = ns_weights(rho_scale)
            return admm_pallas.masked_safe_refresh(
                ns_stack, w, minv, needmask,
                warm_iters=settings.ns_warm_iters,
                cold_iters=settings.ns_cold_iters, bt=bt_l)

        # needy sets are usually sparse (a debris-slope drift here, a rho
        # trigger there), but a tile with ONE needy problem runs the
        # Newton-Schulz loop for all bt problems in it (the masked kernel
        # skips whole tiles only). Compact needy rows into a K-slot buffer
        # first; fall back to the full-width refresh when they don't fit.
        K = -(-max(bt_l, B_l // max(settings.refresh_compact_div, 1)) // bt_l) * bt_l
        if not settings.refresh_compact_div or K >= B_l:
            return full_refresh

        def compact_refresh(minv, rho_scale, needmask):
            def small():
                idx = jnp.argsort(~needmask, stable=True)[:K]
                w = make_ns_weights(coef_l[idx])(rho_scale[idx])
                sub = admm_pallas.masked_safe_refresh(
                    ns_stack, w, minv[idx], needmask[idx],
                    warm_iters=settings.ns_warm_iters,
                    cold_iters=settings.ns_cold_iters,
                    bt=_tile_width(K, settings.pallas_tile))
                return minv.at[idx].set(sub)

            return jax.lax.cond(
                jnp.sum(needmask) <= K,
                small,
                lambda: full_refresh(minv, rho_scale, needmask),
            )

        return compact_refresh

    # Defensive iterate sanitation: a previous solve that diverged to inf/NaN
    # (fp32 overflow along an infeasibility ray, or a since-fixed inverse
    # poisoning) would otherwise warm-start every later step non-finite and
    # permanently pin that scenario at MAX_ITER. Reset such rows to a cold
    # start; the chol/oracle path is exact and never produces them.
    it_finite = (
        jnp.isfinite(state.xbar).all(axis=1)
        & jnp.isfinite(state.ybar).all(axis=1)
        & jnp.isfinite(state.zbar).all(axis=1)
    )
    xbar0 = jnp.where(it_finite[:, None], state.xbar, 0.0)
    ybar0 = jnp.where(it_finite[:, None], state.ybar, 0.0)
    zbar0 = jnp.where(it_finite[:, None], state.zbar, 0.0)

    # Refresh gating: without refinement, even a ~4e-3-stale inverse stalls
    # ADMM (measured), but each in-kernel IR step squares the inverse error,
    # so with ir_steps >= 2 the inverse may drift ~5% between refreshes.
    # Refresh on funnel-sign flips, slope drift beyond ns_refresh_drift, rho
    # rescale, cold state, the NaN mark left by a non-converged solve, or a
    # non-finite warm-start iterate (see sanitation above).
    rc = state.ref_coef
    need = (
        (~it_finite) |
        (rc[:, 0] != c1)
        | (rc[:, 1] != c2)
        | ~(jnp.abs(rc[:, 2] - s) <= settings.ns_refresh_drift * (1.0 + jnp.abs(rc[:, 2])))
        | (rc[:, 3] != state.rho_scale)
        | ~state.minv_ok
    ) & active  # skipped problems never refresh (a dead scenario NaN-marked
    # by a capped final solve would otherwise cold-start Newton-Schulz on
    # every remaining control step)
    ns_refresh_full = make_ns_refresh(coef, bt)
    minv0 = jax.lax.cond(
        jnp.any(need),
        lambda: ns_refresh_full(state.minv, state.rho_scale, need),
        lambda: state.minv,
    )
    ref0 = jnp.where(
        need[:, None], jnp.stack([c1, c2, s, state.rho_scale], axis=1), rc
    )

    n_checks = settings.max_iter // settings.check_every
    adapt_stride = max(1, settings.adaptive_rho_interval // settings.check_every)

    def make_loop(coef_l, qbar_l, lbar_l, ubar_l, bt_l, stop_at=None):
        """while_loop factory over a (possibly compacted) problem subset.
        ``stop_at``: also exit once the active count fits that many slots."""
        ns_refresh = make_ns_refresh(coef_l, bt_l)
        ns_weights = make_ns_weights(coef_l)

        def cond(carry):
            done, chunk = carry[5], carry[7]
            go = (~jnp.all(done)) & (chunk < n_checks)
            if stop_at is not None:
                go &= jnp.sum(~done) > stop_at
            return go

        def body(carry):
            (x, y, z, rp_prev, rd_prev, done, status, chunk, minv, rho_scale,
             best_rp, best_rd, last_prog, done_chunk) = carry
            done_in = done
            rho = rho_scale[:, None] * prob.rho_vec
            x_n, y_n, z_n, stats = admm_pallas.admm_chunk(
                minv, coef_l, qbar_l, lbar_l, ubar_l, rho, x, y, z,
                ns_weights(rho_scale),
                prob.A0bar, prob.Pbar, prob.gsel, prob.scat, prob.rsel,
                prob.gscat, stack7, prob.Einv, prob.Dinv,
                done=done,
                n_iter=settings.check_every,
                sigma=sigma,
                alpha=float(settings.alpha),
                eps_pinf=float(settings.eps_pinf),
                eps_dinf=float(settings.eps_dinf),
                pinf_margin=float(settings.pinf_support_margin),
                bt=bt_l,
                ir_steps=settings.ir_steps,
                precision=settings.mxu_precision,
                two_limb=settings.minv_two_limb,
            )
            cinv = 1.0 / prob.c
            # done problems keep their last true residuals: skipped tiles emit
            # zeroed stats blocks, which would otherwise read as a perfect
            # residual in diagnostics (ADVICE r1)
            rp = jnp.where(done, rp_prev, stats[:, 0])
            rd = jnp.where(done, rd_prev, cinv * stats[:, 2])
            rp_rel, rd_rel = stats[:, 1], cinv * stats[:, 3]
            pinf = stats[:, 4] > 0
            dinf = stats[:, 5] > 0
            conv = (rp <= settings.eps_abs + settings.eps_rel * rp_rel) & (
                rd <= settings.eps_abs + settings.eps_rel * rd_rel
            )
            new_status = jnp.where(
                conv,
                SOLVED,
                jnp.where(pinf, PRIMAL_INFEASIBLE,
                          jnp.where(dinf, DUAL_INFEASIBLE, UNSOLVED)),
            ).astype(jnp.int32)
            status = jnp.where(done, status, new_status)
            newly_done = conv | pinf | dinf
            keep = done[:, None]
            x = jnp.where(keep, x, x_n)
            y = jnp.where(keep, y, y_n)
            z = jnp.where(keep, z, z_n)
            done = done | newly_done

            if settings.stall_exit_chunks:
                thr = jnp.where(chunk + 1 >= settings.stall_tighten_chunks,
                                settings.stall_improve2,
                                settings.stall_improve)
                improved = (rp <= thr * best_rp) | (rd <= thr * best_rd)
                last_prog = jnp.where(done | improved, chunk + 1, last_prog)
                stalled = (~done) & (
                    chunk + 1 - last_prog >= settings.stall_exit_chunks)
                status = jnp.where(stalled, MAX_ITER, status)
                done = done | stalled
            best_rp = jnp.minimum(best_rp, rp)
            best_rd = jnp.minimum(best_rd, rd)

            if settings.adaptive_rho:
                num = rp / jnp.maximum(rp_rel, 1e-10)
                den = jnp.maximum(rd / jnp.maximum(rd_rel, 1e-10), 1e-10)
                ratio = jnp.sqrt(num / den)
                trig = (
                    ((ratio > settings.adaptive_rho_tol)
                     | (ratio < 1.0 / settings.adaptive_rho_tol))
                    & ~done
                    & ((chunk + 1) % adapt_stride == 0)
                )
                new_scale = jnp.where(trig, rho_scale * ratio, rho_scale)
                new_scale = jnp.clip(
                    new_scale,
                    RHO_MIN / settings.rho_bar,
                    RHO_MAX / (settings.rho_bar * RHO_EQ_SCALE),
                )
                minv = jax.lax.cond(
                    jnp.any(trig),
                    lambda: ns_refresh(minv, new_scale, trig),
                    lambda: minv,
                )
                rho_scale = new_scale

            done_chunk = jnp.where(done & ~done_in, chunk + 1, done_chunk)
            return (x, y, z, rp, rd, done, status, chunk + 1, minv,
                    rho_scale, best_rp, best_rd, last_prog, done_chunk)

        return cond, body

    # cascade widths: halve from B/2 down to ~B/overtime_div (tile-rounded,
    # strictly decreasing); empty = compaction disabled
    widths = []
    if settings.overtime_div and settings.overtime_div > 1:
        target = max(bt, B // settings.overtime_div)
        w = B // 2
        while w >= target and w >= bt:
            wq = -(-w // bt) * bt
            if 0 < wq <= B // 2 and (not widths or wq < widths[-1]):
                widths.append(wq)
            w //= 2

    rp0 = jnp.full((B,), jnp.inf, dtype=dt)
    carry0 = (
        xbar0,
        ybar0,
        zbar0,
        rp0,
        rp0,
        ~active,  # inactive problems start done (status UNSOLVED, frozen)
        jnp.zeros((B,), dtype=jnp.int32),
        jnp.zeros((), dtype=jnp.int32),
        minv0,
        state.rho_scale,
        rp0,  # best_rp
        rp0,  # best_rd
        jnp.zeros((B,), dtype=jnp.int32),  # last progress chunk
        jnp.zeros((B,), dtype=jnp.int32),  # done_chunk
    )
    cond1, body1 = make_loop(coef, qbar, lbar, ubar, bt,
                             stop_at=widths[0] if widths else None)
    carry = jax.lax.while_loop(cond1, body1, carry0)

    _CHUNK_IDX = 7  # scalar chunk counter inside the 14-tuple carry

    for li, w in enumerate(widths):
        next_stop = widths[li + 1] if li + 1 < len(widths) else None
        bt_l = _tile_width(w, settings.pallas_tile)

        def run_level(fc, _w=w, _bt=bt_l, _stop=next_stop):
            # compact stragglers to the front (stable argsort: done=False
            # first; the previous lane only stops once they fit, so idx
            # covers every active row — except at the iteration cap, where
            # leftovers are finalized as MAX_ITER below anyway)
            idx = jnp.argsort(fc[5], stable=True)[:_w]
            sub = tuple(c if i == _CHUNK_IDX else c[idx]
                        for i, c in enumerate(fc))
            cond_l, body_l = make_loop(coef[idx], qbar[idx], lbar[idx],
                                       ubar[idx], _bt, stop_at=_stop)
            sub = jax.lax.while_loop(cond_l, body_l, sub)
            return tuple(sub[i] if i == _CHUNK_IDX else c.at[idx].set(sub[i])
                         for i, c in enumerate(fc))

        carry = jax.lax.cond(jnp.any(~carry[5]), run_level, lambda fc: fc,
                             carry)

    (x, y, z, rp, rd, done, status, chunks, minv, rho_scale,
     _, _, _, done_chunk) = carry
    done_chunk = jnp.where(active & (done_chunk == 0), chunks, done_chunk)

    status = jnp.where(done, status, MAX_ITER).astype(jnp.int32)
    # record the rho the inverse currently reflects (mid-solve adaptation
    # refreshed it on any trigger); NaN-mark problems that failed to converge
    # so the next solve refreshes their inverse unconditionally
    ref_out = ref0.at[:, 3].set(rho_scale)
    ref_out = jnp.where(
        (status == MAX_ITER)[:, None],
        jnp.full_like(ref_out, jnp.nan),
        ref_out,
    )
    return ADMMResult(
        x=prob.D * x,
        status=status,
        iters=chunks * settings.check_every,
        pri_res=rp,
        dua_res=rd,
        state=ADMMState(xbar=x, ybar=y, zbar=z, rho_scale=rho_scale,
                        minv=minv, minv_ok=jnp.ones((), dtype=bool),
                        ref_coef=ref_out),
        done_iters=done_chunk * settings.check_every,
    )


def _solve_eig(prob, coeffs, lbar, ubar, state, settings, qbar, active):
    """Shared-basis solve path (see ops.admm_eig for the factorization).

    The batch is sorted by funnel-sign combo = (c1>0)*2 + (c2>0) into four
    bt-padded groups so every kernel tile is combo-pure; a per-tile combo
    index (scalar prefetch) selects A_c / W_c / YT_c inside the kernels.
    Dummy pad slots start done=True and are never scattered back. The
    per-problem rho scale enters EXACTLY through the diagonal
    1/(1 + rho_scale*lam) recomputed per chunk, so rho adaptation triggers a
    Woodbury-inner refresh only for debris-active (s != 0) problems — for
    everyone else it is free. The straggler machinery is tile-granular: the
    chunk kernel skips tiles whose problems are all done, so solver cost
    scales with active tiles at bt granularity without the row-compaction
    cascade of the 'pallas' mode.
    """
    from mpc_arpo_project_tpu.ops import admm_eig

    dt = prob.Pbar.dtype
    B = lbar.shape[0]
    nz = prob.Pbar.shape[0]
    m = prob.A0bar.shape[0]
    K = prob.eig_YT.shape[1]
    bt = _tile_width(B, settings.pallas_tile)
    c1, c2, s = coeffs
    combo = (c1 > 0).astype(jnp.int32) * 2 + (c2 > 0).astype(jnp.int32)

    # s-only correction factors: the third gather/scatter group (the first
    # two are folded into the per-combo A_c)
    gw3 = prob.gsel.shape[1]
    gw = gw3 // 3
    assert K == 2 * gw, (K, gw)
    gsel_s = prob.gsel[:, 2 * gw:]
    scat_s = prob.scat[2 * gw:]
    rsel_s = prob.rsel[:, 2 * gw:]
    gscat_s = prob.gscat[2 * gw:]

    # ---- group-pure slot assignment (padded to tile multiples), packing
    # ALIVE problems first within each combo group: dead scenarios
    # (terminated rollouts — ~half of all steps in the flagship bench) start
    # done=True, and tile skipping is all-or-nothing per tile, so leaving
    # them interleaved keeps every tile active during the pre-compaction
    # chunks no matter how few problems are actually alive. Alive-first
    # order makes early-chunk cost scale with the alive count instead.
    # A pure permutation: per-problem kernel math is row-independent, so
    # results are bit-identical regardless of slot placement.
    n_groups = 4
    n_slots = B + n_groups * bt
    oh = (combo[:, None] == jnp.arange(n_groups, dtype=jnp.int32)[None, :]
          ).astype(jnp.int32)
    counts = oh.sum(axis=0)
    padded = ((counts + bt - 1) // bt) * bt
    bounds = jnp.cumsum(padded)
    goff = bounds - padded
    cstart = jnp.cumsum(counts) - counts
    key = (combo * (2 * B) + (~active).astype(jnp.int32) * B
           + jnp.arange(B, dtype=jnp.int32))
    perm = jnp.argsort(key)  # combo-major, alive-first, batch-order stable
    combo_sorted = combo[perm]
    slot = jnp.zeros((B,), jnp.int32).at[perm].set(
        goff[combo_sorted] + jnp.arange(B, dtype=jnp.int32)
        - cstart[combo_sorted])  # (B,) unique slots
    src = jnp.full((n_slots,), B, jnp.int32).at[slot].set(
        jnp.arange(B, dtype=jnp.int32))
    dummy = src >= B
    srcc = jnp.clip(src, 0, B - 1)
    n_tiles = n_slots // bt
    tpos = jnp.arange(n_tiles, dtype=jnp.int32) * bt
    tile_combo = (tpos[:, None] >= bounds[None, :n_groups - 1]).sum(
        axis=1).astype(jnp.int32)

    gat = lambda a: a[srcc]
    c1s, c2s, ss = gat(c1), gat(c2), gat(s)
    rsc = gat(state.rho_scale)
    lb, ub = gat(lbar), gat(ubar)
    qb = gat(qbar)
    act = gat(active) & ~dummy
    ref = gat(state.ref_coef)
    tinv = gat(state.minv)
    lam_s = prob.eig_lam[gat(combo)]  # (n_slots, nz)

    # Defensive sanitation (see _solve_pallas): non-finite warm iterates or a
    # poisoned inner inverse reset to cold values
    xg, yg, zg = gat(state.xbar), gat(state.ybar), gat(state.zbar)
    it_finite = (
        jnp.isfinite(xg).all(axis=1)
        & jnp.isfinite(yg).all(axis=1)
        & jnp.isfinite(zg).all(axis=1)
    )
    x0 = jnp.where(it_finite[:, None], xg, 0.0)
    y0 = jnp.where(it_finite[:, None], yg, 0.0)
    z0 = jnp.where(it_finite[:, None], zg, 0.0)
    tv_finite = jnp.isfinite(tinv).all(axis=(1, 2))
    tinv = jnp.where(tv_finite[:, None, None], tinv, 0.0)

    # ---- debris-row equilibration (eig_deb_equil_smax docstring): run the
    # solve on the per-problem alpha-scaled problem. alpha == 1 (bit-
    # identical) unless |s| > smax; bounds and slacks scale by alpha on
    # debris rows, duals by 1/alpha, and the correction coefficients in the
    # kernel/refresh become (al^2 s, al^2 s^2, al^2 - 1).
    smax = float(settings.eig_deb_equil_smax)

    def al_of(ssv):
        if smax <= 0:
            return jnp.ones_like(ssv)
        sa = jnp.abs(ssv)
        # non-finite s (exact vertex crossing: the reference's unguarded
        # (y-vy)/(x-vx) can yield inf) must NOT equilibrate: smax/inf = 0
        # collides with the kernel's 0-means-disabled sentinel while the
        # pre-warped bounds would see rowsc=0 (inf*0=NaN) — leave alpha=1
        # and let the nan-reset machinery own that row
        return jnp.where(jnp.isfinite(ssv) & (sa > smax),
                         smax / sa, jnp.ones_like(ssv))

    dmask_m = jnp.max(scat_s, axis=0)  # (m,) 1.0 on debris rows

    def rowsc_of(ssv):
        return 1.0 + (al_of(ssv)[:, None] - 1.0) * dmask_m[None, :]

    rowsc0 = rowsc_of(ss)
    lb = lb * rowsc0
    ub = ub * rowsc0
    z0 = z0 * rowsc0
    y0 = y0 / rowsc0

    sz0 = ss != 0.0
    # exact refresh gating: no iterative refinement in this mode, so T^{-1}
    # must reflect the CURRENT (combo, r, s) whenever the correction is live
    need = act & sz0 & (
        (ref[:, 0] != c1s) | (ref[:, 1] != c2s) | (ref[:, 2] != ss)
        | (ref[:, 3] != rsc) | ~tv_finite
    )

    # slot-space per-problem data that compaction permutes along with the
    # carry (src rides along so the final scatter uses the permuted map)
    sdata = dict(qb=qb, lb=lb, ub=ub, c1s=c1s, c2s=c2s, ss=ss, lam=lam_s,
                 src=src)

    def dg_of(sd, r):
        return 1.0 / (1.0 + r[:, None] * sd["lam"])

    def scal_of(sd, r):
        return jnp.concatenate(
            [r[:, None], sd["ss"][:, None], al_of(sd["ss"])[:, None],
             jnp.zeros((n_slots, 5), dtype=dt)],
            axis=1)

    cap_div = max(0, int(settings.eig_refresh_cap_div))
    cap = n_slots // cap_div if cap_div > 1 else n_slots

    def refresh_rows(combo_r, scal_r, dg_r, tv_r, mask_r):
        return admm_eig.tinv_safe_refresh(
            combo_r, scal_r, dg_r, tv_r, mask_r, prob.eig_YT,
            prob.eig_w33col, warm_iters=settings.eig_warm_iters,
            cold_iters=settings.eig_cold_iters, bt=bt,
            precision=settings.eig_refresh_precision,
            wuucol=prob.eig_wuucol,
            cold_cap=(max(2 * bt, cap) if cap_div > 1 else 0))

    def refresh(sd, tv, r, mask):
        combo_r = ((sd["c1s"] > 0).astype(jnp.int32) * 2
                   + (sd["c2s"] > 0).astype(jnp.int32))
        scal_r, dg_r = scal_of(sd, r), dg_of(sd, r)
        if cap >= n_slots:
            return refresh_rows(combo_r, scal_r, dg_r, tv, mask)

        def compacted():
            # needy rows first (stable: slot order); bit-identical to the
            # full-width refresh because per-row math is independent and
            # non-needy rows pass through inside tinv_refresh anyway
            idx = jnp.argsort(~mask, stable=True)[:cap]
            sub = refresh_rows(combo_r[idx], scal_r[idx], dg_r[idx],
                               tv[idx], mask[idx])
            return tv.at[idx].set(sub)

        def full():
            return refresh_rows(combo_r, scal_r, dg_r, tv, mask)

        return jax.lax.cond(jnp.sum(mask) <= cap, compacted, full)

    tinv = jax.lax.cond(jnp.any(need),
                        lambda: refresh(sdata, tinv, rsc, need),
                        lambda: tinv)
    ref = jnp.where(need[:, None],
                    jnp.stack([c1s, c2s, ss, rsc], axis=1), ref)

    sigma = float(settings.sigma)
    n_checks = settings.max_iter // settings.check_every
    adapt_stride = max(1, settings.adaptive_rho_interval // settings.check_every)

    def make_cond(end, mult):
        def cond(carry):
            done, chunk = carry[5], carry[7]
            return (~jnp.all(done)) & (chunk + mult <= end)
        return cond

    def make_body(sd, mult):
        sz = sd["ss"] != 0.0

        def body(carry):
            (x, y, z, rp_prev, rd_prev, done, status, chunk, tinv, rho_scale,
             ref, best_rp, best_rd, last_prog, done_chunk, tp_prev,
             td_prev, rescue_cnt, post_rescue) = carry
            done_in = done
            nc = chunk + mult
            x_n, y_n, z_n, stats = admm_eig.eig_chunk(
                tile_combo, tinv, scal_of(sd, rho_scale), sd["qb"], sd["lb"],
                sd["ub"], dg_of(sd, rho_scale), x, y, z,
                prob.eig_A, prob.eig_W, prob.eig_YT, prob.Pbar, prob.eig_K1,
                prob.eig_w33row, gsel_s, scat_s, rsel_s, gscat_s,
                prob.rho_vec, prob.Einv, prob.Dinv,
                done=done,
                n_iter=settings.check_every * mult,
                sigma=sigma,
                alpha=float(settings.alpha),
                eps_pinf=float(settings.eps_pinf),
                eps_dinf=float(settings.eps_dinf),
                pinf_margin=float(settings.pinf_support_margin),
                bt=bt,
                precision=settings.mxu_precision,
                apply=settings.eig_apply,
                wuu_row=prob.eig_wuurow,
                dmask=dmask_m.reshape(1, -1),
            )
            cinv = 1.0 / prob.c
            rp = jnp.where(done, rp_prev, stats[:, 0])
            rd = jnp.where(done, rd_prev, cinv * stats[:, 2])
            rp_rel, rd_rel = stats[:, 1], cinv * stats[:, 3]
            tp = jnp.where(done, tp_prev,
                           settings.eps_abs + settings.eps_rel * rp_rel)
            td = jnp.where(done, td_prev,
                           settings.eps_abs + settings.eps_rel * rd_rel)
            if settings.eig_nan_reset:
                # fp32 overflow/NaN mid-solve: measured at sigma=0.01 (the
                # round-3 success-gap diagnostic), every MAX_ITER exit had
                # NaN residuals — debris-window rows blow up in fp32 and
                # then burn the whole stall window on a poisoned iterate,
                # while the fp64 oracle SOLVES those same steps. Cold-
                # restart the row in place (its residual reads inf so it
                # cannot certify this chunk; the stall clock still bounds
                # repeat offenders). Healthy rows are untouched.
                badrow = (~jnp.isfinite(rp) | ~jnp.isfinite(rd)) & ~done

                def _reset(t):
                    x_, y_, z_ = t
                    b = badrow[:, None]
                    return (jnp.where(b, 0.0, x_), jnp.where(b, 0.0, y_),
                            jnp.where(b, 0.0, z_))

                x_n, y_n, z_n = jax.lax.cond(
                    jnp.any(badrow), _reset, lambda t: t, (x_n, y_n, z_n))
                rp = jnp.where(badrow, jnp.inf, rp)
                rd = jnp.where(badrow, jnp.inf, rd)
                # a poisoned chunk's exit tolerances are inf too (rp_rel
                # overflows with rp); zero them so telemetry reports the raw
                # inf residual instead of the NaN ratio inf/inf (the round-3
                # sigma=0.01 diagnostic recorded exactly that NaN)
                tp = jnp.where(badrow, 0.0, tp)
                td = jnp.where(badrow, 0.0, td)
            pinf = stats[:, 4] > 0
            dinf = stats[:, 5] > 0
            # certificate blackout for the chunk right after a rho rescue:
            # the Farkas deltas (dy, dx) span the operator change, which
            # fires spurious PINF on feasible problems (measured at
            # sigma=0.01: 5 -> ~170 PINF steps without this mask)
            pinf = pinf & ~post_rescue
            dinf = dinf & ~post_rescue
            if settings.eig_nan_reset:
                # the kernel's sign-arithmetic infeasibility flags have no
                # finiteness guards (unlike the XLA path's isfinite(sup)
                # gate): a poisoned chunk can fire a garbage certificate and
                # permanently finalize the row the reset just rescued
                pinf = pinf & ~badrow
                dinf = dinf & ~badrow
            conv = (rp <= settings.eps_abs + settings.eps_rel * rp_rel) & (
                rd <= settings.eps_abs + settings.eps_rel * rd_rel
            )
            # an inf rp_rel would make the tolerance inf and spuriously
            # "converge" a finite-but-wrong residual; require finite tols
            conv = conv & jnp.isfinite(rp_rel) & jnp.isfinite(rd_rel)
            new_status = jnp.where(
                conv,
                SOLVED,
                jnp.where(pinf, PRIMAL_INFEASIBLE,
                          jnp.where(dinf, DUAL_INFEASIBLE, UNSOLVED)),
            ).astype(jnp.int32)
            status = jnp.where(done, status, new_status)
            newly_done = conv | pinf | dinf
            keep = done[:, None]
            x = jnp.where(keep, x, x_n)
            y = jnp.where(keep, y, y_n)
            z = jnp.where(keep, z, z_n)
            done = done | newly_done

            if settings.stall_exit_chunks:
                thr = jnp.where(nc >= settings.stall_tighten_chunks,
                                settings.stall_improve2,
                                settings.stall_improve)
                improved = (rp <= thr * best_rp) | (rd <= thr * best_rd)
                last_prog = jnp.where(done | improved, nc, last_prog)
                stalled = (~done) & (
                    nc - last_prog >= settings.stall_exit_chunks)
                status = jnp.where(stalled, MAX_ITER, status)
                done = done | stalled
            best_rp = jnp.minimum(best_rp, rp)
            best_rd = jnp.minimum(best_rd, rd)

            rescue = jnp.zeros_like(done)
            if settings.adaptive_rho:
                num = rp / jnp.maximum(rp_rel, 1e-10)
                den = jnp.maximum(rd / jnp.maximum(rd_rel, 1e-10), 1e-10)
                ratio = jnp.sqrt(num / den)
                trig = (
                    ((ratio > settings.adaptive_rho_tol)
                     | (ratio < 1.0 / settings.adaptive_rho_tol))
                    & ~done
                    & (nc % adapt_stride == 0)
                )
                if settings.eig_rho_rescue and settings.stall_exit_chunks:
                    # stuck-row rho rescue (see ADMMSettings.eig_rho_rescue):
                    # unconverged + near tolerance + no residual progress for
                    # eig_rescue_chunks -> force a rho rescale through the
                    # adaptation deadband and restart the stall clock
                    if settings.eig_rescue_mode == "dual":
                        gate = (rp <= tp) & (rd > td)
                    else:
                        nm = settings.eig_rescue_near
                        gate = ((rp <= nm * jnp.maximum(tp, 1e-30))
                                & (rd <= nm * jnp.maximum(td, 1e-30))
                                & ((rp > tp) | (rd > td)))
                    rescue = (
                        (~done) & gate
                        & (nc - last_prog >= settings.eig_rescue_chunks)
                        & (rescue_cnt < settings.eig_rescue_max)
                        & jnp.isfinite(ratio)
                    )
                    trig = trig | rescue
                    last_prog = jnp.where(rescue, nc, last_prog)
                    rescue_cnt = rescue_cnt + rescue.astype(jnp.int32)
                amin = settings.eig_rescue_amin
                decisive = (ratio > amin) | (ratio < 1.0 / amin)
                factor = jnp.where(
                    rescue & ~decisive, settings.eig_rescue_factor, ratio)
                new_scale = jnp.where(trig, rho_scale * factor, rho_scale)
                new_scale = jnp.clip(
                    new_scale,
                    RHO_MIN / settings.rho_bar,
                    RHO_MAX / (settings.rho_bar * RHO_EQ_SCALE),
                )
                # rho enters the solve exactly through dg; only debris-active
                # problems carry a (combo, r, s)-dependent inner inverse
                mask = trig & sz
                tinv = jax.lax.cond(
                    jnp.any(mask),
                    lambda: refresh(sd, tinv, new_scale, mask),
                    lambda: tinv,
                )
                ref = jnp.where(
                    mask[:, None],
                    jnp.stack([sd["c1s"], sd["c2s"], sd["ss"], new_scale],
                              axis=1), ref)
                rho_scale = new_scale

            done_chunk = jnp.where(done & ~done_in, nc, done_chunk)
            return (x, y, z, rp, rd, done, status, nc, tinv,
                    rho_scale, ref, best_rp, best_rd, last_prog, done_chunk,
                    tp, td, rescue_cnt, rescue)

        return body

    slot_pos = jnp.arange(n_slots, dtype=jnp.int32)
    group_of_slot = (slot_pos[:, None] >= bounds[None, :n_groups - 1]).sum(
        axis=1)

    def compact(sd, carry):
        """Pack still-running problems to the front of their combo group
        (stable in-group sort by done flag): a pure permutation of
        independent problems, so iterates are unchanged — only which TILE a
        problem occupies changes, letting the tile-skip machinery drop whole
        tiles instead of leaving stragglers scattered one-per-tile."""
        done = carry[5]
        key = (group_of_slot * (2 * n_slots)
               + done.astype(jnp.int32) * n_slots + slot_pos)
        g = jnp.argsort(key)  # new slot i pulls old slot g[i]
        take = lambda a: a[g]
        sd = {k: take(v) for k, v in sd.items()}
        carry = tuple(take(c) if c.ndim >= 1 else c for c in carry)
        return sd, carry

    rp0 = jnp.full((n_slots,), jnp.inf, dtype=dt)
    carry = (
        x0,
        y0,
        z0,
        rp0,
        rp0,
        ~act,  # inactive + dummy slots start done
        jnp.zeros((n_slots,), dtype=jnp.int32),
        jnp.zeros((), dtype=jnp.int32),
        tinv,
        rsc,
        ref,
        rp0,  # best_rp
        rp0,  # best_rd
        jnp.zeros((n_slots,), dtype=jnp.int32),  # last progress chunk
        jnp.zeros((n_slots,), dtype=jnp.int32),  # done_chunk
        jnp.zeros((n_slots,), dtype=dt),  # pri tol at exit
        jnp.zeros((n_slots,), dtype=dt),  # dua tol at exit
        jnp.zeros((n_slots,), dtype=jnp.int32),  # rho-rescue count
        jnp.zeros((n_slots,), dtype=bool),  # post-rescue cert blackout
    )

    prev_end = 0
    for b in settings.eig_compact_chunks:
        end = min(int(b), n_checks)
        if end <= prev_end:
            continue
        carry = jax.lax.while_loop(make_cond(end, 1), make_body(sdata, 1),
                                   carry)
        sdata, carry = compact(sdata, carry)
        prev_end = end
    mult = max(1, int(settings.eig_tail_mult))
    if mult > 1 and prev_end + mult <= n_checks:
        tail_end = prev_end + ((n_checks - prev_end) // mult) * mult
        carry = jax.lax.while_loop(make_cond(tail_end, mult),
                                   make_body(sdata, mult), carry)
    if prev_end < n_checks:
        carry = jax.lax.while_loop(make_cond(n_checks, 1),
                                   make_body(sdata, 1), carry)

    (x, y, z, rp, rd, done, status, chunks, tinv, rho_scale, ref,
     _, _, _, done_chunk, rp_tol, rd_tol, _, _) = carry

    # ---- scatter back to problem order: src (permuted alongside the data)
    # maps slot -> problem; invert it (dummy slots carry src == B, an
    # out-of-bounds index that jnp scatters drop)
    final_slot = jnp.zeros((B,), jnp.int32).at[sdata["src"]].set(slot_pos)
    sc = lambda a: a[final_slot]
    x, y, z = sc(x), sc(y), sc(z)
    # leave the alpha-scaled problem: slacks /= alpha, duals *= alpha on
    # debris rows, so the carried warm state is alpha-independent across
    # steps (exact identity when alpha == 1 everywhere)
    rowsc_b = rowsc_of(s)
    z = z / rowsc_b
    y = y * rowsc_b
    rp, rd = sc(rp), sc(rd)
    rp_tol, rd_tol = sc(rp_tol), sc(rd_tol)
    status = sc(status)
    done = sc(done)
    done_chunk = sc(done_chunk)
    tinv = sc(tinv)
    rho_scale = sc(rho_scale)
    ref = sc(ref)

    status = jnp.where(done, status, MAX_ITER).astype(jnp.int32)
    done_chunk = jnp.where(active & (done_chunk == 0), chunks, done_chunk)

    # inter-step rho step-down (see ADMMSettings.eig_exit_rho_down): bias the
    # CARRIED rho after a primal-plateau MAX_ITER exit so the next, nearby
    # QP starts in the basin the step-67 capture measured as solvable
    down = float(settings.eig_exit_rho_down)
    if 0.0 < down < 1.0:
        pp = (status == MAX_ITER) & (rp > jnp.maximum(rp_tol, 1e-30)) & (
            rd <= jnp.maximum(rd_tol, 1e-30))
        rho_scale = jnp.where(pp, jnp.clip(
            rho_scale * down, RHO_MIN / settings.rho_bar,
            RHO_MAX / (settings.rho_bar * RHO_EQ_SCALE)), rho_scale)

    return ADMMResult(
        x=prob.D * x,
        status=status,
        iters=chunks * settings.check_every,
        pri_res=rp,
        dua_res=rd,
        state=ADMMState(xbar=x, ybar=y, zbar=z, rho_scale=rho_scale,
                        minv=tinv, minv_ok=jnp.ones((), dtype=bool),
                        ref_coef=ref),
        done_iters=done_chunk * settings.check_every,
        pri_tol=rp_tol,
        dua_tol=rd_tol,
    )
