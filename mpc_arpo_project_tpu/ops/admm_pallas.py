"""Pallas TPU kernels for the ADMM hot loop.

Two kernels, designed around two measured pathologies of running this
workload through stock XLA ops on the target TPU:

  * dispatch/op overhead dominates: per-HLO-op cost is roughly constant and
    large compared to these op sizes, so 25 ADMM iterations x ~15 ops/iter
    of XLA graph cost two orders of magnitude more than the same math fused
    into ONE kernel launch with everything resident in VMEM;
  * batched Cholesky / triangular solves decompose into thousands of tiny
    ops (seconds per control step at realistic batch sizes).

Design:

``admm_chunk`` — one launch runs ``n_iter`` OSQP-style iterations for the
whole scenario batch. Grid over batch tiles of ``BT`` problems; per tile the
per-problem inverse normal matrices (Minv), the shared base constraint matrix
A0bar with the compact gather/scatter correction factorization (gsel/scat/
rsel/gscat — see ops.admm.ADMMProblem), the structured normal-matrix stack
and all iterate vectors live in VMEM for the whole chunk. The linear solve is
a per-problem matvec with Minv (two-limb bf16 split at fp32 — measured ~2x
cheaper than the 6-pass fp32 matvec) plus optional iterative refinement
against the true M built from the structured stack — no factorization in the
hot path. The kernel also computes the OSQP termination residuals and
primal/dual infeasibility certificates in-kernel, so the surrounding
while-loop needs only O(1) cheap XLA ops per chunk.

``newton_schulz_inverse`` — maintains Minv across control steps without any
XLA decomposition: X <- X (2I - M X), quadratically convergent, warm-started
from the previous step's inverse (the normal matrix changes little between
steps); a cold-start init X0 = M' / (||M||_1 ||M||_inf) guarantees
convergence from scratch. Per tile, all iterations stay in VMEM.

The inverse-based solve is inexact at fp32 (it acts like a slightly
perturbed KKT solve); termination residuals are computed from the true
matrices, so convergence declarations stay honest. CPU tests run both kernels
in interpret mode and the oracle-parity suite keeps using the exact
Cholesky path (solve_mode='chol').
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform == "cpu"
    except Exception:  # pragma: no cover
        return True


# ---------------------------------------------------------------------------
# Newton-Schulz batched inverse
# ---------------------------------------------------------------------------

def _ns_kernel(m_ref, x_ref, out_ref, res_ref, *, n_iter: int, nz: int, bt: int):
    resids = []
    for p in range(bt):
        M = m_ref[p]
        X = x_ref[p]
        pt = M.dtype
        I2 = 2.0 * jnp.eye(nz, dtype=pt)

        def body(_, Xc):
            MX = jnp.dot(M, Xc, preferred_element_type=pt)
            return jnp.dot(Xc, I2 - MX, preferred_element_type=pt)

        Xf = jax.lax.fori_loop(0, n_iter, body, X)
        out_ref[p] = Xf
        # inverse-quality diagnostic: ||I - M X||_inf
        MX = jnp.dot(M, Xf, preferred_element_type=pt)
        r = jnp.max(jnp.abs(0.5 * I2 - MX)).reshape(1, 1)
        # Mosaic: full-block stores only, no sublane+lane double broadcast —
        # build the (1, 8) row by lane-concatenation
        resids.append(jnp.concatenate([r] * 8, axis=1))
    res_ref[:, :] = jnp.concatenate(resids, axis=0)


def newton_schulz_inverse(M, X0, n_iter: int = 4, bt: int = 8, interpret=None):
    """Batched inverse refinement: X <- X(2I - MX), ``n_iter`` times.

    M, X0: (B, nz, nz). Returns (X, residual) with residual (B,) the
    per-problem ||I - M X||_inf quality diagnostic.
    """
    if interpret is None:
        interpret = _interpret_default()
    B, nz, _ = M.shape
    assert B % bt == 0, (B, bt)
    kern = functools.partial(_ns_kernel, n_iter=n_iter, nz=nz, bt=bt)
    X, res = pl.pallas_call(
        kern,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, nz, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, nz, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, nz, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nz, nz), M.dtype),
            jax.ShapeDtypeStruct((B, 8), M.dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(M, X0)
    return X, res[:, 0]


def _ns_fused_kernel(stack_ref, w_ref, x_ref, need_ref, xo_ref, res_ref,
                     *, n_iter: int, nz: int, bt: int, cold: bool):
    """Masked Newton-Schulz refresh with IN-KERNEL normal-matrix construction.

    M_p = sum_j w[p, j] * stack[j] is built in VMEM from the 7 shared
    structure matrices (base = Pbar + sigma I, G, F1, F2, F12, F3, F33) and
    per-problem scalar weights — the (B, nz, nz) batched M tensor is never
    materialized in HBM (256 MB at B=1024, previously rebuilt on every
    refresh). Tiles with no needy problem skip all compute; within an active
    tile, non-needy problems pass their inverse through unchanged.

    ``cold=True`` ignores x_ref and initializes from the spectral-radius-safe
    X0 = M' / (||M||_1 ||M||_inf).
    """
    f32 = x_ref.dtype
    need_any = jnp.max(need_ref[:, :]) > 0.5

    @pl.when(need_any)
    def _compute():
        I2 = 2.0 * jnp.eye(nz, dtype=f32)
        resids = []
        for p in range(bt):
            M = None
            for j in range(7):
                term = w_ref[p, j] * stack_ref[j]
                M = term if M is None else M + term

            if cold:
                n1 = jnp.max(jnp.sum(jnp.abs(M), axis=0))
                ninf = jnp.max(jnp.sum(jnp.abs(M), axis=1))
                X = M.T / (n1 * ninf)
            else:
                X = x_ref[p]

            def body(_, Xc):
                MX = jnp.dot(M, Xc, preferred_element_type=f32)
                return jnp.dot(Xc, I2 - MX, preferred_element_type=f32)

            Xf = jax.lax.fori_loop(0, n_iter, body, X)
            nd = need_ref[p, 0]
            xo_ref[p] = nd * Xf + (1.0 - nd) * x_ref[p]
            MX = jnp.dot(M, Xf, preferred_element_type=f32)
            r = (nd * jnp.max(jnp.abs(0.5 * I2 - MX))).reshape(1, 1)
            resids.append(jnp.concatenate([r] * 8, axis=1))
        res_ref[:, :] = jnp.concatenate(resids, axis=0)

    @pl.when(jnp.logical_not(need_any))
    def _passthrough():
        xo_ref[:, :, :] = x_ref[:, :, :]
        res_ref[:, :] = jnp.zeros((bt, 8), dtype=f32)


def ns_fused(stack, w, X_prev, need, *, n_iter: int, cold: bool, bt: int = 8,
             interpret=None):
    """Masked batched inverse refresh; see _ns_fused_kernel.

    stack: (7, nz, nz) shared structure matrices; w: (B, 8) per-problem
    weights (lane-padded); X_prev: (B, nz, nz); need: (B,) bool.
    Returns (X, residual) — X rows with need=False pass through, their
    residual reads 0.
    """
    if interpret is None:
        interpret = _interpret_default()
    B, nz, _ = X_prev.shape
    assert B % bt == 0, (B, bt)
    need8 = jnp.broadcast_to(need.astype(X_prev.dtype)[:, None], (B, 8))
    kern = functools.partial(_ns_fused_kernel, n_iter=n_iter, nz=nz, bt=bt,
                             cold=cold)
    X, res = pl.pallas_call(
        kern,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((7, nz, nz), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, nz, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, nz, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nz, nz), X_prev.dtype),
            jax.ShapeDtypeStruct((B, 8), X_prev.dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(stack, w, X_prev, need8)
    return X, res[:, 0]


def masked_safe_refresh(ns_stack, w, X_prev, need, *, warm_iters: int,
                        cold_iters: int, bt: int = 8, interpret=None):
    """Warm masked NS refresh with overflow-recovering cold restarts.

    The in-kernel blend ``nd*Xf + (1-nd)*x_ref`` obeys IEEE 0*inf=NaN: a warm
    pass that overflows fp32 (e.g. a large adaptive-rho jump pushes the stale
    inverse outside Newton-Schulz's convergence basin) leaves non-finite rows
    that a plain cold re-call can never repair — the cold kernel recomputes a
    good Xf but the blend re-NaNs it against the poisoned x_ref. Bad rows are
    therefore zeroed in XLA (where boolean selects are fine) before the cold
    restart, making recovery unconditional. See ADVICE r1 (high).
    """
    Xw, r = ns_fused(ns_stack, w, X_prev, need, n_iter=warm_iters, cold=False,
                     bt=bt, interpret=interpret)
    bad = need & ((r > 1e-2) | ~jnp.isfinite(r))
    Xw = jnp.where(bad[:, None, None], 0.0, Xw)

    def cold():
        return ns_fused(ns_stack, w, Xw, bad, n_iter=cold_iters, cold=True,
                        bt=bt, interpret=interpret)[0]

    return jax.lax.cond(jnp.any(bad), cold, lambda: Xw)


def safe_inverse(M, X_prev, prev_ok, warm_iters: int, cold_iters: int, bt: int = 8):
    """Warm-refresh the inverse; selectively cold-restart problems whose
    refreshed residual is bad (large M changes — rho jumps, sign flips — put
    the warm start outside Newton-Schulz's convergence basin)."""
    Xw, r = newton_schulz_inverse(M, X_prev, n_iter=warm_iters, bt=bt)
    bad = (~prev_ok) | (r > 1e-2) | ~jnp.isfinite(r)

    def cold():
        Xc, _ = newton_schulz_inverse(M, cold_start_inverse(M), n_iter=cold_iters, bt=bt)
        return Xc

    Xc = jax.lax.cond(jnp.any(bad), cold, lambda: Xw)
    return jnp.where(bad[:, None, None], Xc, Xw)


def cold_start_inverse(M):
    """X0 = M' / (||M||_1 ||M||_inf): spectral-radius-safe NS initialization."""
    n1 = jnp.abs(M).sum(axis=-2).max(axis=-1)  # max column sum
    ninf = jnp.abs(M).sum(axis=-1).max(axis=-1)  # max row sum
    return jnp.swapaxes(M, -1, -2) / (n1 * ninf)[:, None, None]


# ---------------------------------------------------------------------------
# fused ADMM chunk
# ---------------------------------------------------------------------------

def _chunk_kernel(
    # per-tile inputs
    minv_ref,  # (BT, nz, nz)
    coef_ref,  # (BT, 4)  [1, c1, c2, s]
    qbar_ref,  # (BT, nz)
    lbar_ref,  # (BT, m)
    ubar_ref,  # (BT, m)
    rho_ref,  # (BT, m)
    x_ref,  # (BT, nz) in
    y_ref,  # (BT, m) in
    z_ref,  # (BT, m) in
    uinf_ref,  # (BT, m) f32 mask: 1 where ubar infinite
    linf_ref,  # (BT, m) f32 mask: 1 where lbar infinite
    ucap_ref,  # (BT, m) ubar with inf replaced by 0
    lcap_ref,  # (BT, m) lbar with -inf replaced by 0
    done_ref,  # (BT, 8) f32 mask: 1 where the problem is already done
    w7_ref,  # (BT, 8) structured normal-matrix weights (see admm ns_weights)
    # shared inputs
    a0_ref,  # (m, nz) scaled base constraint matrix
    pbar_ref,  # (nz, nz)
    gsel_ref,  # (nz, 3*gw) correction gather (coefficient vectors folded in)
    scat_ref,  # (3*gw, m) correction scatter
    rsel_ref,  # (m, 3*gw) transpose-side gather
    gscat_ref,  # (3*gw, nz) transpose-side scatter
    stack7_ref,  # (nz, 7*nz) the 7 structure matrices, lane-concatenated
    einv_ref,  # (1, m)
    dinv_ref,  # (1, nz)
    # outputs
    xo_ref,  # (BT, nz)
    yo_ref,  # (BT, m)
    zo_ref,  # (BT, m)
    stat_ref,  # (BT, 8): rp, rp_rel, rd, rd_rel, pinf, dinf, nv_dy, nv_dx
    # optional VMEM scratch (present iff the two-limb bf16 Minv apply is on)
    minv_hi_ref=None,  # (BT, nz, nz) bf16
    minv_lo_ref=None,  # (BT, nz, nz) bf16
    *,
    n_iter: int,
    sigma: float,
    alpha: float,
    eps_pinf: float,
    eps_dinf: float,
    pinf_margin: float,
    bt: int,
    ir_steps: int,
    gw: int,
    prec,
):
    """One fused chunk with compact-matmul dynamic corrections.

    The V1 kernel computed A_k-matvecs as four full (m, nz) stacked matmuls
    (A0 plus three one-hot patterns with ~Nx+1 nonzeros each) and ran at
    >80% of the fp32 MXU ceiling — i.e. 4x the necessary FLOPs at full
    efficiency. Here the corrections are a gather/scatter matmul pair of
    width 3*gw (~1/3 the base matmul cost) with the per-problem signs
    applied between them as a float-mask built from an iota compare — and
    the iterative-refinement M v products use the 7-term structured stack
    (one (nz, 7nz) matmul + aligned lane slices) instead of two more
    A-matvecs. Unaligned lane ops are deliberately absent: measured, a
    slice-add formulation of the same math ran 2.6x SLOWER than V1 due to
    Mosaic lane-relayouts, while this form cuts per-iteration MACs from
    3.47M to 1.77M per problem (ir=2, padded dims)."""
    f32 = x_ref.dtype  # accumulate in the working precision (f32 or f64)
    c1v = coef_ref[:, 1][:, None]
    c2v = coef_ref[:, 2][:, None]
    sv = coef_ref[:, 3][:, None]
    nz = x_ref.shape[1]
    # per-problem group mask [c1 | c2 | s] over the 3*gw correction lanes
    # (float-mask iota compare: Mosaic cannot lower wide boolean selects)
    colf = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * gw), 1).astype(f32)
    in1 = jnp.maximum(jnp.sign(gw - 0.5 - colf), 0.0)
    in12 = jnp.maximum(jnp.sign(2 * gw - 0.5 - colf), 0.0)
    wsel = in1 * c1v + (in12 - in1) * c2v + (1.0 - in12) * sv  # (BT, 3gw)

    def matvec_A(x):  # (BT, nz) -> (BT, m)
        g = jnp.dot(x, gsel_ref[:, :], preferred_element_type=f32,
                    precision=prec)
        return (
            jnp.dot(x, a0_ref[:].T, preferred_element_type=f32, precision=prec)
            + jnp.dot(wsel * g, scat_ref[:, :], preferred_element_type=f32,
                      precision=prec)
        )

    def matvec_AT(w):  # (BT, m) -> (BT, nz)
        h = jnp.dot(w, rsel_ref[:, :], preferred_element_type=f32,
                    precision=prec)
        return (
            jnp.dot(w, a0_ref[:], preferred_element_type=f32, precision=prec)
            + jnp.dot(wsel * h, gscat_ref[:, :], preferred_element_type=f32,
                      precision=prec)
        )

    two_limb = minv_lo_ref is not None

    def apply_minv(rhs):  # (BT, nz) -> (BT, nz); Minv is symmetric
        outs = []
        for p in range(bt):
            if two_limb:
                # two-limb bf16 apply: Minv = hi + lo with bf16 limbs (split
                # once per chunk below); x likewise. Three single-pass bf16
                # dots (dropping lo*lo) carry ~2^-16 relative error — far
                # below the ~1e-3 inverse-error stall threshold — at ~half
                # the cost of one 6-pass fp32-HIGHEST matvec (measured).
                # explicit DEFAULT precision: the solve runs under a
                # default_matmul_precision('highest') context, and Mosaic
                # rejects bf16 operands tagged with an fp32 contract
                # precision ("Bad lhs type")
                dflt = jax.lax.Precision.DEFAULT
                xr = rhs[p][None, :]
                xh = xr.astype(jnp.bfloat16)
                xl = (xr - xh.astype(f32)).astype(jnp.bfloat16)
                o = (
                    jnp.dot(xh, minv_hi_ref[p], preferred_element_type=f32,
                            precision=dflt)
                    + jnp.dot(xh, minv_lo_ref[p], preferred_element_type=f32,
                              precision=dflt)
                    + jnp.dot(xl, minv_hi_ref[p], preferred_element_type=f32,
                              precision=dflt)
                )
                outs.append(o)
            else:
                outs.append(jnp.dot(rhs[p][None, :], minv_ref[p],
                                    preferred_element_type=f32,
                                    precision=prec))
        return jnp.concatenate(outs, axis=0)

    def matvec_M(x):
        """True normal-matrix product via the structured stack:
        M_k v = sum_t w7[k, t] * (v @ stack_t), one wide shared matmul plus
        aligned 256-lane slice combines — ~459K MACs/problem vs ~573K for
        the sigma v + Pbar v + A'(rho(A v)) route."""
        xs = jnp.dot(x, stack7_ref[:, :], preferred_element_type=f32,
                     precision=prec)  # (BT, 7*nz)
        acc = None
        for t in range(7):
            term = w7_ref[:, t][:, None] * xs[:, t * nz : (t + 1) * nz]
            acc = term if acc is None else acc + term
        return acc

    def solve_M(rhs):
        """Approximate-inverse apply + iterative refinement.

        The Newton-Schulz inverse carries a residual ~ kappa*eps (at fp32,
        ~1e-3 — measured to be enough to stall ADMM); one refinement step
        against the TRUE normal matrix squares the error away."""
        xt = apply_minv(rhs)
        for _ in range(ir_steps):
            xt = xt + apply_minv(rhs - matvec_M(xt))
        return xt

    def body(i, carry):
        x, y, z = carry
        rho = rho_ref[:, :]
        rhs = sigma * x - qbar_ref[:, :] + matvec_AT(rho * z - y)
        xt = solve_M(rhs)
        zt = matvec_A(xt)
        x_n = alpha * xt + (1.0 - alpha) * x
        z_tmp = alpha * zt + (1.0 - alpha) * z
        z_n = jnp.clip(z_tmp + y / rho, lbar_ref[:, :], ubar_ref[:, :])
        y_n = y + rho * (z_tmp - z_n)
        return (x_n, y_n, z_n)

    # per-tile early exit: the surrounding while-loop runs until EVERY problem
    # in the batch is done, so late chunks are paid for by a handful of
    # straggler problems. Tiles whose bt problems are all done skip the whole
    # chunk (iterates pass through; stats are zeros, ignored for done
    # problems) — chunk cost then scales with the number of still-active
    # tiles instead of the full batch.
    alive_any = jnp.max(1.0 - done_ref[:, :]) > 0.5

    @pl.when(alive_any)
    def _compute():
        if two_limb:
            # split the tile's inverses into bf16 limbs ONCE per chunk; the
            # n_iter in-loop applies then run single-pass bf16 dots
            for p in range(bt):
                Mh = minv_ref[p].astype(jnp.bfloat16)
                minv_hi_ref[p] = Mh
                minv_lo_ref[p] = (minv_ref[p] - Mh.astype(f32)).astype(
                    jnp.bfloat16)
        x0 = x_ref[:, :]
        y0 = y_ref[:, :]
        z0 = z_ref[:, :]
        x, y, z = jax.lax.fori_loop(0, n_iter, body, (x0, y0, z0))
        # certificate deltas accumulated over the whole chunk (see
        # ops.admm.body: single-iteration deltas sit below the fp32 round-off
        # floor at large ||y|| and made infeasibility detection a coin flip)
        dx = x - x0
        dy = y - y0
        xo_ref[:, :] = x
        yo_ref[:, :] = y
        zo_ref[:, :] = z

        # ---- residuals (unscaled), as in ops.admm.residuals
        einv = einv_ref[0, :]
        dinv = dinv_ref[0, :]
        Ax = matvec_A(x)
        rp = jnp.max(jnp.abs(einv * (Ax - z)), axis=1)
        rp_rel = jnp.maximum(
            jnp.max(jnp.abs(einv * Ax), axis=1), jnp.max(jnp.abs(einv * z), axis=1)
        )
        # NOTE: rd/rd_rel are emitted WITHOUT the 1/c cost-unscaling factor —
        # the caller applies it (c is a traced array under jit)
        Px = jnp.dot(x, pbar_ref[:, :], preferred_element_type=f32,
                     precision=prec)
        Aty = matvec_AT(y)
        rd = jnp.max(jnp.abs(dinv * (Px + qbar_ref[:, :] + Aty)), axis=1)
        rd_rel = jnp.maximum(
            jnp.max(jnp.abs(dinv * Px), axis=1),
            jnp.maximum(
                jnp.max(jnp.abs(dinv * Aty), axis=1),
                jnp.max(jnp.abs(dinv * qbar_ref[:, :]), axis=1),
            ),
        )

        # ---- primal infeasibility certificate (scaled space; see ops.admm).
        # Float-mask arithmetic throughout: Mosaic cannot lower wide boolean
        # vector selects (i8->i1 truncation), so the recession-cone projection
        # and support sums are expressed with precomputed f32 masks and capped
        # bounds (projection zeroes v on infinite-bound rows, so the capped
        # bounds give the exact support sum with no inf*0 terms).
        uinf = uinf_ref[:, :]
        linf = linf_ref[:, :]
        both = uinf * linf
        uo = uinf * (1.0 - linf)
        lo = linf * (1.0 - uinf)
        v = dy * (1.0 - both)
        v = v * (1.0 - uo) + jnp.minimum(v, 0.0) * uo
        v = v * (1.0 - lo) + jnp.maximum(v, 0.0) * lo
        nv = jnp.max(jnp.abs(v), axis=1)
        Atv = matvec_AT(v)
        atv_n = jnp.max(jnp.abs(Atv), axis=1)
        sup = (ucap_ref[:, :] * jnp.maximum(v, 0.0)).sum(axis=1) + (
            lcap_ref[:, :] * jnp.minimum(v, 0.0)
        ).sum(axis=1)
        thresh = max(eps_pinf, pinf_margin)
        pinf = (
            jnp.maximum(jnp.sign(eps_pinf * nv - atv_n), 0.0)
            * jnp.maximum(jnp.sign(-thresh * nv - sup), 0.0)
            * jnp.maximum(jnp.sign(nv - eps_pinf), 0.0)
        )

        # ---- dual infeasibility certificate (same float-mask style)
        nvx = jnp.max(jnp.abs(dx), axis=1)
        Pdx = jnp.dot(dx, pbar_ref[:, :], preferred_element_type=f32,
                      precision=prec)
        pdx_n = jnp.max(jnp.abs(Pdx), axis=1)
        qv = (qbar_ref[:, :] * dx).sum(axis=1)
        Adx = matvec_A(dx)
        eps_b = eps_dinf * nvx[:, None]
        up_viol = (jnp.maximum(Adx - eps_b, 0.0) * (1.0 - uinf)).max(axis=1)
        lo_viol = (jnp.maximum(-eps_b - Adx, 0.0) * (1.0 - linf)).max(axis=1)
        # up/lo violations are >= 0; ok iff exactly zero
        dinf = (
            jnp.maximum(jnp.sign(eps_dinf * nvx - pdx_n), 0.0)
            * jnp.maximum(jnp.sign(-eps_dinf * nvx - qv), 0.0)
            * (1.0 - jnp.sign(up_viol))
            * (1.0 - jnp.sign(lo_viol))
            * jnp.maximum(jnp.sign(nvx - eps_dinf), 0.0)
        )

        # single full-block store (Mosaic rejects scalar/column writes to VMEM)
        stat_ref[:, :] = jnp.stack(
            [rp, rp_rel, rd, rd_rel, pinf.astype(f32), dinf.astype(f32), nv, nvx],
            axis=1,
        )

    @pl.when(jnp.logical_not(alive_any))
    def _passthrough():
        xo_ref[:, :] = x_ref[:, :]
        yo_ref[:, :] = y_ref[:, :]
        zo_ref[:, :] = z_ref[:, :]
        stat_ref[:, :] = jnp.zeros((bt, 8), dtype=f32)


def admm_chunk(
    minv, coef, qbar, lbar, ubar, rho, x, y, z, w7,
    a0, pbar, gsel, scat, rsel, gscat, stack7, einv, dinv,
    *,
    n_iter: int,
    sigma: float,
    alpha: float,
    eps_pinf: float,
    eps_dinf: float,
    pinf_margin: float,
    bt: int = 8,
    ir_steps: int = 1,
    precision: str = "highest",
    two_limb: bool = True,
    interpret=None,
    done=None,
):
    """Run ``n_iter`` fused ADMM iterations + termination diagnostics.

    Shapes: minv (B,nz,nz); coef (B,4); qbar/x (B,nz); lbar/ubar/rho/y/z (B,m);
    w7 (B,8) structured normal-matrix weights [1, r, r*c1, r*c2, r*c1c2, r*s,
    r*s^2, 0]; a0 (m,nz); pbar (nz,nz); gsel/scat/rsel/gscat the compact
    correction factorization (see admm.ADMMProblem); stack7 (nz, 7*nz) the
    lane-concatenated structure matrices [Pbar+sigma*I | G | F1..F33];
    einv (m,); dinv (nz,).
    ``precision``: MXU pass count for fp32 dots — 'highest' (6-pass fp32),
    'high' (3-pass, ~1e-7 relative operator noise), 'default' (single bf16
    pass; breaks convergence, only for roofline probes).
    ``two_limb``: use the two-limb bf16 Minv apply (fp32 working dtype only;
    fp64 — the exactness-test dtype — always uses the full-precision apply).
    ``done``: optional (B,) bool — tiles whose problems are all done skip the
    chunk entirely (iterates pass through, stats zeroed).
    Returns (x, y, z, stats) with stats (B, 8).
    """
    if interpret is None:
        interpret = _interpret_default()
    two_limb = two_limb and x.dtype == jnp.float32
    B, nz = x.shape
    m = y.shape[1]
    assert B % bt == 0, (B, bt)
    gw3 = gsel.shape[1]
    assert gw3 % 3 == 0 and stack7.shape == (nz, 7 * nz), (gsel.shape, stack7.shape)
    if done is None:
        done = jnp.zeros((B,), dtype=bool)
    done8 = jnp.broadcast_to(done.astype(x.dtype)[:, None], (B, 8))
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]
    kern = functools.partial(
        _chunk_kernel,
        n_iter=n_iter,
        sigma=float(sigma),
        alpha=float(alpha),
        eps_pinf=float(eps_pinf),
        eps_dinf=float(eps_dinf),
        pinf_margin=float(pinf_margin),
        bt=bt,
        ir_steps=ir_steps,
        gw=gw3 // 3,
        prec=prec,
    )
    # float masks / capped bounds for the in-kernel certificates (see kernel)
    uinf = (~jnp.isfinite(ubar)).astype(x.dtype)
    linf = (~jnp.isfinite(lbar)).astype(x.dtype)
    ucap = jnp.where(jnp.isfinite(ubar), ubar, 0.0)
    lcap = jnp.where(jnp.isfinite(lbar), lbar, 0.0)
    tile = lambda *shape: pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                                       memory_space=pltpu.VMEM)
    shared = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B // bt,),
        in_specs=[
            tile(bt, nz, nz),  # minv
            tile(bt, 4),  # coef
            tile(bt, nz),  # qbar
            tile(bt, m),  # lbar
            tile(bt, m),  # ubar
            tile(bt, m),  # rho
            tile(bt, nz),  # x
            tile(bt, m),  # y
            tile(bt, m),  # z
            tile(bt, m),  # uinf
            tile(bt, m),  # linf
            tile(bt, m),  # ucap
            tile(bt, m),  # lcap
            tile(bt, 8),  # done mask
            tile(bt, 8),  # w7
            shared(m, nz),  # a0
            shared(nz, nz),  # pbar
            shared(nz, gw3),  # gsel
            shared(gw3, m),  # scat
            shared(m, gw3),  # rsel
            shared(gw3, nz),  # gscat
            shared(nz, 7 * nz),  # stack7
            shared(1, m),  # einv
            shared(1, nz),  # dinv
        ],
        out_specs=(
            tile(bt, nz),
            tile(bt, m),
            tile(bt, m),
            tile(bt, 8),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nz), x.dtype),
            jax.ShapeDtypeStruct((B, m), y.dtype),
            jax.ShapeDtypeStruct((B, m), z.dtype),
            jax.ShapeDtypeStruct((B, 8), x.dtype),
        ),
        scratch_shapes=(
            [pltpu.VMEM((bt, nz, nz), jnp.bfloat16)] * 2 if two_limb else []
        ),
        # the default 16M scoped-vmem cap under-uses the chip; double-buffered
        # tile inputs for this kernel need ~22M
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(minv, coef, qbar, lbar, ubar, rho, x, y, z, uinf, linf, ucap, lcap,
      done8, w7, a0, pbar, gsel, scat, rsel, gscat, stack7,
      einv.reshape(1, -1), dinv.reshape(1, -1))
    return out
