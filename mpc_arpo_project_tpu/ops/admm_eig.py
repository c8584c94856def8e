"""Shared-basis (generalized-eigendecomposition) Pallas solve path — the
round-3 successor to the Newton-Schulz inverse-maintenance kernels in
``ops.admm_pallas``.

The ADMM normal matrix of scenario k is

    M_k = base + r_k * (H_{combo_k} + s_k*F3 + s_k^2*F33),  base = Pbar+sigma*I

with H_combo = G + c1*F1 + c2*F2 + c1*c2*F12 and (c1, c2) in {±1}^2 — only
FOUR distinct H matrices across the whole batch (the velocity-funnel signs,
`/root/reference/src/simhelpers.py:66-67,106-107`, are the only discrete
per-scenario structure; the debris slope s is the only continuous one,
`simhelpers.py:80-103`). Precomputing the generalized eigendecomposition
H_c V_c = base V_c diag(lam_c) with V_c' base V_c = I gives

    (base + r H_c)^{-1} = V_c diag(1/(1+r*lam_c)) V_c'

— the per-problem linear solve becomes two matmuls with a matrix SHARED by
every problem of the same combo (full-width MXU work) plus a per-problem
diagonal. The prior design's per-problem (nz, nz) inverse matvec — measured
as the dominant cost pinning the fused kernel at 23.6% of the fp32 ceiling —
disappears. The debris term is an exact low-rank Woodbury correction:

    r(s F3 + s^2 F33) = Z C(r,s) Z',   Z = [U3 | E3]  (nz x K, K = 2*pad(Nx+1))
    C = r*s*K1 + r*s^2*D33             (K1 = block swap, D33 = diag(w33))
    M^{-1} = N^{-1} - N^{-1} Z (I + C G)^{-1} C Z' N^{-1},  G = Z'N^{-1}Z

whose only per-problem object is T^{-1} = (I + C G)^{-1} at K x K (128 for the
reference horizons) — 4x smaller state and a 16x cheaper refresh than the old
(nz, nz) Minv, refreshed only for debris-ACTIVE problems (s=0 makes the whole
correction vanish identically, so rho adaptation and funnel-sign flips cost
nothing for the typical scenario). Measured accuracy of the full fp32 apply vs
a dense fp64 solve: <= 3e-7 relative over r in [1e-3, 1e3], s in [-50, 50] —
three orders below the ~4e-3 inverse-error ADMM stall threshold, so NO
iterative refinement is needed (the old path spent ~40% of its MACs on it).

Batch tiles must be combo-pure: the caller sorts the batch by combo into
bt-padded groups (see ``ops.admm._solve_eig``) and passes a per-tile combo
index consumed by scalar-prefetch BlockSpec index maps selecting A_c, W_c,
YT_c.

Negative result (round 3, measured — do not retry without new evidence): the
round-2 kernel's two-limb bf16 trick does NOT pay here. Limbing the in-loop
A matvecs moves the ADMM fixed point by ~|A|*2^-17 relative, which the exact
residual check sees as a ~3e-3 scaled-residual floor above the 1e-3
tolerance — every solve stalls. Limbing only the solve chain (W/YT/tinv/K1)
converges but costs ~3x the iterations on fast problems (175 -> 500 on the
radial fixture): the eig solve's exactness is precisely what eliminated the
round-2 kernel's iterative-refinement MACs, and re-introducing solve error
re-buys that cost as iterations while saving only ~24%/iteration.
"""

from __future__ import annotations

import functools

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
# fused ADMM chunk (eig solve)
# ---------------------------------------------------------------------------

def _eig_chunk_kernel(
    combo_ref,  # scalar-prefetch: (n_tiles,) int32 per-tile combo
    # per-tile inputs
    tinv_ref,  # (BT, K, K) per-problem (I + C G)^{-T}-free inverse: X ~ T^{-1}
    scal_ref,  # (BT, 8)  [r, s, ...]
    qbar_ref,  # (BT, nz)
    lbar_ref,  # (BT, m)
    ubar_ref,  # (BT, m)
    dg_ref,  # (BT, nz) 1/(1 + r*lam_combo)
    x_ref,  # (BT, nz)
    y_ref,  # (BT, m)
    z_ref,  # (BT, m)
    uinf_ref,  # (BT, m) f32 mask: 1 where ubar infinite
    linf_ref,  # (BT, m)
    ucap_ref,  # (BT, m)
    lcap_ref,  # (BT, m)
    done_ref,  # (BT, 8)
    # combo-indexed shared inputs
    ac_ref,  # (1, m, nz) A_c = A0bar + c1 S1 + c2 S2
    wc_ref,  # (1, nz, nz) eigenbasis W_c
    yt_ref,  # (1, K, nz) YT_c = (W_c' Z)'
    # shared inputs
    pbar_ref,  # (nz, nz)
    k1_ref,  # (K, K) block-swap
    w33_ref,  # (1, K) D33 diagonal (row form)
    gsel_ref,  # (nz, gw) s-correction gather
    scat_ref,  # (gw, m)
    rsel_ref,  # (m, gw)
    gscat_ref,  # (gw, nz)
    rhov_ref,  # (1, m) base rho vector
    einv_ref,  # (1, m)
    dinv_ref,  # (1, nz)
    wuu_ref,  # (1, K) U-block debris-equilibration diagonal
    dmask_ref,  # (1, m) f32: 1 on debris rows
    # outputs
    xo_ref,
    yo_ref,
    zo_ref,
    stat_ref,  # (BT, 8): rp, rp_rel, rd, rd_rel, pinf, dinf, nv_dy, nv_dx
    *,
    n_iter: int,
    sigma: float,
    alpha: float,
    eps_pinf: float,
    eps_dinf: float,
    pinf_margin: float,
    bt: int,
    prec,
    apply: str,
    with_s: bool,
):
    f32 = x_ref.dtype
    alive_any = jnp.max(1.0 - done_ref[:, :]) > 0.5

    def _compute(with_s: bool):
        r = scal_ref[:, 0][:, None]  # (BT, 1)
        s = scal_ref[:, 1][:, None]
        # per-problem debris-row equilibration alpha (ops.admm._solve_eig;
        # legacy callers leave scal col 2 zero -> treated as 1 = disabled).
        # The solve operates entirely on the alpha-scaled problem: debris
        # rows of A scaled by alpha, correction coefficients (alpha^2 s,
        # alpha^2 s^2, alpha^2 - 1); bounds/iterates are pre-warped by the
        # caller. alpha == 1 is bit-identical to the unscaled path.
        al = scal_ref[:, 2][:, None]
        al = jnp.where(al == 0.0, 1.0, al)
        alsq = al * al
        rs = r * alsq * s
        rss = r * alsq * s * s
        ruu = r * (alsq - 1.0)
        rho = r * rhov_ref[0, :][None, :]  # (BT, m)
        dg = dg_ref[:, :]
        W = wc_ref[0]
        Ac = ac_ref[0]
        YT = yt_ref[0]
        w33 = w33_ref[0, :][None, :]
        wuu = wuu_ref[0, :][None, :]
        rowsc = 1.0 + (al - 1.0) * dmask_ref[0, :][None, :]  # (BT, m)

        def matvec_A(xv):  # (BT, nz) -> (BT, m)
            out = jnp.dot(xv, Ac.T, preferred_element_type=f32,
                          precision=prec)
            if not with_s:
                return out
            g = jnp.dot(xv, gsel_ref[:, :], preferred_element_type=f32,
                        precision=prec)
            return out * rowsc + jnp.dot((al * s) * g, scat_ref[:, :],
                                         preferred_element_type=f32,
                                         precision=prec)

        def matvec_AT(wv):  # (BT, m) -> (BT, nz)
            if not with_s:
                return jnp.dot(wv, Ac, preferred_element_type=f32,
                               precision=prec)
            h = jnp.dot(wv, rsel_ref[:, :], preferred_element_type=f32,
                        precision=prec)
            return (jnp.dot(wv * rowsc, Ac, preferred_element_type=f32,
                            precision=prec)
                    + jnp.dot((al * s) * h, gscat_ref[:, :],
                              preferred_element_type=f32, precision=prec))

        def apply_tinv(a):  # per-problem t = a @ tinv[p], (BT, K)
            if apply == "vpu":
                # broadcast-multiply-reduce on the VPU: a batch-1 row dim
                # uses 1/128 of an MXU pass, so K*K MACs/problem are
                # cheaper as elementwise work than as bt tiny matmuls
                return jnp.sum(a[:, :, None] * tinv_ref[:, :, :], axis=1)
            if apply == "blockdiag":
                # one full-width MXU matmul: block-diagonal LHS
                # (bt, bt*K) x stacked tinv (bt*K, K)
                K = a.shape[1]
                ii = jax.lax.broadcasted_iota(jnp.int32, (bt, bt), 0)
                jj = jax.lax.broadcasted_iota(jnp.int32, (bt, bt), 1)
                eye = (ii == jj).astype(f32)
                A_blk = (a[:, None, :] * eye[:, :, None]).reshape(bt, bt * K)
                return jnp.dot(A_blk, tinv_ref[:, :, :].reshape(bt * K, K),
                               preferred_element_type=f32, precision=prec)
            ts = []
            for p in range(bt):
                ts.append(jnp.dot(a[p][None, :], tinv_ref[p],
                                  preferred_element_type=f32,
                                  precision=prec))
            return jnp.concatenate(ts, axis=0)

        def solve_M(v):  # (BT, nz) -> (BT, nz): exact M^{-1} v (row form)
            u = jnp.dot(v, W, preferred_element_type=f32, precision=prec)
            d = u * dg
            if not with_s:
                return jnp.dot(d, W.T, preferred_element_type=f32,
                               precision=prec)
            # a = v' N^{-1} Z = d @ Y  (Y = W'Z = YT')
            a = jnp.dot(d, YT.T, preferred_element_type=f32, precision=prec)
            # t = a (I + C G)^{-1}: the only per-problem matvec (K x K)
            t = apply_tinv(a)
            # h = t C  (C symmetric: rs*K1 + rss*D33 + ruu*D_UU); s=0 zeroes
            # the whole correction regardless of tinv content; alpha=1
            # zeroes the equilibration term exactly
            h = (rs * jnp.dot(t, k1_ref[:, :], preferred_element_type=f32,
                              precision=prec)
                 + rss * (t * w33) + ruu * (t * wuu))
            e = jnp.dot(h, YT, preferred_element_type=f32, precision=prec)
            return jnp.dot((u - e) * dg, W.T, preferred_element_type=f32,
                           precision=prec)

        def body(i, carry):
            x, y, z = carry
            rhs = sigma * x - qbar_ref[:, :] + matvec_AT(rho * z - y)
            xt = solve_M(rhs)
            zt = matvec_A(xt)
            x_n = alpha * xt + (1.0 - alpha) * x
            z_tmp = alpha * zt + (1.0 - alpha) * z
            z_n = jnp.clip(z_tmp + y / rho, lbar_ref[:, :], ubar_ref[:, :])
            y_n = y + rho * (z_tmp - z_n)
            return (x_n, y_n, z_n)

        x0 = x_ref[:, :]
        y0 = y_ref[:, :]
        z0 = z_ref[:, :]
        x, y, z = jax.lax.fori_loop(0, n_iter, body, (x0, y0, z0))
        dx = x - x0
        dy = y - y0
        xo_ref[:, :] = x
        yo_ref[:, :] = y
        zo_ref[:, :] = z

        # ---- residuals + certificates: identical math/layout to
        # ops.admm_pallas._chunk_kernel (see the float-mask rationale there)
        einv = einv_ref[0, :]
        dinv = dinv_ref[0, :]
        Ax = matvec_A(x)
        rp = jnp.max(jnp.abs(einv * (Ax - z)), axis=1)
        rp_rel = jnp.maximum(
            jnp.max(jnp.abs(einv * Ax), axis=1), jnp.max(jnp.abs(einv * z), axis=1)
        )
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

        nvx = jnp.max(jnp.abs(dx), axis=1)
        Pdx = jnp.dot(dx, pbar_ref[:, :], preferred_element_type=f32,
                      precision=prec)
        pdx_n = jnp.max(jnp.abs(Pdx), axis=1)
        qv = (qbar_ref[:, :] * dx).sum(axis=1)
        Adx = matvec_A(dx)
        eps_b = eps_dinf * nvx[:, None]
        up_viol = (jnp.maximum(Adx - eps_b, 0.0) * (1.0 - uinf)).max(axis=1)
        lo_viol = (jnp.maximum(-eps_b - Adx, 0.0) * (1.0 - linf)).max(axis=1)
        dinf = (
            jnp.maximum(jnp.sign(eps_dinf * nvx - pdx_n), 0.0)
            * jnp.maximum(jnp.sign(-eps_dinf * nvx - qv), 0.0)
            * (1.0 - jnp.sign(up_viol))
            * (1.0 - jnp.sign(lo_viol))
            * jnp.maximum(jnp.sign(nvx - eps_dinf), 0.0)
        )

        stat_ref[:, :] = jnp.stack(
            [rp, rp_rel, rd, rd_rel, pinf.astype(f32), dinf.astype(f32), nv, nvx],
            axis=1,
        )

    # ONE statically-selected branch: a dual-branch pl.when kernel (round-4
    # experiment, splitting tiles by debris activity) ballooned the Mosaic
    # compile from ~90 s to ~20 min at B=1024 — and bought nothing, because
    # every problem of a debris-geometry config carries s != 0 every step
    # (the reference recomputes the slope into A whether or not the
    # constraint is ACTIVE, `simhelpers.py:83-108`). ``with_s`` is a trace-
    # time flag for genuinely debris-free scenario families.
    @pl.when(alive_any)
    def _go():
        _compute(with_s)

    @pl.when(jnp.logical_not(alive_any))
    def _passthrough():
        xo_ref[:, :] = x_ref[:, :]
        yo_ref[:, :] = y_ref[:, :]
        zo_ref[:, :] = z_ref[:, :]
        stat_ref[:, :] = jnp.zeros((bt, 8), dtype=f32)


def eig_chunk(
    tile_combo, tinv, scal, qbar, lbar, ubar, dg, x, y, z,
    Ast, Wst, YTst, pbar, K1, w33row, gsel_s, scat_s, rsel_s, gscat_s,
    rho_vec, einv, dinv,
    *,
    n_iter: int,
    sigma: float,
    alpha: float,
    eps_pinf: float,
    eps_dinf: float,
    pinf_margin: float,
    bt: int = 32,
    precision: str = "highest",
    interpret=None,
    done=None,
    apply: str = "loop",
    wuu_row=None,
    dmask=None,
    with_s: bool = True,
):
    """Run ``n_iter`` fused ADMM iterations with the shared-basis solve.

    tile_combo: (B//bt,) int32 — per-tile combo index (tiles must be
    combo-pure; see ops.admm._solve_eig). ``apply`` selects the per-problem
    T^{-1} application strategy: 'loop' (bt batch-1 dots), 'vpu'
    (broadcast-multiply-reduce), 'blockdiag' (one block-diagonal MXU
    matmul). ``with_s=False`` compiles a Woodbury-free kernel for
    debris-free scenario families (trace-time flag — see the branch note in
    the kernel). Shapes: tinv (B,K,K); scal (B,8) [rho_scale, s, alpha];
    qbar/x/dg (B,nz); lbar/ubar/y/z (B,m); Ast (4,m,nz); Wst (4,nz,nz);
    YTst (4,K,nz); the rest shared as in ADMMProblem.
    Returns (x, y, z, stats) with stats (B, 8) as in admm_pallas.admm_chunk.
    """
    if interpret is None:
        interpret = _interpret_default()
    B, nz = x.shape
    m = y.shape[1]
    K = tinv.shape[1]
    assert B % bt == 0, (B, bt)
    gw = gsel_s.shape[1]
    if done is None:
        done = jnp.zeros((B,), dtype=bool)
    done8 = jnp.broadcast_to(done.astype(x.dtype)[:, None], (B, 8))
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]
    kern = functools.partial(
        _eig_chunk_kernel,
        n_iter=n_iter,
        sigma=float(sigma),
        alpha=float(alpha),
        eps_pinf=float(eps_pinf),
        eps_dinf=float(eps_dinf),
        pinf_margin=float(pinf_margin),
        bt=bt,
        prec=prec,
        apply=apply,
        with_s=with_s,
    )
    uinf = (~jnp.isfinite(ubar)).astype(x.dtype)
    linf = (~jnp.isfinite(lbar)).astype(x.dtype)
    ucap = jnp.where(jnp.isfinite(ubar), ubar, 0.0)
    lcap = jnp.where(jnp.isfinite(lbar), lbar, 0.0)
    if wuu_row is None:
        wuu_row = jnp.zeros((1, K), dtype=x.dtype)
    if dmask is None:
        dmask = jnp.zeros((1, m), dtype=x.dtype)
    tile = lambda *shape: pl.BlockSpec(
        shape, lambda i, c: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    combo = lambda *shape: pl.BlockSpec(
        shape, lambda i, c: (c[i],) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    shared = lambda *shape: pl.BlockSpec(
        shape, lambda i, c: (0,) * len(shape), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bt,),
        in_specs=[
            tile(bt, K, K),  # tinv
            tile(bt, 8),  # scal
            tile(bt, nz),  # qbar
            tile(bt, m),  # lbar
            tile(bt, m),  # ubar
            tile(bt, nz),  # dg
            tile(bt, nz),  # x
            tile(bt, m),  # y
            tile(bt, m),  # z
            tile(bt, m),  # uinf
            tile(bt, m),  # linf
            tile(bt, m),  # ucap
            tile(bt, m),  # lcap
            tile(bt, 8),  # done
            combo(1, m, nz),  # Ac
            combo(1, nz, nz),  # Wc
            combo(1, K, nz),  # YTc
            shared(nz, nz),  # pbar
            shared(K, K),  # K1
            shared(1, K),  # w33
            shared(nz, gw),  # gsel_s
            shared(gw, m),  # scat_s
            shared(m, gw),  # rsel_s
            shared(gw, nz),  # gscat_s
            shared(1, m),  # rho_vec
            shared(1, m),  # einv
            shared(1, nz),  # dinv
            shared(1, K),  # wuu
            shared(1, m),  # dmask
        ],
        out_specs=(
            tile(bt, nz),
            tile(bt, m),
            tile(bt, m),
            tile(bt, 8),
        ),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, nz), x.dtype),
            jax.ShapeDtypeStruct((B, m), y.dtype),
            jax.ShapeDtypeStruct((B, m), z.dtype),
            jax.ShapeDtypeStruct((B, 8), x.dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tile_combo, tinv, scal, qbar, lbar, ubar, dg, x, y, z,
      uinf, linf, ucap, lcap, done8,
      Ast, Wst, YTst, pbar, K1, w33row, gsel_s, scat_s, rsel_s, gscat_s,
      rho_vec.reshape(1, -1), einv.reshape(1, -1), dinv.reshape(1, -1),
      wuu_row, dmask)
    return out


# ---------------------------------------------------------------------------
# Woodbury inner-inverse refresh: T = I + C(r,s) G,  G = Y' diag(dg) Y
# ---------------------------------------------------------------------------

def tinv_refresh(combo_row, scal, dg, X_prev, need, YTst, w33col,
                 *, n_iter: int, cold: bool, bt: int = 32,
                 precision: str = "highest", interpret=None, wuucol=None):
    """Masked per-problem refresh of T^{-1}; rows with need=False pass
    through (residual reads 0). ``combo_row`` is the PER-ROW combo index
    (the caller may pass any row subset — per-row math is independent, which
    is what lets ops.admm._solve_eig compact needy rows to a small capacity
    before refreshing instead of paying full batch width every fire).

    Plain batched XLA, NOT a Pallas kernel — a measured round-3 reversal.
    The original Pallas refresh (statically unrolled per-problem loop of
    (K,K) matmuls, one tile per grid step) ran ~100x off the MXU ceiling:
    with every problem needy (the common mid-trajectory case — the debris
    slope s drifts continuously, so every debris-active problem refreshes
    at EVERY control step), it cost ~70 ms/step at B=1024 — ~45% of total
    step time by the BENCH_MAX_ITER cap decomposition (BASELINE.md). The
    refresh runs once per solve, not per iteration, so per-op dispatch
    overhead is irrelevant and XLA's batched (B,K,K) matmuls put the same
    math at a few ms. Pallas stays where it pays: the per-iteration fused
    chunk kernel above."""
    del interpret, bt  # call-site compatibility; XLA everywhere, any rows
    B, K = X_prev.shape[:2]
    dt = X_prev.dtype
    half = K // 2
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]
    mm = functools.partial(jnp.matmul, precision=prec,
                           preferred_element_type=dt)
    YTg = YTst[combo_row]  # (B, K, nz)
    # T_b = I + r*al^2*s*(K1 @ G_b) + r*al^2*s^2*(D33 @ G_b)
    #       + r*(al^2-1)*(D_UU @ G_b)
    #   G_b = Y' diag(dg_b) Y;  K1 @ G = block-row swap; D33/D_UU @ G =
    #   w33/wuu rows; al (scal col 2, 0 treated as 1) is the per-problem
    #   debris-row equilibration (see _eig_chunk_kernel)
    al = jnp.where(scal[:, 2] == 0.0, 1.0, scal[:, 2])
    alsq = (al * al)[:, None, None]
    rs = (scal[:, 0] * scal[:, 1])[:, None, None] * alsq
    rss = (scal[:, 0] * scal[:, 1] ** 2)[:, None, None] * alsq
    ruu = scal[:, 0][:, None, None] * (alsq - 1.0)
    G = mm(YTg * dg[:, None, :], jnp.swapaxes(YTg, 1, 2))
    Gsw = jnp.concatenate([G[:, half:], G[:, :half]], axis=1)
    I = jnp.eye(K, dtype=dt)
    T = I[None] + rs * Gsw + rss * (w33col[None] * G)
    if wuucol is not None:
        T = T + ruu * (wuucol[None] * G)

    if cold:
        n1 = jnp.max(jnp.sum(jnp.abs(T), axis=1), axis=1)
        ninf = jnp.max(jnp.sum(jnp.abs(T), axis=2), axis=1)
        X = jnp.swapaxes(T, 1, 2) / (n1 * ninf)[:, None, None]
    else:
        X = X_prev

    def body(_, Xc):
        return mm(Xc, 2.0 * I[None] - mm(T, Xc))

    Xf = jax.lax.fori_loop(0, n_iter, body, X)
    res = jnp.max(jnp.abs(I[None] - mm(T, Xf)), axis=(1, 2))
    X_out = jnp.where(need[:, None, None], Xf, X_prev)
    return X_out, jnp.where(need, res, 0.0)


def tinv_safe_refresh(combo_row, scal, dg, X_prev, need, YTst, w33col,
                      *, warm_iters: int, cold_iters: int,
                      bt: int = 32, precision: str = "highest",
                      interpret=None, wuucol=None, cold_cap: int = 0):
    """Warm refresh with overflow-recovering cold restarts (same blend-NaN
    rationale as admm_pallas.masked_safe_refresh: bad rows are zeroed in XLA
    before the cold retry so 0*inf never poisons the blend).

    ``combo_row`` is per-row (see tinv_refresh); any row subset is valid.
    ``cold_cap`` > 0 compacts the cold retry to that many bad-first rows
    (bit-identical to the full-width retry — per-row math is independent;
    falls back to full width when more rows are bad): the round-4 TPU trace
    showed the cold cond at ~25 ms/step at B=1024 because ONE bad row paid
    ``cold_iters`` full-width NS iterations."""
    Xw, r = tinv_refresh(combo_row, scal, dg, X_prev, need, YTst, w33col,
                         n_iter=warm_iters, cold=False, bt=bt,
                         precision=precision, interpret=interpret,
                         wuucol=wuucol)
    bad = need & ((r > 1e-2) | ~jnp.isfinite(r))
    Xw = jnp.where(bad[:, None, None], 0.0, Xw)

    def cold_rows(cr, sc, dgr, xr, br):
        return tinv_refresh(cr, sc, dgr, xr, br, YTst, w33col,
                            n_iter=cold_iters, cold=True, bt=bt,
                            precision=precision, interpret=interpret,
                            wuucol=wuucol)[0]

    def cold():
        n = combo_row.shape[0]
        if cold_cap <= 0 or cold_cap >= n:
            return cold_rows(combo_row, scal, dg, Xw, bad)

        def compact():
            idx = jnp.argsort(~bad, stable=True)[:cold_cap]
            sub = cold_rows(combo_row[idx], scal[idx], dg[idx], Xw[idx],
                            bad[idx])
            return Xw.at[idx].set(sub)

        def full():
            return cold_rows(combo_row, scal, dg, Xw, bad)

        return jax.lax.cond(jnp.sum(bad) <= cold_cap, compact, full)

    return jax.lax.cond(jnp.any(bad), cold, lambda: Xw)
