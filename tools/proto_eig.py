"""Numerical prototype for the shared-basis (generalized-eigendecomposition)
ADMM linear solve — validation before the Pallas kernel rewrite.

M_k = base + r_k * (H_combo + s_k*F3 + s_k^2*F33),  base = Pbar + sigma*I
H_combo = G + c1*F1 + c2*F2 + c1*c2*F12,  (c1, c2) in {±1}^2  (4 matrices)

Per combo: generalized eigh  H_c V = base V diag(lam),  V' base V = I
  =>  (base + r H_c)^{-1} = V diag(1/(1+r*lam)) V'
Debris term: r(s F3 + s^2 F33) = Z C(r,s) Z',  Z = [U3 | E3] (nz x 2L pad 128)
  C = r*s*K1 + r*s^2*D33  (K1 = block swap, D33 = diag(w33) on E3 half)
Woodbury (push-through form, valid at s=0):
  M^{-1} = N^{-1} - N^{-1} Z (I + C G)^{-1} C Z' N^{-1},  G = Z' N^{-1} Z

Checks: exactness vs dense solve (fp64), fp32 apply accuracy, T=(I+CG)
conditioning, Newton-Schulz convergence on T (cold + warm).
"""

import sys
import numpy as np
import scipy.linalg as sla

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from mpc_arpo_project_tpu import config as cfg
from mpc_arpo_project_tpu.ops import admm
from mpc_arpo_project_tpu.ops.qp_builder import QPDims, build_qp
from mpc_arpo_project_tpu.rollout import discrete


def build_flagship():
    import examples.common as common

    sim, mpc, fail, debris = common.radial_config(Nx=50, T_final=150.0)
    settings = admm.ADMMSettings(solve_mode="pallas")
    engine = discrete.build_engine(sim, mpc, fail, debris, settings=settings)
    return engine


def main():
    eng = build_flagship()
    prob = eng.prob
    nz = prob.Pbar.shape[0]
    m = prob.A0bar.shape[0]
    sigma = 1e-6
    print(f"nz={nz} m={m}")

    Pbar = np.asarray(prob.Pbar, dtype=np.float64)
    G = np.asarray(prob.G, dtype=np.float64)
    F1, F2, F12, F3, F33 = [np.asarray(f, dtype=np.float64) for f in prob.Fstack]
    base = Pbar + sigma * np.eye(nz)

    print("kappa(base) =", np.linalg.cond(base))

    # ---- Z factorization of the debris correction: F3 = U3 E3' + E3 U3',
    # F33 = E3 diag(w33) E3'   (from admm.prepare_problem sym_outer structure)
    fr = np.asarray(prob.deb_rows)
    px = np.asarray(prob.posx_cols)
    L = fr.shape[0]
    Lp = 64  # pad L->64 per side, Z width 128
    A0bar = np.asarray(prob.A0bar, dtype=np.float64)
    rho = np.asarray(prob.rho_vec, dtype=np.float64)
    sc3 = np.asarray(prob.sc3, dtype=np.float64)
    w3 = rho[fr] * sc3  # weights
    Z = np.zeros((nz, 2 * Lp))
    for j in range(L):
        Z[:, j] = w3[j] * A0bar[fr[j], :]  # U3 side
        Z[px[j], Lp + j] = 1.0  # E3 side
    w33 = np.zeros(2 * Lp)
    w33[Lp : Lp + L] = rho[fr] * sc3**2 / np.maximum(w3, 1e-300) ** 0  # see below
    # F33 = sum_j rho_j sc3_j^2 e_j e_j'  = E3 diag(rho*sc3^2) E3'
    w33 = np.zeros(2 * Lp)
    w33[Lp : Lp + L] = rho[fr] * sc3**2
    K1 = np.zeros((2 * Lp, 2 * Lp))
    K1[:Lp, Lp:] = np.eye(Lp)
    K1[Lp:, :Lp] = np.eye(Lp)

    # verify Z C Z' = s F3 + s^2 F33 for random s
    rng = np.random.default_rng(0)
    s = 1.7
    C = s * K1 + s * s * np.diag(w33)
    err = np.abs(Z @ C @ Z.T - (s * F3 + s * s * F33)).max() / np.abs(F3).max()
    print("Z C Z' rel err:", err)

    # ---- per-combo generalized eigh
    combos = [(-1.0, -1.0), (-1.0, 1.0), (1.0, -1.0), (1.0, 1.0)]
    Ws, lams = [], []
    for c1, c2 in combos:
        H = G + c1 * F1 + c2 * F2 + c1 * c2 * F12
        lam, V = sla.eigh(H, base)
        Ws.append(V)
        lams.append(lam)
        print(f"combo ({c1:+.0f},{c2:+.0f}): lam range [{lam.min():.3e}, {lam.max():.3e}], "
              f"kappa(V)={np.linalg.cond(V):.3e}")

    # ---- validate M^{-1} v for random (combo, r, s)
    def minv_apply(v, ci, r, s, dtype=np.float64, tinv=None):
        W = Ws[ci].astype(dtype)
        lam = lams[ci].astype(dtype)
        Zl = Z.astype(dtype)
        v = v.astype(dtype)
        dg = 1.0 / (1.0 + r * lam)
        u = v @ W
        d = u * dg
        Y = (W.T @ Zl).astype(dtype)  # (nz, 2Lp) — precomputed per combo in prod
        a = d @ Y
        # T = I + C G,  G = Y' diag(dg) Y
        Gm = (Y * dg[:, None]).T @ Y
        Cm = (r * s) * K1.astype(dtype) + (r * s * s) * np.diag(w33).astype(dtype)
        T = np.eye(2 * Lp, dtype=dtype) + Cm @ Gm
        t = a @ np.linalg.inv(T) if tinv is None else a @ tinv
        h = t @ Cm  # C symmetric
        e = h @ Y.T
        return (d - e * dg) @ W.T, T

    worst = 0.0
    for trial in range(20):
        ci = rng.integers(0, 4)
        r = float(np.exp(rng.uniform(np.log(1e-3), np.log(1e3))))
        s = float(rng.choice([0.0, rng.uniform(-5, 5), rng.uniform(-50, 50)]))
        c1, c2 = combos[ci]
        M = base + r * (G + c1 * F1 + c2 * F2 + c1 * c2 * F12 + s * F3 + s * s * F33)
        v = rng.standard_normal(nz)
        x_ref = np.linalg.solve(M, v)
        x64, T = minv_apply(v, ci, r, s)
        e64 = np.linalg.norm(x64 - x_ref) / np.linalg.norm(x_ref)
        x32, _ = minv_apply(v, ci, r, s, dtype=np.float32)
        e32 = np.linalg.norm(x32.astype(np.float64) - x_ref) / np.linalg.norm(x_ref)
        kT = np.linalg.cond(T)
        evT = np.linalg.eigvals(T)
        worst = max(worst, e32)
        print(f"ci={ci} r={r:9.3e} s={s:8.3f}: fp64 err={e64:.2e} fp32 err={e32:.2e} "
              f"kappa(T)={kT:.2e} minRe(eigT)={evT.real.min():.3e}")

    print("worst fp32 rel err:", worst)

    # ---- NS-on-T convergence: cold and warm
    ci, r, s = 2, 3.7, 4.2
    _, T = minv_apply(np.ones(nz), ci, r, s)
    Tt = T.T.astype(np.float32)
    n1 = np.abs(Tt).sum(axis=0).max()
    ninf = np.abs(Tt).sum(axis=1).max()
    X = Tt.T / (n1 * ninf)
    I = np.eye(2 * Lp, dtype=np.float32)
    for it in range(60):
        Rn = np.abs(I - Tt @ X).max()
        if it % 5 == 0 or Rn < 1e-6:
            print(f"  cold NS iter {it}: ||I-TX||={Rn:.3e}")
        if Rn < 1e-6:
            break
        X = X @ (2 * I - Tt @ X)
    # warm: perturb s by 2%
    _, T2 = minv_apply(np.ones(nz), ci, r, s * 1.02)
    T2t = T2.T.astype(np.float32)
    Xw = X.copy()
    for it in range(6):
        Rn = np.abs(I - T2t @ Xw).max()
        print(f"  warm NS iter {it}: ||I-TX||={Rn:.3e}")
        Xw = Xw @ (2 * I - T2t @ Xw)


if __name__ == "__main__":
    main()
