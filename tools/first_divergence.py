"""Phase-3 of the sigma=0.01 docking-gap dissection (VERDICT r4 task 1).

probe_stall.py (phase 2, artifacts/probe_analyze_r5.log) showed the captured
MAX_ITER plateau steps are GENUINELY HARD: warm-started from the production
fp32 carry, the fp64 chol solver also exits MAX_ITER on 6/8 of them with the
same 1.7-4.7x-tolerance primal plateau (huge true primal violations — the
QP at that closed-loop state is infeasible-adjacent). The fp32 capability gap
is therefore NOT at the plateau steps themselves; the production trajectory
must DIVERGE from the fp64 oracle trajectory earlier and then wander into
the hard states. This tool finds that first divergence:

  --prod P.npz      (TPU)  production eig fp32 rollout, per-step telemetry
  --oracle O.npz    (CPU)  fp64 chol oracle rollout on --cols columns of the
                           SAME draw matrix (bit-identical slicing, as
                           status_mix --shard does)
  --compare P O     (host) first step where the status sequences differ per
                           scenario + which arm docked; classifies whether
                           production's first flip is MAX_ITER-where-SOLVED,
                           PINF-where-SOLVED, etc.
  --capture C.npz --scen b --step t  (TPU) carry entering step t (exact:
                           segment-boundary capture from the same compiled
                           program, see probe_stall.dump)
  --resolve C.npz   (CPU)  paired engine-pinned re-solve of the captured
                           step: fp64 chol warm vs fp32 eig warm from the
                           identical carry — the decisive fp32-vs-fp64 test
                           at the ROOT of the divergence.

Reference bar: fp64 OSQP statuses drive the reference's failsafe switch
(`/root/reference/src/trajectorySimulate.py:296-314`); a status flip is the
only channel through which solver arithmetic can change the trajectory
(identical draws are injected by construction).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.probe_stall import build

SEED = 20260818
STATUS_NAME = {-1: "dead", 0: "UNSOLVED", 1: "SOLVED", 2: "MAX_ITER",
               3: "PINF", 4: "DINF"}


def _draws(runs=128):
    rng = np.random.RandomState(SEED)
    # matches probe_stall.dump / status_mix: nsim//noise_rep + 2 draw rows
    return rng.normal(0.0, 1.0, size=(600 // 50 + 2, runs, 4))


def _save_run(path, out, cols):
    np.savez(
        path,
        status=np.asarray(out.status), i_term=np.asarray(out.i_term),
        success=np.asarray(out.success), ctrl_seq=np.asarray(out.ctrl_seq),
        x_true=np.asarray(out.x_true), x_est=np.asarray(out.x_est),
        iters=np.asarray(out.iters), pri_res=np.asarray(out.pri_res),
        dua_res=np.asarray(out.dua_res), cols=np.asarray(cols),
    )
    print(f"wrote {path}: success {np.asarray(out.success).sum()}"
          f"/{len(cols)}")


def run_prod(path, runs=128):
    import jax
    from mpc_arpo_project_tpu.rollout import discrete

    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    eng, _ = build()
    noise = discrete.noise_sequence_from_draws(eng, _draws(runs))
    out = discrete.rollout_chunked(eng, noise, seg=10)
    _save_run(path, out, np.arange(runs))


def run_oracle(path, cols, runs=128):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from mpc_arpo_project_tpu.rollout import discrete

    eng, _ = build(solve_mode="chol", dtype_str="f64")
    draws = _draws(runs)[:, cols]
    noise = discrete.noise_sequence_from_draws(eng, draws)
    out = discrete.rollout_chunked(eng, noise, seg=10)
    _save_run(path, out, cols)


def compare(prod_path, oracle_path):
    p = np.load(prod_path)
    o = np.load(oracle_path)
    cols = o["cols"]
    ps, os_ = p["status"][:, cols], o["status"]  # (T, n)
    flips = []
    for j, b in enumerate(cols):
        d = np.nonzero(ps[:, j] != os_[:, j])[0]
        t = int(d[0]) if len(d) else None
        rec = dict(
            scen=int(b), t_first=t,
            prod=STATUS_NAME[int(ps[t, j])] if t is not None else None,
            oracle=STATUS_NAME[int(os_[t, j])] if t is not None else None,
            prod_success=bool(p["success"][b]),
            oracle_success=bool(o["success"][j]),
            prod_i_term=int(p["i_term"][b]), oracle_i_term=int(o["i_term"][j]),
        )
        flips.append(rec)
        print(rec)
    kinds = {}
    for r in flips:
        if r["t_first"] is None:
            k = "identical-status-sequences"
        else:
            k = f"prod={r['prod']} where oracle={r['oracle']}"
        kinds[k] = kinds.get(k, 0) + 1
    print("\nfirst-flip kinds:", kinds)
    gap = [r for r in flips if r["oracle_success"] and not r["prod_success"]]
    print(f"gap scenarios (oracle docks, production doesn't): "
          f"{[r['scen'] for r in gap]}")
    for r in gap:
        print(f"  scen {r['scen']}: first flip at t={r['t_first']} "
              f"prod={r['prod']} oracle={r['oracle']}")
    return flips


def capture(path, scen, step, runs=128):
    """Capture the carry entering ``step`` (must be a multiple of the seg
    used, seg=1 here for exactness) from the production TPU rollout."""
    import jax
    from mpc_arpo_project_tpu.rollout import discrete

    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    eng, _ = build()
    noise = discrete.noise_sequence_from_draws(eng, _draws(runs))
    caps = {}

    def progress(done, total, carry):
        if done == step:
            caps["c"] = jax.tree.map(np.asarray, carry)

    out = discrete.rollout_chunked(eng, noise, seg=1, progress=progress)
    c = caps["c"]
    st = np.asarray(out.status)[step]
    np.savez(path, l=c.l, u=c.u, c1=c.c1, c2=c.c2, s=c.s,
             xbar=c.admm_state.xbar, ybar=c.admm_state.ybar,
             zbar=c.admm_state.zbar, rho=c.admm_state.rho_scale,
             minv=c.admm_state.minv, ref=c.admm_state.ref_coef,
             alive=c.alive, status=st, step=np.asarray(step),
             scen=np.asarray(scen))
    print(f"wrote {path}: step {step} scen {scen} "
          f"recorded prod status {STATUS_NAME[int(st[scen])]}")


def resolve(path):
    """Paired engine-pinned re-solve of the captured step: does fp64 chol
    solve the QP the production fp32 eig path exited MAX_ITER on, warm from
    the IDENTICAL carry? (Engine problems pin the Ruiz scaling to nominal
    coefficients — see probe_stall.resolve_full.)"""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from mpc_arpo_project_tpu.ops import admm

    d = np.load(path)
    # report every alive row the production rollout recorded as MAX_ITER at
    # this step, plus the explicitly captured scenario
    scens = sorted(set(np.nonzero(d["alive"] & (d["status"] == 2))[0].tolist())
                   | {int(d["scen"])})
    print(f"recorded statuses at step {int(d['step'])}: "
          f"{dict(zip(*[a.tolist() for a in np.unique(d['status'][d['alive']], return_counts=True)]))}")
    print(f"probing rows: {scens}")
    for label, mode, dts in (("fp32 eig (production)", "eig", "f32"),
                             ("fp64 chol (oracle)", "chol", "f64")):
        eng, _ = build(solve_mode=mode, dtype_str=dts)
        if dts == "f32":
            # interpret-mode Pallas on CPU needs small tiles
            eng = eng.replace(settings=eng.settings._replace(pallas_tile=4))
        dt = jnp.float32 if dts == "f32" else jnp.float64
        prob, st = eng.prob, eng.settings
        B = d["l"].shape[0]
        # the chol engine is UNPADDED (nz=201, m=406) while the captured eig
        # carry is padded (256/512); the Ruiz scalings agree on the overlap
        # to fp32 rounding (measured 1.2e-8 rel), so truncating the padded
        # warm state is an exact warm start (padded coords are inert zeros)
        nz, m = prob.Pbar.shape[0], prob.A0bar.shape[0]
        cut_z = lambda a: jnp.asarray(a[:, :nz], dt)
        cut_m = lambda a: jnp.asarray(a[:, :m], dt)
        state = admm.init_state(prob, B, st)
        state = state._replace(
            xbar=cut_z(d["xbar"]), ybar=cut_m(d["ybar"]),
            zbar=cut_m(d["zbar"]),
            rho_scale=jnp.asarray(d["rho"], dt))
        if mode == "eig":
            state = state._replace(minv=jnp.asarray(d["minv"], dt),
                                   ref_coef=jnp.asarray(d["ref"], dt),
                                   minv_ok=jnp.ones((), dtype=bool))
        r = admm.admm_solve(prob, (jnp.asarray(d["c1"], dt),
                                   jnp.asarray(d["c2"], dt),
                                   jnp.asarray(d["s"], dt)),
                            cut_m(d["l"]), cut_m(d["u"]),
                            state, st, active=jnp.asarray(d["alive"]))
        for b in scens:
            print(f"{label} scen {b}: status "
                  f"{STATUS_NAME[int(np.asarray(r.status)[b])]} "
                  f"iters {int(np.asarray(r.done_iters)[b])} "
                  f"rp/tol {float(np.asarray(r.pri_res)[b] / max(np.asarray(r.pri_tol)[b], 1e-300)):.3g} "
                  f"rd/tol {float(np.asarray(r.dua_res)[b] / max(np.asarray(r.dua_tol)[b], 1e-300)):.3g}")
        if mode == "eig":
            r32_state = jax.tree.map(np.asarray, r.state)
        else:
            # reported-floor vs iterate-floor: evaluate the fp32 FINAL
            # iterate's residuals in fp64 on the fp64 problem (scalings agree
            # to 1.2e-8 rel on the overlap). If the fp64-evaluated dual
            # residual is at/below tolerance, the fp32 dual plateau is the
            # fp32 EVALUATION flooring, not the iterate.
            x32 = jnp.asarray(r32_state.xbar[:, :nz], jnp.float64)
            y32 = jnp.asarray(r32_state.ybar[:, :m], jnp.float64)
            z32 = jnp.asarray(r32_state.zbar[:, :m], jnp.float64)
            coeffs64 = (jnp.asarray(d["c1"], dt), jnp.asarray(d["c2"], dt),
                        jnp.asarray(d["s"], dt))
            qbar = jnp.broadcast_to(prob.qbar, (B, prob.qbar.shape[-1]))
            from mpc_arpo_project_tpu.ops.admm import _matvec_A, _matvec_AT
            Ax = _matvec_A(prob, coeffs64, x32)
            rp = jnp.abs(prob.Einv * (Ax - z32)).max(axis=1)
            rp_rel = jnp.maximum(jnp.abs(prob.Einv * Ax).max(axis=1),
                                 jnp.abs(prob.Einv * z32).max(axis=1))
            Px = x32 @ prob.Pbar
            Aty = _matvec_AT(prob, coeffs64, y32)
            cinv = 1.0 / prob.c
            rd = cinv * jnp.abs(prob.Dinv * (Px + qbar + Aty)).max(axis=1)
            rd_rel = cinv * jnp.maximum(
                jnp.abs(prob.Dinv * Px).max(axis=1),
                jnp.maximum(jnp.abs(prob.Dinv * Aty).max(axis=1),
                            jnp.abs(prob.Dinv * qbar).max(axis=1)))
            ea, er = st.eps_abs, st.eps_rel
            tp = ea + er * np.asarray(rp_rel)
            td = ea + er * np.asarray(rd_rel)
            print("fp64 re-evaluation of the fp32 FINAL iterate:")
            for b in scens:
                print(f"  scen {b}: rp64/tol {float(np.asarray(rp)[b]/tp[b]):.3g} "
                      f"rd64/tol {float(np.asarray(rd)[b]/td[b]):.3g}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--prod", default=None)
    ap.add_argument("--oracle", default=None)
    ap.add_argument("--cols", default=None,
                    help="comma-separated scenario columns for --oracle")
    ap.add_argument("--compare", nargs=2, default=None)
    ap.add_argument("--capture", default=None)
    ap.add_argument("--scen", type=int, default=None)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--resolve", default=None)
    args = ap.parse_args()
    if args.prod:
        run_prod(args.prod)
    elif args.oracle:
        cols = [int(v) for v in args.cols.split(",")]
        run_oracle(args.oracle, cols)
    elif args.compare:
        compare(*args.compare)
    elif args.capture:
        capture(args.capture, args.scen, args.step)
    elif args.resolve:
        resolve(args.resolve)
