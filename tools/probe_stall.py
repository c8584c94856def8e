"""Capture and dissect fp32 MAX_ITER (plateau-stall) steps from the
production sigma=0.01 rollout — the round-4 follow-up to the equilibration
fix: with divergence cured, the remaining docking gap comes from steps whose
reported residual plateaus at ~1.5-400x tolerance (artifacts/status_mix/
ref_s0.01_prod_r4_run1.json). This tool answers WHICH mechanism:

  * reported-floor: the fp32 residual COMPUTATION floors above tolerance
    while the iterate's true (fp64-evaluated) residual keeps shrinking
    -> fix = compensated residual evaluation in the chunk kernel;
  * iterate-floor: the fp32 iteration itself stalls in a noise ball above
    tolerance -> fix = higher-precision iterate storage (costly);
  * genuinely-hard: the fp64 oracle ALSO plateaus on this QP from this warm
    state -> not an fp32 capability gap at all.

Phase 1 (TPU): run the production rollout, find MAX_ITER (scenario, step)
pairs, replay the deterministic step loop to just before a chosen failing
step, and dump that step's QP inputs + warm state to an npz.
Phase 2 (--analyze, CPU fp64): load the npz, re-solve with fp64 chol and
with an fp32-emulated eig iteration, tracking reported vs true residuals.

    python tools/probe_stall.py --dump /tmp/stall_probe.npz          # TPU
    python tools/probe_stall.py --analyze /tmp/stall_probe.npz --cpu # CPU
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(sigma=0.01, T_final=300.0, solve_mode="eig", dtype_str="f32",
          max_iter=4000):
    import jax.numpy as jnp
    from mpc_arpo_project_tpu.config import (
        SimConditions, MPCParams, FailsafeParams, Noise, Debris)
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.rollout import discrete

    v_ecr = 50000.0 * np.ones(5)
    v_ecr[-2] *= -1
    v_ecr[-1] = 0.0
    mpc = MPCParams(8e2 * np.diag([0.2**2, 10**2, 3.8**2, 900.0]),
                    1000**2 * np.eye(2), 5**2 * np.eye(5), v_ecr,
                    {"Nx": 40, "Nc": 5, "Nb": 5}, (0.2, 0.2))
    fail = FailsafeParams(0.005 * np.diag([0.0001, 1, 100000.0, 1.0, 0.01]),
                          100 * np.eye(2), np.eye(1, 4), np.zeros((2, 2)))
    debris = Debris((40.0, 0.0), 5.0, 20.0)
    sim = SimConditions(np.array([100.0, 10.0, 0.0, 0.0]),
                        np.array([2.5, 0.0, 0.0, 0.0]), 2.5,
                        10 * np.pi / 180, 1.5, 1.107e-3, 0.5, True,
                        (0.2, 45.0), Noise((sigma, sigma), 50), False,
                        T_final=T_final)
    st = admm.ADMMSettings(max_iter=max_iter, solve_mode=solve_mode,
                           stall_exit_chunks=12, stall_tighten_chunks=24)
    dt = jnp.float32 if dtype_str == "f32" else jnp.float64
    eng = discrete.build_engine(sim, mpc, fail, debris, settings=st, dtype=dt)
    return eng, (sim, mpc, fail, debris)


def dump(path, runs=128, seed=20260818):
    import jax
    import jax.numpy as jnp
    from mpc_arpo_project_tpu.rollout import discrete

    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    eng, _ = build()
    noise_rep = 50
    n_draws = eng.nsim // noise_rep + 2
    rng = np.random.RandomState(seed)
    draws = rng.normal(0.0, 1.0, size=(n_draws, runs, 4))
    noise = discrete.noise_sequence_from_draws(eng, draws)
    seg = int(os.environ.get("PROBE_SEG", "10"))
    out = discrete.rollout_chunked(eng, noise, seg=seg)
    st = np.asarray(out.status)  # (T, B)
    i_term = np.asarray(out.i_term)
    succ = np.asarray(out.success)
    mi_t, mi_b = np.nonzero(st == 2)
    print(f"MAX_ITER steps: {len(mi_t)}; success {succ.sum()}/{runs}")
    if not len(mi_t):
        print("nothing to probe")
        return
    # choose, per non-docking scenario, the latest SEGMENT-BOUNDARY step
    # with MAX_ITER status: the carry entering that step is exposed by the
    # progress callback of the SAME compiled segment program, so the capture
    # is bit-exact (a per-step-jit replay recompiles and chaotically
    # diverges from the recorded trajectory — measured: it fabricated NaN
    # estimates the real rollout never had)
    boundary = (mi_t % seg == 0)
    chosen = {}
    pick_late = os.environ.get("PROBE_LATE") == "1"
    for t, b in zip(mi_t[boundary], mi_b[boundary]):
        b = int(b)
        if not succ[b]:
            prev = chosen.get(b, None)
            t = int(t)
            if prev is None:
                chosen[b] = t
            else:
                chosen[b] = max(prev, t) if pick_late else min(prev, t)
    chosen = sorted(chosen.items(), key=lambda kv: kv[1])[:8]
    chosen = [(t, b) for b, t in chosen]
    print("chosen (step, scenario):", chosen)

    caps = {}
    want = sorted({t for t, _ in chosen})

    def progress(done, total, carry):
        if done in want:
            caps[done] = jax.tree.map(np.asarray, carry)

    discrete.rollout_chunked(eng, noise, seg=seg, progress=progress)
    data = {}
    for (t, b) in chosen:
        c = caps[t]
        data[f"{b}_t"] = np.asarray(t)
        for k in ("l", "u", "c1", "c2", "s"):
            data[f"{b}_{k}"] = getattr(c, k)[b]
        for k in ("xbar", "ybar", "zbar", "rho_scale"):
            data[f"{b}_{k}"] = getattr(c.admm_state, k)[b]
        data[f"{b}_minv"] = c.admm_state.minv[b]
        data[f"{b}_ref"] = c.admm_state.ref_coef[b]
        data[f"{b}_alive"] = c.alive[b]
    data["scenarios"] = np.asarray([b for _, b in chosen])
    np.savez(path, **data)
    print(f"wrote {path}")


def analyze(path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.ops.qp_builder import QPDims, build_qp
    from tools.ref_sim import discretize_np, synth_gains_np
    from tests.test_admm import materialize_A

    d = np.load(path)
    scen = d["scenarios"]
    _, (sim, mpc, fail, debris) = build()
    Ad, Bd = discretize_np(sim.mean_mtn, sim.time_stp, False)
    K, QN, *_ = synth_gains_np(Ad, Bd, mpc, fail)
    dims = QPDims(Nx=mpc.Nx, Nc=mpc.Nc, Nb=mpc.Nb)
    static = build_qp(dims, sim, mpc, Ad, Bd, K, QN)
    B = len(scen)
    st64 = admm.ADMMSettings(solve_mode="chol", max_iter=4000,
                             stall_exit_chunks=12, stall_tighten_chunks=24)
    # pad=True: the captured carry comes from the padded fp32 eig engine
    # (nz 201->256, m 406->512); padding leaves solutions unchanged
    prob64 = admm.prepare_problem(static, dims, settings=st64,
                                  dtype=jnp.float64, pad=True)
    g = lambda k: np.stack([d[f"{b}_{k}"] for b in scen])
    coeffs = tuple(jnp.asarray(g(k), dtype=jnp.float64)
                   for k in ("c1", "c2", "s"))
    l = jnp.asarray(g("l"), dtype=jnp.float64)
    u = jnp.asarray(g("u"), dtype=jnp.float64)
    print("probe steps:", [int(d[f"{b}_t"]) for b in scen])
    print("s coeffs:", g("s").round(4))

    # arm A: fp64 chol warm-started from the PRODUCTION fp32 carry
    state = admm.init_state(prob64, B, st64)
    state = state._replace(
        xbar=jnp.asarray(g("xbar"), jnp.float64),
        ybar=jnp.asarray(g("ybar"), jnp.float64),
        zbar=jnp.asarray(g("zbar"), jnp.float64),
        rho_scale=jnp.asarray(g("rho_scale"), jnp.float64))
    r64 = admm.admm_solve(prob64, coeffs, l, u, state, st64)
    print("fp64 chol warm:", "status", np.asarray(r64.status),
          "iters", np.asarray(r64.done_iters))
    print("  rp/tol", (np.asarray(r64.pri_res)
                       / np.maximum(np.asarray(r64.pri_tol), 1e-300)).round(2),
          "rd/tol", (np.asarray(r64.dua_res)
                     / np.maximum(np.asarray(r64.dua_tol), 1e-300)).round(2))

    # arm B: fp32 eig (interpret) from the same carry incl. its tinv
    st32 = admm.ADMMSettings(solve_mode="eig", max_iter=4000,
                             stall_exit_chunks=12, stall_tighten_chunks=24,
                             pallas_tile=4)
    prob32 = admm.prepare_problem(static, dims, settings=st32,
                                  dtype=jnp.float32, pad=True)
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    s32 = admm.init_state(prob32, B, st32)
    s32 = s32._replace(
        xbar=f32(g("xbar")), ybar=f32(g("ybar")), zbar=f32(g("zbar")),
        rho_scale=f32(g("rho_scale")), minv=f32(g("minv")),
        ref_coef=f32(g("ref")), minv_ok=jnp.ones((), dtype=bool))
    r32 = admm.admm_solve(prob32, tuple(f32(c) for c in coeffs),
                          f32(l), f32(u), s32, st32)
    print("fp32 eig warm:", "status", np.asarray(r32.status),
          "iters", np.asarray(r32.done_iters))
    print("  rp/tol", (np.asarray(r32.pri_res)
                       / np.maximum(np.asarray(r32.pri_tol), 1e-30)).round(2),
          "rd/tol", (np.asarray(r32.dua_res)
                     / np.maximum(np.asarray(r32.dua_tol), 1e-30)).round(2))

    # true fp64 residuals of each fp32 iterate on the unscaled problem
    P, q = static.P, static.q
    for i, b in enumerate(scen):
        A = materialize_A(static, *[float(c[i]) for c in coeffs])
        x = np.asarray(r32.x[i], dtype=np.float64)[:A.shape[1]]
        Ax = A @ x
        li, ui = np.asarray(l[i]), np.asarray(u[i])
        pviol = max(np.maximum(Ax - ui, 0).max(), np.maximum(li - Ax, 0).max())
        x64 = np.asarray(r64.x[i], dtype=np.float64)[:A.shape[1]]
        pviol64 = max(np.maximum(A @ x64 - ui, 0).max(),
                      np.maximum(li - A @ x64, 0).max())
        iu = (dims.Nx + 1) * 4
        du = np.abs(x[iu:iu + 2] - x64[iu:iu + 2]).max()
        print(f"scen {b}: true prim viol fp32 {pviol:.3e} vs fp64 {pviol64:.3e}"
              f"  control dev |u32-u64| {du:.3e}")


def dump_full(path, step, runs=128, seed=20260818):
    """Capture the FULL carry entering ``step`` plus that step's recorded
    statuses (same compiled program, bit-exact)."""
    import jax
    import jax.numpy as jnp
    from mpc_arpo_project_tpu.rollout import discrete

    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    eng, _ = build()
    rng = np.random.RandomState(seed)
    draws = rng.normal(0.0, 1.0, size=(eng.nsim // 50 + 2, runs, 4))
    noise = discrete.noise_sequence_from_draws(eng, draws)
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
             alive=c.alive, status=st, step=np.asarray(step))
    print(f"wrote {path}: step {step}, statuses "
          f"{dict(zip(*[a.tolist() for a in np.unique(st, return_counts=True)]))}")


def resolve_full(path):
    """Re-solve the captured full-batch step ON THE CURRENT BACKEND with the
    production settings and compare statuses to the recorded ones."""
    import jax
    import jax.numpy as jnp
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.ops.qp_builder import QPDims, build_qp
    from tools.ref_sim import discretize_np, synth_gains_np

    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    d = np.load(path)
    # use the ENGINE's problem: build_engine pins the Ruiz scaling to the
    # scenario's nominal coefficients — a default-scaled prepare_problem is
    # a DIFFERENT solver (measured: 85% status agreement on the step-65
    # re-solve until this was fixed)
    eng, _ = build()
    prob, st = eng.prob, eng.settings
    dt = jnp.float32
    B = d["l"].shape[0]
    state = admm.init_state(prob, B, st)
    state = state._replace(
        xbar=jnp.asarray(d["xbar"], dt), ybar=jnp.asarray(d["ybar"], dt),
        zbar=jnp.asarray(d["zbar"], dt), rho_scale=jnp.asarray(d["rho"], dt),
        minv=jnp.asarray(d["minv"], dt), ref_coef=jnp.asarray(d["ref"], dt),
        minv_ok=jnp.ones((), dtype=bool))
    r = admm.admm_solve(prob, (jnp.asarray(d["c1"], dt),
                               jnp.asarray(d["c2"], dt),
                               jnp.asarray(d["s"], dt)),
                        jnp.asarray(d["l"], dt), jnp.asarray(d["u"], dt),
                        state, st, active=jnp.asarray(d["alive"]))
    got = np.asarray(r.status)
    rec = d["status"]
    alive = d["alive"]
    print("backend:", jax.devices()[0].platform)
    agree = (got[alive] == rec[alive]).mean()
    print(f"status agreement on alive rows: {agree:.4f}")
    for code, nm in ((1, "SOLVED"), (2, "MAX_ITER"), (3, "PINF")):
        print(f"  {nm}: recorded {(rec[alive] == code).sum()}  "
              f"re-solved {(got[alive] == code).sum()}")
    mi = np.nonzero(alive & (rec == 2))[0]
    print("recorded-MAX_ITER rows re-solve to:",
          dict(zip(*[a.tolist() for a in
                     np.unique(got[mi], return_counts=True)])))
    print("their done_iters:", np.asarray(r.done_iters)[mi].tolist())


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", default=None)
    ap.add_argument("--analyze", default=None)
    ap.add_argument("--dump-full", default=None)
    ap.add_argument("--resolve-full", default=None)
    ap.add_argument("--step", type=int, default=65)
    args = ap.parse_args()
    if args.dump:
        dump(args.dump)
    elif args.analyze:
        analyze(args.analyze)
    elif args.dump_full:
        dump_full(args.dump_full, args.step)
    elif args.resolve_full:
        resolve_full(args.resolve_full)
