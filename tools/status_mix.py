"""Status-mix / success-rate comparison between solver arms.

The solver status drives the reference's failsafe switching
(`/root/reference/src/trajectorySimulate.py:296-314`), so the production
path's acceptance test is: at IDENTICAL settings and noise draws, does the
production closed loop produce the same per-step status mix, controller
usage, and success rate as the fp64 oracle?

Arms (``--arm``, repeatable):
  prod            TPU fp32, production solve mode (--solve-mode, default eig),
                  production stall settings (--stall/--tighten)
  prod-pallas     TPU fp32, round-2 Newton-Schulz kernel path
  oracle          CPU fp64 'chol' (exact batched Cholesky; iterate-for-iterate
                  pinned against tools/ref_sim + native/osqp_ref.cpp by
                  tests/test_admm.py + test_rollout.py), SAME stall settings
                  as prod — isolates fp32/Pallas effects
  oracle-nostall  CPU fp64 'chol' with stall exit DISABLED at the full
                  max_iter cap — OSQP-faithful termination semantics
                  (`trajectorySimulate.py:296-299`): validates the stall
                  heuristic itself (VERDICT r2 weak #3)
  refsim          serial NumPy oracle (tools/ref_sim.py) — the branch-for-
                  branch reference replica; slow, use small --runs

    python tools/status_mix.py --config bench --runs 128 --arm prod --arm oracle
    python tools/status_mix.py --config ref --runs 16 --arm refsim
    python tools/status_mix.py --sigma 0.01 --runs 128 --arm prod --arm oracle

Writes a JSON summary to --out (default /tmp/status_mix.json).
"""

import argparse
import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STATUS_NAME = {0: "UNSOLVED", 1: "SOLVED", 2: "MAX_ITER", 3: "PINF", 4: "DINF"}
ORACLE_TO_CODE = {
    "solved": 1,
    "max iterations": 2,
    "primal infeasible": 3,
    "dual infeasible": 4,
}


def build_configs(which: str, sigma: float = None):
    from mpc_arpo_project_tpu.config import (
        SimConditions, MPCParams, FailsafeParams, Noise, Debris,
    )

    v_ecr = 50000.0 * np.ones(5)
    v_ecr[-2] *= -1
    v_ecr[-1] = 0.0
    if which == "bench":
        Nx, sig_d, T_final = 50, 0.75, 150.0
    else:  # reference success-rate study config (success_rates_test.py:13-15,57)
        Nx, sig_d, T_final = 40, 0.3, 300.0
    if sigma is not None:
        sig_d = sigma
    # sigma == 0 means NOISELESS (no estimator): a Noise object with zero std
    # leaves the UKF running with zero disturbance process noise, whose
    # singular covariance breaks the fp32 sigma-point Cholesky — the
    # reference's noiseless runs likewise bypass estimation
    noise = Noise((sig_d, sig_d), 50) if sig_d > 0 else None
    mpc = MPCParams(
        8e2 * np.diag([0.2**2, 10**2, 3.8**2, 900.0]),
        1000**2 * np.eye(2),
        5**2 * np.eye(5),
        v_ecr,
        {"Nx": Nx, "Nc": 5, "Nb": 5},
        (0.2, 0.2),
    )
    fail = FailsafeParams(
        0.005 * np.diag([0.0001, 1, 100000.0, 1.0, 0.01]),
        100 * np.eye(2),
        np.eye(1, 4),
        np.zeros((2, 2)),
    )
    debris = Debris((40.0, 0.0), 5.0, 20.0)
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
        noise,
        False,
        T_final=T_final,
    )
    return sim, mpc, fail, debris


def run_rollout_arm(name, sim, mpc, fail, debris, draws, *, solve_mode,
                    dtype_str, max_iter, stall, tighten, tile, seg=10):
    """One batched-rollout arm; fp64 arms force the CPU backend in a
    subprocess-free way only when the whole process is CPU — callers split
    fp32/TPU and fp64/CPU arms across invocations (see __main__)."""
    import jax
    import jax.numpy as jnp

    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.rollout import discrete

    settings = admm.ADMMSettings(
        max_iter=max_iter,
        solve_mode=solve_mode,
        stall_exit_chunks=stall,
        stall_tighten_chunks=tighten,
        pallas_tile=tile,
    )
    dtype = jnp.float64 if dtype_str == "f64" else jnp.float32
    t0 = time.time()
    engine = discrete.build_engine(sim, mpc, fail, debris,
                                   settings=settings, dtype=dtype)
    noise_seq = discrete.noise_sequence_from_draws(engine, draws)
    out = discrete.rollout_chunked(engine, noise_seq, seg=seg)
    st = np.asarray(out.status)  # (T, B), -1 for dead
    codes = {k: int((st == k).sum()) for k in STATUS_NAME}
    alive = int((st >= 0).sum())
    # MAX_ITER fraction by time decile of each scenario's own lifetime:
    # distinguishes warm-start DRIFT (failures cluster late) from a uniform
    # fp32 residual floor (flat profile) — the two round-3 candidate causes
    # of the sigma=0.01 success gap (BASELINE.md round-3 success curve)
    T, B = st.shape
    i_term = np.asarray(out.i_term)  # (B,)
    tt = np.arange(T)[:, None]
    life = np.maximum(i_term[None, :], 1)
    dec = np.minimum(10 * tt // life, 9)  # (T, B) decile index
    mi_by_dec = []
    for d in range(10):
        sel = st[(dec == d) & (st >= 0)]
        mi_by_dec.append(
            round(float((sel == 2).mean()), 4) if sel.size else None)
    # Exit-residual distribution of MAX_ITER steps: discriminates an fp32
    # noise floor sitting JUST above tolerance from genuinely divergent /
    # infeasible-adjacent plateaus. UNITS: for the eig and chol arms
    # discrete.py reports res/tol RATIOS (converged <= 1, plateau ~1-3,
    # divergent >> 1); only solve paths that don't report pri_tol/dua_tol
    # (pallas) fall back to raw scaled residuals. Non-finite exits (the
    # eig nan-reset marks overflowed rows with inf) are filtered from the
    # percentiles and counted separately so the JSON stays strict-valid.
    res_q = {}
    rp = np.asarray(out.pri_res)
    rd = np.asarray(out.dua_res)
    for code, nm in ((2, "MAX_ITER"), (1, "SOLVED")):
        m = (st == code)
        if m.any():
            worst = np.maximum(rp[m], rd[m])
            fin = worst[np.isfinite(worst)]
            res_q[nm] = {
                "pctiles_10_50_90_99": [round(float(v), 6) for v in
                                        np.percentile(fin, [10, 50, 90, 99])]
                if fin.size else None,
                "n_nonfinite": int(worst.size - fin.size),
                "n": int(worst.size),
            }
    return {
        "arm": name,
        "solve_mode": solve_mode,
        "dtype": dtype_str,
        "stall": stall,
        "backend": jax.devices()[0].platform,
        "wall_s": round(time.time() - t0, 1),
        "alive_steps": alive,
        "mix": {STATUS_NAME[k]: round(v / max(alive, 1), 4)
                for k, v in codes.items()},
        "max_iter_frac_by_lifetime_decile": mi_by_dec,
        "exit_residuals_over_tol": res_q,
        "counts": {STATUS_NAME[k]: v for k, v in codes.items()},
        "success_rate": float(np.asarray(out.success).mean()),
        "n_success": int(np.asarray(out.success).sum()),
        "mean_i_term": float(np.asarray(out.i_term).mean()),
        "ctrl_usage": {
            "mpc": int((np.asarray(out.ctrl_seq) == 1).sum()),
            "failsafe": int((np.asarray(out.ctrl_seq) == 2).sum()),
            "deadbeat": int((np.asarray(out.ctrl_seq) == 3).sum()),
        },
    }


def run_refsim_arm(sim, mpc, fail, debris, draws, *, max_iter, stall):
    from tools import ref_sim

    B = draws.shape[1]
    counts = collections.Counter()
    succ = 0
    i_terms = []
    ctrl_counts = collections.Counter()
    t0 = time.time()
    for b in range(B):
        run = ref_sim.simulate_discrete(
            sim, mpc, fail, debris, noise_draws=draws[:, b],
            solver_kwargs=dict(max_iter=max_iter, stall_exit_chunks=stall),
        )
        counts.update(run.statuses)
        succ += bool(run.success)
        i_terms.append(run.i_term)
        ctrl_counts.update(run.ctrl_seq.astype(int).tolist())
        print(f"  refsim {b + 1}/{B}: i_term={run.i_term} "
              f"success={run.success} "
              f"statuses={dict(collections.Counter(run.statuses))}",
              flush=True)
    alive_o = sum(counts.values())
    return {
        "arm": "refsim",
        "solve_mode": "numpy",
        "dtype": "f64",
        "stall": stall,
        "wall_s": round(time.time() - t0, 1),
        "alive_steps": alive_o,
        "mix": {STATUS_NAME[ORACLE_TO_CODE[k]]: round(v / alive_o, 4)
                for k, v in counts.items()},
        "counts": {STATUS_NAME[ORACLE_TO_CODE[k]]: v
                   for k, v in counts.items()},
        "success_rate": succ / B,
        "n_success": succ,
        "mean_i_term": float(np.mean(i_terms)),
        "ctrl_usage": {"mpc": ctrl_counts.get(1, 0),
                       "failsafe": ctrl_counts.get(2, 0),
                       "deadbeat": ctrl_counts.get(3, 0)},
    }


ARMS = ("prod", "prod-pallas", "oracle", "oracle-nostall", "refsim")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=["bench", "ref"], default="bench")
    ap.add_argument("--sigma", type=float, default=None,
                    help="override the config's noise std (both axes)")
    ap.add_argument("--runs", type=int, default=128)
    ap.add_argument("--max-iter", type=int, default=4000)
    ap.add_argument("--stall", type=int, default=12)
    ap.add_argument("--tighten", type=int, default=24)
    ap.add_argument("--solve-mode", default="eig", choices=("eig", "pallas"))
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--seg", type=int, default=10)
    ap.add_argument("--arm", action="append", choices=ARMS, default=None,
                    help="repeatable; default: prod + oracle")
    ap.add_argument("--seed", type=int, default=20260818)
    ap.add_argument("--shard", default=None,
                    help="'i/N': run only scenario columns [i*runs/N, (i+1)*"
                         "runs/N) of the full --runs draw matrix. Draws are "
                         "generated at full width first, so shard results are "
                         "bit-identical slices of the unsharded run; counts/"
                         "successes sum across shards (tools/merge_shards.py). "
                         "Lets multi-hour fp64 oracle arms land durable "
                         "partial progress on a 2-core host.")
    ap.add_argument("--out", default="/tmp/status_mix.json")
    args = ap.parse_args()
    arms = args.arm or ["prod", "oracle"]

    import jax

    # fp64 oracle arms need the CPU backend + x64; fp32 prod arms need the
    # TPU. jax backends are process-global, so a mixed-arm invocation forces
    # CPU only if no TPU arm was requested.
    tpu_arms = {"prod", "prod-pallas"} & set(arms)
    if not tpu_arms:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    elif {"oracle", "oracle-nostall"} & set(arms):
        raise SystemExit(
            "fp64 oracle arms need the CPU backend; run them in a separate "
            "invocation from the TPU prod arms (same --seed gives identical "
            "draws)")
    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sim, mpc, fail, debris = build_configs(args.config, args.sigma)
    B = args.runs
    nsim = sim.nsim
    noise_rep = int(sim.noise.noise_length) if sim.noise is not None else 50
    n_draws = nsim // noise_rep + 2
    rng = np.random.RandomState(args.seed)
    draws = rng.normal(0.0, 1.0, size=(n_draws, B, 4))
    shard = None
    if args.shard:
        i, n = (int(v) for v in args.shard.split("/"))
        lo, hi = i * B // n, (i + 1) * B // n
        draws = draws[:, lo:hi]
        shard = {"index": i, "of": n, "lo": lo, "hi": hi}
        print(f"shard {i}/{n}: scenarios [{lo}, {hi}) of {B}", flush=True)

    summary = {"config": args.config, "sigma": args.sigma, "runs": B,
               "nsim": nsim, "max_iter": args.max_iter, "seed": args.seed,
               "shard": shard, "arms": {}}

    for arm in arms:
        if arm == "refsim":
            r = run_refsim_arm(sim, mpc, fail, debris, draws,
                               max_iter=args.max_iter, stall=args.stall)
        elif arm == "prod":
            r = run_rollout_arm(
                arm, sim, mpc, fail, debris, draws, solve_mode=args.solve_mode,
                dtype_str="f32", max_iter=args.max_iter, stall=args.stall,
                tighten=args.tighten, tile=args.tile, seg=args.seg)
        elif arm == "prod-pallas":
            r = run_rollout_arm(
                arm, sim, mpc, fail, debris, draws, solve_mode="pallas",
                dtype_str="f32", max_iter=args.max_iter, stall=args.stall,
                tighten=args.tighten, tile=args.tile, seg=args.seg)
        elif arm == "oracle":
            r = run_rollout_arm(
                arm, sim, mpc, fail, debris, draws, solve_mode="chol",
                dtype_str="f64", max_iter=args.max_iter, stall=args.stall,
                tighten=args.tighten, tile=args.tile, seg=args.seg)
        elif arm == "oracle-nostall":
            r = run_rollout_arm(
                arm, sim, mpc, fail, debris, draws, solve_mode="chol",
                dtype_str="f64", max_iter=args.max_iter, stall=0,
                tighten=10**6, tile=args.tile, seg=args.seg)
        summary["arms"][arm] = r
        print(json.dumps(r, indent=1), flush=True)
        # write INCREMENTALLY: a multi-arm invocation can take hours (the
        # fp64 no-stall oracle runs plateaued QPs to the full cap) and a
        # killed process must not lose completed arms
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)

    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
