"""Status-mix comparison: fp64 oracle vs production fp32 Pallas closed loop.

The solver status drives the reference's failsafe switching
(`/root/reference/src/trajectorySimulate.py:296-314`), so the production
path's acceptance test is: at IDENTICAL settings and noise draws, does the
fp32 Pallas closed loop produce the same per-step status mix, controller
usage, and success rate as the fp64 NumPy oracle (`tools/ref_sim.py`)?

    python tools/status_mix.py --config bench --runs 16          # TPU + oracle
    python tools/status_mix.py --config ref --runs 16 --skip-oracle

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


def build_configs(which: str):
    from mpc_arpo_project_tpu.config import (
        SimConditions, MPCParams, FailsafeParams, Noise, Debris,
    )

    v_ecr = 50000.0 * np.ones(5)
    v_ecr[-2] *= -1
    v_ecr[-1] = 0.0
    if which == "bench":
        Nx, sigma, T_final = 50, 0.75, 150.0
    else:  # reference success-rate study config (success_rates_test.py:13-15,57)
        Nx, sigma, T_final = 40, 0.3, 300.0
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
        Noise((sigma, sigma), 50),
        False,
        T_final=T_final,
    )
    return sim, mpc, fail, debris


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=["bench", "ref"], default="bench")
    ap.add_argument("--runs", type=int, default=16)
    ap.add_argument("--max-iter", type=int, default=4000)
    ap.add_argument("--stall", type=int, default=12)
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--skip-prod", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="prod arm on CPU fp64 chol")
    ap.add_argument("--out", default="/tmp/status_mix.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.rollout import discrete

    sim, mpc, fail, debris = build_configs(args.config)
    B = args.runs
    nsim = sim.nsim
    noise_rep = int(sim.noise.noise_length)
    n_draws = nsim // noise_rep + 2
    rng = np.random.RandomState(20260818)
    draws = rng.normal(0.0, 1.0, size=(n_draws, B, 4))

    summary = {"config": args.config, "runs": B, "nsim": nsim,
               "max_iter": args.max_iter, "stall": args.stall}

    # ---- production arm: fp32 Pallas (or --cpu fp64 chol) rollout
    if not args.skip_prod:
        settings = admm.ADMMSettings(
            max_iter=args.max_iter,
            solve_mode="chol" if args.cpu else "pallas",
            stall_exit_chunks=args.stall,
        )
        dtype = jnp.float64 if args.cpu else jnp.float32
        t0 = time.time()
        engine = discrete.build_engine(sim, mpc, fail, debris,
                                       settings=settings, dtype=dtype)
        noise_seq = discrete.noise_sequence_from_draws(engine, draws)
        out = discrete.rollout_chunked(engine, noise_seq, seg=10)
        st = np.asarray(out.status)  # (T, B), -1 for dead
        codes = {k: int((st == k).sum()) for k in STATUS_NAME}
        alive = int((st >= 0).sum())
        prod = {
            "arm": "chol_fp64_cpu" if args.cpu else "pallas_fp32",
            "wall_s": round(time.time() - t0, 1),
            "alive_steps": alive,
            "mix": {STATUS_NAME[k]: round(v / max(alive, 1), 4)
                    for k, v in codes.items()},
            "counts": {STATUS_NAME[k]: v for k, v in codes.items()},
            "success_rate": float(np.asarray(out.success).mean()),
            "mean_i_term": float(np.asarray(out.i_term).mean()),
            "ctrl_usage": {
                "mpc": int((np.asarray(out.ctrl_seq) == 1).sum()),
                "failsafe": int((np.asarray(out.ctrl_seq) == 2).sum()),
                "deadbeat": int((np.asarray(out.ctrl_seq) == 3).sum()),
            },
        }
        summary["prod"] = prod
        print(json.dumps(prod, indent=1), flush=True)

    # ---- oracle arm: serial fp64 NumPy replica at identical settings/noise
    if not args.skip_oracle:
        from tools import ref_sim

        counts = collections.Counter()
        succ = 0
        i_terms = []
        ctrl_counts = collections.Counter()
        t0 = time.time()
        for b in range(B):
            run = ref_sim.simulate_discrete(
                sim, mpc, fail, debris, noise_draws=draws[:, b],
                solver_kwargs=dict(max_iter=args.max_iter,
                                   stall_exit_chunks=args.stall),
            )
            counts.update(run.statuses)
            succ += bool(run.success)
            i_terms.append(run.i_term)
            ctrl_counts.update(run.ctrl_seq.astype(int).tolist())
            print(f"  oracle {b + 1}/{B}: i_term={run.i_term} "
                  f"success={run.success} "
                  f"statuses={dict(collections.Counter(run.statuses))}",
                  flush=True)
        alive_o = sum(counts.values())
        oracle = {
            "arm": "oracle_fp64_numpy",
            "wall_s": round(time.time() - t0, 1),
            "alive_steps": alive_o,
            "mix": {STATUS_NAME[ORACLE_TO_CODE[k]]: round(v / alive_o, 4)
                    for k, v in counts.items()},
            "counts": {STATUS_NAME[ORACLE_TO_CODE[k]]: v
                       for k, v in counts.items()},
            "success_rate": succ / B,
            "mean_i_term": float(np.mean(i_terms)),
            "ctrl_usage": {"mpc": ctrl_counts.get(1, 0),
                           "failsafe": ctrl_counts.get(2, 0),
                           "deadbeat": ctrl_counts.get(3, 0)},
        }
        summary["oracle"] = oracle
        print(json.dumps(oracle, indent=1), flush=True)

    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
