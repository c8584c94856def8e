"""Success-rate curve vs noise level — the production-path capability study.

Extends the reference's success-rate MC (`/root/reference/test/saved_runs/
success_rates_test.py:64-75`, 300 serial runs at one sigma) into a curve over
noise levels, run through the PRODUCTION solver (fp32 shared-basis 'eig'
Pallas path on TPU; CPU fp64 'chol' oracle with --oracle). Round-3 measured
values (n=128/arm, identical draws across arms — see BASELINE.md):

    sigma   production (fp32 eig TPU)   oracle (fp64 chol CPU)
    0.0     8/8   (100%)                docks (0.131 m final)
    0.01    81/128 (63.3%)
    0.03    59/128 (46.1%)
    0.3     1/128  (0.8%)   <- the reference's own sigma: tolerance unreachable

    python examples/success_curve.py --sigmas 0 0.01 0.03 --runs 128
    python examples/success_curve.py --oracle --cpu-runs 32   # fp64 oracle arm
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigmas", type=float, nargs="+",
                    default=(0.0, 0.01, 0.03, 0.3))
    ap.add_argument("--runs", type=int, default=128)
    ap.add_argument("--config", choices=["bench", "ref"], default="ref")
    ap.add_argument("--oracle", action="store_true",
                    help="run the CPU fp64 'chol' oracle arm instead of the "
                         "TPU fp32 production arm")
    ap.add_argument("--cpu-runs", type=int, default=None,
                    help="override --runs for the (slow, serial-ish) oracle")
    ap.add_argument("--out", default="/tmp/success_curve.json")
    args = ap.parse_args()

    import jax

    if args.oracle:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tools.status_mix import build_configs, run_rollout_arm

    rows = []
    for sig in args.sigmas:
        sim, mpc, fail, debris = build_configs(args.config, sig)
        runs = args.runs if sig > 0 else min(args.runs, 8)  # noiseless = deterministic
        if args.oracle and args.cpu_runs:
            runs = args.cpu_runs if sig > 0 else min(args.cpu_runs, 8)
        nsim = sim.nsim
        noise_rep = int(sim.noise.noise_length) if sim.noise else 50
        rng = np.random.RandomState(20260818)
        draws = rng.normal(size=(nsim // noise_rep + 2, runs, 4))
        arm = run_rollout_arm(
            "oracle" if args.oracle else "prod", sim, mpc, fail, debris,
            draws, solve_mode="chol" if args.oracle else "eig",
            dtype_str="f64" if args.oracle else "f32",
            max_iter=4000, stall=12, tighten=24, tile=32)
        rows.append(dict(sigma=sig, runs=runs, **{
            k: arm[k] for k in ("n_success", "success_rate", "mix",
                                "mean_i_term", "wall_s")}))
        print(f"sigma={sig:<5g} success {arm['n_success']}/{runs} "
              f"({arm['success_rate']:.1%})  mix={arm['mix']}", flush=True)

    with open(args.out, "w") as fh:
        json.dump({"config": args.config,
                   "arm": "oracle" if args.oracle else "prod",
                   "rows": rows}, fh, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
