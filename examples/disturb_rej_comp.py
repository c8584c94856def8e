"""BASELINE config 2: offset-free vs plain MPC under constant-bias noise —
the disturbance-rejection Monte-Carlo study (reference `test/disturbRejComp.py`),
collapsed from 2000 serial sims into batched sharded rollouts.

    python examples/disturb_rej_comp.py [--runs 100] [--cpu]
"""

import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=100, help="MC runs per noise length")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true", help="3 noise lengths, short horizon")
    ap.add_argument("--max-iter", type=int, default=1000)
    ap.add_argument("--per-setting", action="store_true",
                    help="legacy path: one engine build per noise length/arm "
                         "(default is the fused one-compile study)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from examples.common import radial_config
    from mpc_arpo_project_tpu.parallel import mc

    T_final = 50.0 if args.quick else 150.0
    sim_rej, mpc, fail, debris = radial_config(noisy=True, T_final=T_final)
    import dataclasses

    from mpc_arpo_project_tpu.config import Noise

    noise = Noise((0.7, 0.7), 50)  # disturbRejComp sigma (`:23-25`)
    sim_rej = dataclasses.replace(sim_rej, noise=noise, isReject=True)
    sim_norej = dataclasses.replace(sim_rej, isReject=False)

    noise_lengths = [10.0, 50.0, 150.0] if args.quick else [1.0, 10.0, 20.0, 30.0, 50.0, 70.0, 100.0, 150.0, 200.0, 250.0]

    from mpc_arpo_project_tpu.ops import admm

    dtype = jnp.float64 if args.cpu else jnp.float32
    import time
    t0 = time.time()
    if args.per_setting:
        nls, ratios = mc.disturbance_rejection_study(
            sim_norej, sim_rej, mpc, fail, debris, noise_lengths, args.runs,
            jax.random.key(0), dtype=dtype,
            settings=admm.ADMMSettings(max_iter=args.max_iter),
        )
    else:
        # fused: hold-length -> per-scenario noise data, reject switch ->
        # per-scenario array; ONE engine build + ONE compile for the grid
        nls, ratios = mc.disturbance_rejection_study_fused(
            sim_rej, mpc, fail, debris, noise_lengths, args.runs,
            jax.random.key(0), dtype=dtype,
            settings=admm.ADMMSettings(max_iter=args.max_iter),
        )
    print(f"study wall: {time.time()-t0:.1f}s "
          f"({'per-setting' if args.per_setting else 'fused one-compile'})")
    for nl, r in zip(nls, ratios):
        print(f"noise_length={nl:6.0f} steps ({nl * sim_rej.time_stp:6.1f}s): "
              f"final-distance ratio (reject/no-reject) = {r:.3f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(6, 4), dpi=150)
    plt.plot(np.asarray(nls) * sim_rej.time_stp, ratios, "x-")
    plt.title("Final Distance Ratio vs Noise Length")
    plt.ylabel("Final Distance Ratio")
    plt.xlabel("Noise Length (s)")
    os.makedirs("RunFigs", exist_ok=True)
    plt.savefig("RunFigs/disturbRejComp.png")
    print("saved RunFigs/disturbRejComp.png")


if __name__ == "__main__":
    main()
