"""In-track approach scenario (reference `test/traj_eval_in_track.py`):
noiseless discrete-time run with the swapped Q/R weighting (`swap_xy`),
per-row slack weights, debris at (0, 40), and the hatch rotated 90 degrees.

    python examples/traj_eval_in_track.py [--save N] [--cpu]
"""

import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", type=int, default=0, help="figure counter for RunFigs/")
    ap.add_argument("--cpu", action="store_true", help="run on CPU (fp64)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from examples.common import in_track_config
    from mpc_arpo_project_tpu.rollout import discrete
    from mpc_arpo_project_tpu.viz import figurePlotSave, simrun_from_rollout

    sim, mpc, fail, debris = in_track_config()
    dtype = jnp.float64 if args.cpu else jnp.float32
    engine = discrete.build_engine(sim, mpc, fail, debris, dtype=dtype)
    noise_seq = discrete.make_noise_sequence(engine, jax.random.key(0), 1)
    out = jax.jit(discrete.rollout)(engine, noise_seq)

    run = simrun_from_rollout(out, 0)
    print(f"i_term={run.i_term} success={run.isSuccess}")
    from collections import Counter

    print("controllers:", Counter(np.asarray(run.ctrlr_seq)[: run.i_term].tolist()))
    figurePlotSave(sim, debris, run, saveCounter=args.save)
    print(f"figures saved under RunFigs/ with counter {args.save}")


if __name__ == "__main__":
    main()
