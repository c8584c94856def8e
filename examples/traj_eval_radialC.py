"""BASELINE config 3: continuous-time nonlinear plant closed loop
(reference `test/traj_eval_radialC.py`), acceleration or impulsive delta-v
input model.

    python examples/traj_eval_radialC.py [--deltav] [--T 150] [--cpu]
"""

import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deltav", action="store_true", help="impulsive delta-v input model")
    ap.add_argument("--T", type=float, default=150.0, help="T_final seconds")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from examples.common import radial_config
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.rollout import continuous
    from mpc_arpo_project_tpu.viz import figurePlotSave, simrun_from_rollout
    from collections import Counter

    sim, mpc, fail, debris = radial_config(
        noisy=True, T_final=args.T, is_delta_v=args.deltav, T_cont=1e-3
    )
    dtype = jnp.float64 if args.cpu else jnp.float32
    engine = continuous.build_engine(
        sim, mpc, fail, debris, settings=admm.ADMMSettings(max_iter=1000), dtype=dtype
    )
    draws = continuous.make_noise_draws(engine, jax.random.key(0), 1)
    out = jax.jit(continuous.rollout, static_argnames=("substep_telemetry",))(
        engine, draws
    )
    it_sub = int(out.i_term_sub[0])
    print(f"i_term_sub={it_sub}/{engine.n_ticks * engine.n_sub} "
          f"({it_sub * sim.T_cont:.1f}s) success={bool(out.success[0])}")
    codes = np.asarray(out.ctrl_seq[:, 0])
    print("controllers:", Counter(codes[codes > 0].tolist()))
    run = simrun_from_rollout(out, 0, continuous=True)
    run.noise_hist = None
    figurePlotSave(sim, debris, run, saveCounter=args.save)
    print(f"figures saved under RunFigs/ with counter {args.save}")


if __name__ == "__main__":
    main()
