"""BASELINE config 4: batched Monte-Carlo success-rate study
(reference `test/saved_runs/success_rates_test.py` — 300 serial sims become
mesh-sharded batched rollouts; scale the count freely).

    python examples/success_rates.py [--runs 300] [--chunk 64] [--cpu]
"""

import argparse
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=300)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sigma", type=float, default=0.3, help="noise std (reference uses 0.3)")
    ap.add_argument("--checkpoint", default=None, help="sweep checkpoint path (resume)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import dataclasses

    from examples.common import radial_config
    from mpc_arpo_project_tpu.config import Noise
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.parallel import mc

    sim, mpc, fail, debris = radial_config(noisy=True, T_final=300.0)
    sim = dataclasses.replace(sim, noise=Noise((args.sigma, args.sigma), 50))

    t0 = time.time()
    res = mc.success_rate_study(
        sim, mpc, fail, debris, args.runs, args.chunk, jax.random.key(0),
        settings=admm.ADMMSettings(max_iter=1000),
        dtype=jnp.float64 if args.cpu else jnp.float32,
    )
    el = time.time() - t0
    print(f"{res['n']} runs in {el:.1f}s ({res['n']/el:.1f} sims/s)")
    print(f"success rate: {res['success_rate']:.3f}")
    print(f"mean final distance: {res['mean_final_dist']:.2f} m; "
          f"mean i_term: {res['mean_i_term']:.0f} steps")
    print(f"controller usage: {res['ctrl_usage']}")


if __name__ == "__main__":
    main()
