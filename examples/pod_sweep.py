"""BASELINE config 5: pod-scale Monte-Carlo sweep across a device mesh.

On a real multi-chip/multi-host slice this shards the scenario batch over a
hybrid ('dcn','ici') mesh with collective stat reductions; on a dev box it
runs the identical program on virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8).

Multi-host: launch one process per host with the usual JAX env and pass
--distributed; `jax.distributed.initialize()` wires the DCN axis.

    python examples/pod_sweep.py --scenarios 4096 --chunk 512 [--virtual 8]
"""

import argparse
import os
import sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--virtual", type=int, default=0,
                    help="run on N virtual CPU devices (dev-box mode)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: call jax.distributed.initialize()")
    ap.add_argument("--checkpoint", default="pod_sweep_ckpt.json")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    if args.distributed:
        jax.distributed.initialize()
    import jax.numpy as jnp

    from examples.common import radial_config
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.parallel import mc, mesh as mesh_lib
    from mpc_arpo_project_tpu.rollout import discrete

    print(f"devices: {jax.device_count()} ({jax.process_count()} processes)")
    mesh = mesh_lib.make_mesh(hybrid=jax.process_count() > 1)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    sim, mpc_p, fail, debris = radial_config(noisy=True, T_final=60.0)
    engine = discrete.build_engine(
        sim, mpc_p, fail, debris, settings=admm.ADMMSettings(max_iter=1000),
        dtype=jnp.float32 if not args.virtual else jnp.float64,
    )

    t0 = time.time()
    res = mc.run_sweep(
        engine, total=args.scenarios, chunk=args.chunk, key=jax.random.key(1),
        mesh=mesh, checkpoint_path=args.checkpoint,
    )
    el = time.time() - t0
    print(f"{res['n']} scenarios in {el:.1f}s -> {res['n']/el:.1f} sims/s "
          f"({res['n'] * engine.nsim / el:,.0f} control steps/s)")
    print(f"success rate {res['success_rate']:.3f}; "
          f"mean final dist {res['mean_final_dist']:.2f} m")
    print(f"checkpoint: {args.checkpoint} (delete to restart; rerun to resume)")


if __name__ == "__main__":
    main()
