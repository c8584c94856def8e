"""Scaling-efficiency harness (BASELINE: >=80% efficiency on >=2 hosts).

Measures Monte-Carlo sweep throughput (sims/s) while growing the device mesh:
weak scaling — the per-device scenario load is constant, so ideal scaling
doubles throughput per doubling of devices. On a dev box this runs on virtual
CPU devices (demonstrating the sharded program is efficiency-clean); on real
hardware the same code measures ICI/DCN scaling.

    python tools/scaling_bench.py [--per-device 8] [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import os
import sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=8)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--virtual", type=int, default=8,
                    help="virtual CPU device count (0 = use real devices)")
    ap.add_argument("--T", type=float, default=30.0)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from examples.common import radial_config
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.parallel import mc
    from mpc_arpo_project_tpu.rollout import discrete
    from mpc_arpo_project_tpu.utils.timing import device_time

    sim, mpc_p, fail, debris = radial_config(noisy=True, T_final=args.T)
    engine = discrete.build_engine(
        sim, mpc_p, fail, debris, settings=admm.ADMMSettings(max_iter=500),
        dtype=jnp.float32 if not args.virtual else jnp.float64,
    )

    results = []
    for nd in args.devices:
        if nd > jax.device_count():
            break
        mesh = Mesh(np.asarray(jax.devices()[:nd]), ("data",))
        B = args.per_device * nd
        f = mc.sharded_stats_fn(engine, mesh)
        noise = discrete.make_noise_sequence(engine, jax.random.key(nd), B)
        t = device_time(f, engine, noise, reps=2, warmup=1)
        sims_s = B / t
        results.append((nd, B, t, sims_s))
        base = results[0][3]
        eff = sims_s / (base * nd)
        print(f"devices={nd:2d} batch={B:4d}: {t:7.2f}s -> {sims_s:8.2f} sims/s "
              f"(scaling efficiency {100*eff:5.1f}%)", flush=True)

    if args.virtual:
        print("NOTE: virtual CPU devices share the physical cores, so weak-"
              "scaling efficiency here is bounded by core count (it validates "
              "the sharded program, not hardware scaling); run on a real "
              "slice for the BASELINE efficiency metric.")


if __name__ == "__main__":
    main()
