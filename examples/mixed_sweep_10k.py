"""BASELINE config 4: one-chip batched MC sweep of ~10k MIXED scenarios —
radial + in-track approaches with per-scenario initial conditions, noise
draws, noise hold-lengths, offset-free switches, and a per-ENGINE weight
grid (the `traj_eval_*` drivers' freely-varied MPCParams,
`/root/reference/test/traj_eval_radial.py:17-72`,
`test/traj_eval_in_track.py:47-63`).

What varies WHERE (the engine's architectural split, see config.py):
  * per-scenario (one compiled program, one batch): x0, noise draws,
    noise hold-length, isReject — all pure array data;
  * per-engine (weight grid): Q/Ru/slack weights and approach orientation.
    Weights change the DARE terminal policy K and hence the batch-shared
    constraint matrix stitching (`ops/qp_builder.py`), so they CANNOT vary
    inside one batch; the sweep instead builds one engine per weight
    setting. All engines share one jitted executable (identical shapes),
    so the grid costs host-side engine builds only, not recompiles.

The reference runs such sweeps as overnight serial loops
(`test/traj_eval_radial.py:4-5,92-105`).

    python examples/mixed_sweep_10k.py                  # TPU, 10,240 scenarios
    python examples/mixed_sweep_10k.py --virtual 8 --batch 64 --quick
"""

import argparse
import os
import sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024,
                    help="scenarios per engine")
    ap.add_argument("--ru-scales", type=float, nargs="+",
                    default=(0.25, 0.5, 1.0, 2.0, 4.0),
                    help="control-weight multipliers (one engine each)")
    ap.add_argument("--virtual", type=int, default=0,
                    help="run on N virtual CPU devices (dev-box mode)")
    ap.add_argument("--quick", action="store_true",
                    help="short horizon + max_iter for smoke runs")
    ap.add_argument("--solve-mode", default=None,
                    help="override solver (default: eig on TPU, chol on CPU)")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses
    import functools

    import jax.numpy as jnp

    from examples.common import radial_config, in_track_config
    from mpc_arpo_project_tpu.config import Noise
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.parallel import mesh as mesh_lib
    from mpc_arpo_project_tpu.rollout import discrete

    on_cpu = jax.devices()[0].platform == "cpu"
    solve_mode = args.solve_mode or ("chol" if on_cpu else "eig")
    dtype = jnp.float64 if on_cpu else jnp.float32
    T_final = 30.0 if args.quick else 150.0
    settings = admm.ADMMSettings(
        max_iter=500 if args.quick else 4000,
        solve_mode=solve_mode,
        stall_exit_chunks=12,
        stall_tighten_chunks=24,
    )
    B = args.batch
    mesh = mesh_lib.make_mesh()
    print(f"devices: {jax.device_count()}  solve_mode={solve_mode}  "
          f"batch/engine={B}  engines={2 * len(args.ru_scales)}")

    # ---- engine grid: (radial | in-track) x Ru scale
    def scaled(mpc_p, w):
        return dataclasses.replace(mpc_p, R_input=np.asarray(mpc_p.R_input) * w)

    grid = []
    for w in args.ru_scales:
        sim_r, mpc_r, fail_r, deb_r = radial_config(noisy=True, T_final=T_final)
        grid.append(("radial", w, sim_r, scaled(mpc_r, w), fail_r, deb_r))
        sim_i, mpc_i, fail_i, deb_i = in_track_config(T_final=T_final)
        # the reference's in-track driver is noiseless/plain-MPC; the sweep
        # adds the radial study's noise model so the MC axes (noise hold,
        # isReject) exist on both orientations
        sim_i = dataclasses.replace(sim_i, noise=Noise((0.3, 0.3), 50),
                                    isReject=True)
        grid.append(("in-track", w, sim_i, scaled(mpc_i, w), fail_i, deb_i))

    noise_sh = mesh_lib.batch_sharding(mesh, batch_axis=1)
    arg_sh = mesh_lib.batch_sharding(mesh, batch_axis=0)
    repl = mesh_lib.replicated(mesh)

    def stats(engine, noise_seq, x0b, is_rej):
        out = discrete.rollout(engine, noise_seq, x0b=x0b, is_reject_b=is_rej)
        T1 = out.x_true.shape[0]
        idx = jnp.clip(out.i_term - 1, 0, T1 - 1)
        xf = jnp.take_along_axis(
            out.x_true, idx[None, :, None].astype(jnp.int32), axis=0)[0]
        fd = jnp.linalg.norm(xf - engine.xr[None, :], axis=1)
        # scenarios can genuinely diverge (fp32 overflow under sustained
        # failsafe on infeasible geometry) — count them, keep means finite
        div = ~jnp.isfinite(fd)
        fd = jnp.where(div, 0.0, fd)
        st = out.status
        alive = out.ctrl_seq > 0
        return dict(
            n_success=out.success.sum(),
            n_diverged=div.sum(),
            sum_final_dist=fd.sum(),
            sum_i_term=out.i_term.sum(),
            alive_steps=alive.sum(),
            n_solved=((st == 1)).sum(),
            n_maxiter=((st == 2)).sum(),
            n_pinf=((st == 3)).sum(),
            total_iters=out.iters.sum(),
        )

    # one jitted executable per engine tree-structure (radial vs in-track
    # differ in static aux data); engines within a weight grid share one
    jstats_cache = {}

    def get_jstats(engine):
        struct = jax.tree_util.tree_structure(engine)
        if struct not in jstats_cache:
            eng_sh = jax.tree.map(lambda _: repl, engine)
            jstats_cache[struct] = jax.jit(
                stats, in_shardings=(eng_sh, noise_sh, arg_sh, arg_sh),
                out_shardings=repl)
        return jstats_cache[struct]

    rng = np.random.RandomState(20260820)
    totals = {}
    rows = []
    t_all = time.time()
    build_s = 0.0
    for gi, (orient, w, sim, mpc_p, fail, deb) in enumerate(grid):
        t0 = time.time()
        engine = discrete.build_engine(sim, mpc_p, fail, deb,
                                       settings=settings, dtype=dtype)
        build_s += time.time() - t0
        jstats = get_jstats(engine)

        # per-scenario variation: x0 jitter, hold length, isReject
        base_x0 = np.asarray(sim.x0)
        jit_x = rng.uniform(-10, 10, size=B)
        jit_y = rng.uniform(-5, 5, size=B)
        x0b = np.tile(base_x0, (B, 1))
        if orient == "radial":
            x0b[:, 0] += jit_x
            x0b[:, 1] += jit_y
        else:
            x0b[:, 0] += jit_y
            x0b[:, 1] += jit_x
        hold = rng.choice([10, 25, 50, 100], size=B)
        is_rej = (np.arange(B) % 2 == 0).astype(np.float64)

        key = jax.random.fold_in(jax.random.key(7), gi)
        noise_seq = discrete.make_noise_sequence_multi(engine, key, hold)
        x0b_j = jnp.asarray(x0b, dtype=dtype)
        rej_j = jnp.asarray(is_rej, dtype=dtype)
        r = jax.tree.map(lambda v: float(np.asarray(v)),
                         jstats(engine, noise_seq, x0b_j, rej_j))
        rows.append((orient, w, r))
        for k, v in r.items():
            totals[k] = totals.get(k, 0.0) + v
        nok = B - int(r["n_diverged"])
        print(f"  [{gi + 1}/{len(grid)}] {orient:8s} Ru*{w:<5g} "
              f"success={int(r['n_success'])}/{B} "
              f"mean_fd={r['sum_final_dist'] / max(nok, 1):7.2f} m "
              f"diverged={int(r['n_diverged'])} "
              f"solved={int(r['n_solved'])} maxiter={int(r['n_maxiter'])} "
              f"pinf={int(r['n_pinf'])}", flush=True)

    wall = time.time() - t_all
    n = B * len(grid)
    steps = int(totals["alive_steps"])
    print(f"\n{n:,} mixed scenarios in {wall:.1f}s "
          f"({build_s:.1f}s of that engine builds) -> {n / wall:.1f} sims/s, "
          f"{steps / wall:,.0f} alive control steps/s")
    ndiv = int(totals["n_diverged"])
    print(f"aggregate: success {int(totals['n_success'])}/{n}, "
          f"diverged {ndiv}, "
          f"mean final dist {totals['sum_final_dist'] / max(n - ndiv, 1):.2f} m"
          f" (over non-diverged), mean i_term {totals['sum_i_term'] / n:.0f}")


if __name__ == "__main__":
    main()
