"""Full-scale continuous-sim artifact (VERDICT r4 task 5).

The reference's flagship "most complex simulation" is the continuous-time
nonlinear closed loop at T_final=300 s, T_cont=1 ms — 300,000 RK45 substeps
(`/root/reference/test/traj_eval_radialC.py:37-38`), run serially in Python.
This tool produces the recorded full-length numbers BASELINE.md was missing:

  --tpu       fp32 production run on the real chip (chunked dispatch),
              wall-clock + substeps/s + outcome + controller mix
  --parity    CPU fp64 in-graph run vs the serial solve_ivp-convention
              oracle (tools/ref_sim.simulate_continuous) at FULL length:
              tick-trajectory agreement, i_term_sub, ctrl_seq equality —
              extends tests/test_continuous.py's T=15..150 s pins to the
              full 300 s / 300k-substep horizon.

    python tools/continuous_fullscale.py --tpu --T 300 [--batch 8]
    python tools/continuous_fullscale.py --parity --T 300
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _configs(T_final):
    from examples.common import radial_config
    return radial_config(noisy=True, T_final=T_final, T_cont=1e-3)


def run_tpu(T_final, batch, seg, out_path):
    import jax
    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.rollout import continuous

    sim, mpc, fail, debris = _configs(T_final)
    engine = continuous.build_engine(
        sim, mpc, fail, debris,
        settings=admm.ADMMSettings(max_iter=1000), dtype=jnp.float32)
    draws = continuous.make_noise_draws(engine, jax.random.key(0), batch)
    n_total = engine.n_ticks * engine.n_sub

    # compile pass (first segment compiles the program; run everything once
    # so the wall-clock measurement below is steady-state)
    t0 = time.time()
    out = continuous.rollout_chunked(engine, draws, seg=seg)
    np.asarray(out.i_term_sub)  # device->host sync
    wall_cold = time.time() - t0

    t0 = time.time()
    out = continuous.rollout_chunked(engine, draws, seg=seg)
    i_term_sub = np.asarray(out.i_term_sub)
    wall = time.time() - t0

    codes = np.asarray(out.ctrl_seq)
    alive_ticks = int((codes > 0).sum())
    rec = {
        "config": "radialC flagship (ref test/traj_eval_radialC.py:37-38)",
        "backend": jax.devices()[0].platform,
        "dtype": "f32",
        "T_final_s": T_final,
        "T_cont_s": 1e-3,
        "batch": batch,
        "substeps_per_scenario": n_total,
        "wall_s": round(wall, 2),
        "wall_cold_s": round(wall_cold, 2),
        "substeps_per_s": round(n_total * batch / wall, 1),
        "alive_ticks": alive_ticks,
        "i_term_sub": i_term_sub.tolist(),
        "success": np.asarray(out.success).astype(int).tolist(),
        "ctrl_usage": {
            "mpc": int((codes == 1).sum()),
            "failsafe": int((codes == 2).sum()),
            "deadbeat": int((codes == 3).sum()),
        },
        "status_mix_alive": {
            str(k): int((np.asarray(out.status) == k).sum())
            for k in (1, 2, 3)
        },
    }
    print(json.dumps(rec, indent=1))
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(f"wrote {out_path}")


def run_parity(T_final, out_path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.rollout import continuous
    from tools.ref_sim import simulate_continuous

    sim, mpc, fail, debris = _configs(T_final)
    engine = continuous.build_engine(
        sim, mpc, fail, debris,
        settings=admm.ADMMSettings(max_iter=1000), dtype=jnp.float64)
    rng = np.random.RandomState(11)
    n_total = engine.n_ticks * engine.n_sub
    n_draws = n_total // engine.noise_int_sub + 2
    draws = rng.normal(size=(n_draws, 2))

    t0 = time.time()
    out = continuous.rollout_chunked(
        engine, engine.sig_cont * jnp.asarray(draws)[:, None, :], seg=25)
    it = int(np.asarray(out.i_term_sub)[0])
    wall_jax = time.time() - t0

    D = np.asarray(engine.base.prob.D)
    E = np.asarray(engine.base.prob.E)
    c = float(engine.base.prob.c)
    t0 = time.time()
    runo = simulate_continuous(
        sim, mpc, fail, debris, noise_draws=draws,
        solver_kwargs=dict(scaling_override=(D, E, c), max_iter=1000))
    wall_oracle = time.time() - t0

    ticks_ok = bool(np.allclose(np.asarray(out.x_true_ticks)[:, 0, :],
                                runo["x_ticks"], atol=1e-6))
    tick_dev = float(np.max(np.abs(np.asarray(out.x_true_ticks)[:, 0, :]
                                   - runo["x_ticks"])))
    rec = {
        "T_final_s": T_final,
        "substeps": n_total,
        "i_term_sub_jax": it,
        "i_term_sub_oracle": int(runo["i_term_sub"]),
        "ctrl_seq_equal": bool(
            (np.asarray(out.ctrl_seq)[:, 0] == runo["ctrl_seq"][1:]).all()),
        "tick_traj_max_abs_dev": tick_dev,
        "tick_traj_atol_1e-6_ok": ticks_ok,
        "success_jax": bool(np.asarray(out.success)[0]),
        "success_oracle": bool(runo["success"]),
        "wall_jax_cpu_s": round(wall_jax, 1),
        "wall_oracle_s": round(wall_oracle, 1),
    }
    print(json.dumps(rec, indent=1))
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--T", type=float, default=300.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seg", type=int, default=25)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.tpu:
        run_tpu(args.T, args.batch,
                args.seg, args.out or "artifacts/contC_tpu_r5.json")
    elif args.parity:
        run_parity(args.T, args.out or "artifacts/contC_parity_r5.json")
