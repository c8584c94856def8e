"""BASELINE deviation harness: max control deviation vs the OSQP-algorithm oracle.

Runs the oracle closed-loop simulator over a scenario, records the exact QP
data (bounds + dynamic coefficients) of every control step, then solves the
same QP sequence with the in-graph batched solver (warm-started through the
sequence exactly like the rollout does) and reports the maximum deviation of
the extracted control input — the BASELINE.json "max control deviation vs
OSQP" metric, measured per-solve so closed-loop chaos cannot inflate it.

Ground truth per step: the oracle re-solved at tight tolerance + polish.

Usage:
    python tools/deviation_bench.py [--mode chol|pallas] [--steps 60]
        [--dtype f32|f64] [--accurate]
"""

from __future__ import annotations

import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="chol", choices=["chol", "pallas", "eig"])
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--dtype", default="f64", choices=["f32", "f64"])
    ap.add_argument("--accurate", action="store_true",
                    help="accuracy-mode solver settings (tighter eps)")
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from examples.common import radial_config
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.ops.qp_builder import QPDims, build_qp, materialize_A
    from tools import ref_sim
    from tools.osqp_ref import OSQPRef

    sim, mpc, fail, debris = radial_config(noisy=True, T_final=args.steps * 0.5)
    dims = QPDims(Nx=mpc.Nx, Nc=mpc.Nc, Nb=mpc.Nb)

    # --- record the oracle's QP sequence
    recorded = []
    orig_cfg = ref_sim.configure_dynamic_np

    Ad, Bd = ref_sim.discretize_np(sim.mean_mtn, sim.time_stp, sim.isDeltaV)
    K, QN, *_ = ref_sim.synth_gains_np(Ad, Bd, mpc, fail)
    static = build_qp(dims, sim, mpc, Ad, Bd, K, QN)
    c1_0, c2_0, s0, _, _ = ref_sim.configure_dynamic_np(
        sim, debris, np.concatenate([sim.x0, [0.0, 0.0]])
    )

    from tools.osqp_ref import OSQPRef as _O

    solves = []
    orig_solve = _O.solve

    def recording_solve(self):
        solves.append(
            dict(l=self.l.copy(), u=self.u.copy(), A=self._rec_A.copy()
                 if hasattr(self, "_rec_A") else None)
        )
        return orig_solve(self)

    orig_update = _O.update

    def recording_update(self, l=None, u=None, A=None):
        if A is not None:
            self._rec_A = np.asarray(A)
        return orig_update(self, l=l, u=u, A=A)

    orig_init = _O.__init__

    def recording_init(self, P, q, A, l, u, **kw):
        orig_init(self, P, q, A, l, u, **kw)
        self._rec_A = np.asarray(A)

    _O.__init__ = recording_init
    _O.solve = recording_solve
    _O.update = recording_update
    try:
        run = ref_sim.simulate_discrete(sim, mpc, fail, debris, seed=3)
    finally:
        _O.__init__ = orig_init
        _O.solve = orig_solve
        _O.update = orig_update

    n_steps = len(solves)
    print(f"recorded {n_steps} QP solves from the oracle closed loop "
          f"(statuses: {dict((s, run.statuses.count(s)) for s in set(run.statuses))})")

    # dynamic coefficients per step from the recorded A matrices
    fr0, vx0 = static.fun_rows[0], static.velx_cols[0]
    dr0, px0 = static.deb_rows[0], static.posx_cols[0]
    coeffs = np.array(
        [
            (s_["A"][fr0, vx0], s_["A"][fr0, static.vely_cols[0]], s_["A"][dr0, px0])
            for s_ in solves
        ]
    )

    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    settings = admm.ADMMSettings(
        solve_mode=args.mode,
        **(dict(eps_abs=1e-5, eps_rel=1e-10, max_iter=10000) if args.accurate else {}),
    )
    prob = admm.prepare_problem(
        static, dims, settings, nominal_coeffs=(c1_0, c2_0, -s0), dtype=dtype,
        pad=(args.mode in ("pallas", "eig")),
    )
    state = admm.init_state(prob, 1, settings)

    i0 = (dims.Nx + 1) * 4
    max_dev = 0.0
    devs = []
    for k, s_ in enumerate(solves):
        c1, c2, s3 = coeffs[k]
        cc = (jnp.full(1, c1, dtype=dtype), jnp.full(1, c2, dtype=dtype),
              jnp.full(1, s3, dtype=dtype))
        res = admm.admm_solve(
            prob, cc, jnp.asarray(s_["l"], dtype=dtype)[None],
            jnp.asarray(s_["u"], dtype=dtype)[None], state, settings,
        )
        state = res.state
        solved = int(res.status[0]) == admm.SOLVED
        u_jax = np.asarray(res.x[0, i0 : i0 + 2])
        # ground truth: tight oracle + polish on the same QP
        oracle = OSQPRef(static.P, static.q, s_["A"], s_["l"], s_["u"],
                         eps_abs=1e-6, eps_rel=1e-10, max_iter=60000)
        rt = oracle.polish(oracle.solve())
        u_true = rt.x[i0 : i0 + 2]
        d = float(np.abs(u_jax - u_true).max())
        devs.append((d, solved))
        max_dev = max(max_dev, d)

    conv = np.asarray([d for d, s in devs if s])
    unconv = np.asarray([d for d, s in devs if not s])
    print(f"mode={args.mode} dtype={args.dtype} accurate={args.accurate}:")
    if conv.size:
        print(f"  converged steps ({conv.size}/{n_steps}): control deviation "
              f"max={conv.max():.3e} median={np.median(conv):.3e}")
    if unconv.size:
        # steps that exhausted max_iter before the tight tolerance (degenerate
        # active sets) — report the returned iterate's deviation anyway
        print(f"  max-iter steps ({unconv.size}/{n_steps}): deviation "
              f"max={unconv.max():.3e} median={np.median(unconv):.3e}")
    return float(conv.max()) if conv.size else float("nan")


if __name__ == "__main__":
    main()
