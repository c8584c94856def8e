"""Mesh-sharded Monte-Carlo sweep tests on the 8-virtual-device CPU mesh:
sharded stats must equal unsharded stats, sweeps must be chunkable and
resumable from checkpoint, and the multichip dry run must pass."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from mpc_arpo_project_tpu.config import SimConditions, MPCParams, FailsafeParams, Noise, Debris
from mpc_arpo_project_tpu.ops import admm
from mpc_arpo_project_tpu.parallel import mc, mesh as mesh_lib
from mpc_arpo_project_tpu.rollout import discrete

_ENGINE_CACHE = {}


def _small_engine(T_final=20.0):
    if T_final in _ENGINE_CACHE:
        return _ENGINE_CACHE[T_final]
    _ENGINE_CACHE[T_final] = _build_small_engine(T_final)
    return _ENGINE_CACHE[T_final]


def _build_small_engine(T_final, settings=None):
    v_ecr = 50000.0 * np.ones(5)
    v_ecr[-2] *= -1
    v_ecr[-1] = 0.0
    mpc_p = MPCParams(
        8e2 * np.diag([0.2**2, 10**2, 3.8**2, 900.0]),
        1000**2 * np.eye(2),
        5**2 * np.eye(5),
        v_ecr,
        {"Nx": 40, "Nc": 5, "Nb": 5},
        (0.2, 0.2),
    )
    fail = FailsafeParams(
        0.005 * np.diag([0.0001, 1, 100000.0, 1.0, 0.01]),
        100 * np.eye(2),
        np.eye(1, 4),
        np.zeros((2, 2)),
    )
    debris = Debris((40.0, 0.0), 5.0, 20.0)
    sim = SimConditions(
        np.array([100.0, 10.0, 0.0, 0.0]),
        np.array([2.5, 0.0, 0.0, 0.0]),
        2.5,
        10 * np.pi / 180,
        1.5,
        1.107e-3,
        0.5,
        True,
        (0.2, 45.0),
        Noise((0.2, 0.2), 10),
        False,
        T_final=T_final,
    )
    # mild noise + capped max_iter keep CPU runtime sane; MAX_ITER still
    # exercises the failsafe path exactly like exhausting 4000 would
    if settings is None:
        settings = admm.ADMMSettings(max_iter=500)
    return discrete.build_engine(sim, mpc_p, fail, debris, settings=settings,
                                 dtype=jnp.float64)


def test_sharded_eig_rollout_matches_single_device():
    """VERDICT r3 #5: the PRODUCTION eig solve path — slot sort, alive-first
    packing, mid-solve compaction permutations, scalar-prefetch tile grid,
    capacity-compacted Woodbury refresh — under a sharded mesh must produce
    the same rollout as the single-device run. Rollouts are per-scenario
    independent (no cross-batch reductions), so outputs must match exactly
    up to collective-free fp64 arithmetic."""
    assert jax.device_count() >= 8
    engine = _build_small_engine(20.0, settings=admm.ADMMSettings(
        solve_mode="eig", max_iter=500, stall_exit_chunks=12,
        stall_tighten_chunks=24, pallas_tile=4))
    B = 16
    noise_seq = discrete.make_noise_sequence(engine, jax.random.key(3), B)
    out_local = jax.tree.map(
        np.asarray, jax.jit(discrete.rollout)(engine, noise_seq))

    mesh = mesh_lib.make_mesh()
    noise_sh = mesh_lib.batch_sharding(mesh, batch_axis=1)
    repl = mesh_lib.replicated(mesh)
    eng_sh = jax.tree.map(lambda _: repl, engine)
    f = jax.jit(discrete.rollout, in_shardings=(eng_sh, noise_sh),
                out_shardings=repl)
    out_sh = jax.tree.map(np.asarray, f(engine, noise_seq))

    np.testing.assert_array_equal(out_local.status, out_sh.status)
    np.testing.assert_array_equal(out_local.ctrl_seq, out_sh.ctrl_seq)
    np.testing.assert_array_equal(out_local.i_term, out_sh.i_term)
    np.testing.assert_array_equal(out_local.success, out_sh.success)
    np.testing.assert_array_equal(out_local.done_iters, out_sh.done_iters)
    np.testing.assert_allclose(out_local.x_true, out_sh.x_true,
                               rtol=0, atol=1e-12)


def test_sharded_stats_match_unsharded():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    engine = _small_engine()
    B = 16
    noise_seq = discrete.make_noise_sequence(engine, jax.random.key(1), B)

    mesh = mesh_lib.make_mesh()
    f = mc.sharded_stats_fn(engine, mesh)
    st_sharded = jax.tree.map(np.asarray, f(engine, noise_seq))
    st_local = jax.tree.map(np.asarray, jax.jit(mc.chunk_stats)(engine, noise_seq))

    assert int(st_sharded.n) == B
    assert int(st_sharded.n_success) == int(st_local.n_success)
    assert int(st_sharded.sum_i_term) == int(st_local.sum_i_term)
    np.testing.assert_allclose(
        float(st_sharded.sum_final_dist), float(st_local.sum_final_dist), rtol=1e-6
    )


def test_sweep_checkpoint_resume(tmp_path):
    engine = _small_engine()
    key = jax.random.key(7)
    ck = str(tmp_path / "sweep.json")

    full = mc.run_sweep(engine, total=16, chunk=8, key=key, checkpoint_path=None)

    # run both chunks with a checkpoint, then verify resume is a no-op with
    # identical accumulated results
    ck2 = str(tmp_path / "sweep2.json")
    partial = mc.run_sweep(engine, total=16, chunk=8, key=key, checkpoint_path=ck2)
    with open(ck2) as fh:
        state = json.load(fh)
    assert state["next_chunk"] == 2
    res2 = mc.run_sweep(engine, total=16, chunk=8, key=key, checkpoint_path=ck2)

    assert partial["n"] == full["n"] == 16
    np.testing.assert_allclose(partial["mean_final_dist"], full["mean_final_dist"], rtol=1e-9)
    np.testing.assert_allclose(res2["mean_final_dist"], full["mean_final_dist"], rtol=1e-9)
    assert res2["n"] == 16


def test_hybrid_mesh_stats():
    engine = _small_engine()
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    from jax.sharding import Mesh

    mesh = Mesh(devices, ("dcn", "ici"))
    f = mc.sharded_stats_fn(engine, mesh)
    B = 16
    noise_seq = discrete.make_noise_sequence(engine, jax.random.key(3), B)
    st = jax.tree.map(np.asarray, f(engine, noise_seq))
    assert int(st.n) == B
    assert np.isfinite(float(st.sum_final_dist))


def test_graft_entry_compiles():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.x_true)
    assert np.isfinite(np.asarray(out.x_true)).all()


def test_graft_dryrun_multichip():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def _small_configs(T_final=20.0):
    """Raw config objects matching _small_engine."""
    v_ecr = 50000.0 * np.ones(5)
    v_ecr[-2] *= -1
    v_ecr[-1] = 0.0
    mpc_p = MPCParams(
        8e2 * np.diag([0.2**2, 10**2, 3.8**2, 900.0]),
        1000**2 * np.eye(2), 5**2 * np.eye(5), v_ecr,
        {"Nx": 40, "Nc": 5, "Nb": 5}, (0.2, 0.2),
    )
    fail = FailsafeParams(
        0.005 * np.diag([0.0001, 1, 100000.0, 1.0, 0.01]), 100 * np.eye(2),
        np.eye(1, 4), np.zeros((2, 2)),
    )
    debris = Debris((40.0, 0.0), 5.0, 20.0)
    sim = SimConditions(
        np.array([100.0, 10.0, 0.0, 0.0]), np.array([2.5, 0.0, 0.0, 0.0]),
        2.5, 10 * np.pi / 180, 1.5, 1.107e-3, 0.5, True, (0.2, 45.0),
        Noise((0.2, 0.2), 10), False, T_final=T_final,
    )
    return sim, mpc_p, fail, debris


def test_noise_sequence_multi_matches_uniform():
    """Uniform per-scenario hold lengths must reproduce make_noise_sequence
    bit-for-bit (same key, same draw count, same gather)."""
    engine = _small_engine()
    key = jax.random.key(11)
    B = 8
    ref = discrete.make_noise_sequence(engine, key, B)
    multi = discrete.make_noise_sequence_multi(
        engine, key, np.full(B, engine.noise_rep)
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(multi))
    # mixed lengths: each scenario's sequence is constant over its own holds
    holds = np.array([1, 2, 4, 5, 8, 10, 20, 40])
    seq = np.asarray(discrete.make_noise_sequence_multi(engine, key, holds))
    T = seq.shape[0]
    for b, h in enumerate(holds):
        for t0 in range(0, T, h):
            blk = seq[t0 : min(t0 + h, T), b]
            assert (blk == blk[0]).all()


def test_is_reject_b_scalar_broadcast_matches_default():
    engine = _small_engine()
    B = 8
    noise_seq = discrete.make_noise_sequence(engine, jax.random.key(5), B)
    out_default = discrete.rollout(engine, noise_seq)
    rej = jnp.broadcast_to(engine.geom.is_reject, (B,))
    out_explicit = discrete.rollout(engine, noise_seq, is_reject_b=rej)
    np.testing.assert_array_equal(
        np.asarray(out_default.x_true), np.asarray(out_explicit.x_true)
    )
    np.testing.assert_array_equal(
        np.asarray(out_default.ctrl_seq), np.asarray(out_explicit.ctrl_seq)
    )


def test_fused_disturbance_study_matches_per_setting():
    """The one-compile fused study must reproduce the per-setting path's
    ratios exactly: same key -> same noise draws per (length, run), same
    engines up to the is_reject scalar."""
    import dataclasses

    sim, mpc_p, fail, debris = _small_configs()
    settings = admm.ADMMSettings(max_iter=500)
    key = jax.random.key(9)
    lengths = [5, 10]
    R = 4  # 2*2*4 = 16 scenarios, divisible by the 8-device mesh

    sim_rej = dataclasses.replace(sim, isReject=True)
    sim_norej = dataclasses.replace(sim, isReject=False)
    nls_f, ratios_f = mc.disturbance_rejection_study_fused(
        sim_rej, mpc_p, fail, debris, lengths, R, key,
        settings=settings, dtype=jnp.float64,
    )
    assert ratios_f.shape == (2,)
    assert np.isfinite(ratios_f).all() and (ratios_f > 0).all()

    # per-setting path with the SAME per-(length,run) noise: rebuild the fused
    # noise block and feed each slice through plain rollouts
    engine_rej = discrete.build_engine(sim_rej, mpc_p, fail, debris,
                                       settings=settings, dtype=jnp.float64)
    engine_norej = discrete.build_engine(sim_norej, mpc_p, fail, debris,
                                         settings=settings, dtype=jnp.float64)
    hold = np.repeat(np.asarray(lengths, dtype=np.int64), R)
    noise_half = discrete.make_noise_sequence_multi(engine_rej, key, hold)
    for li, L in enumerate(lengths):
        ns = noise_half[:, li * R : (li + 1) * R]
        out_r = discrete.rollout(engine_rej, ns)
        out_n = discrete.rollout(engine_norej, ns)
        fd_r = float(np.asarray(mc._final_distance(out_r, engine_rej.xr).sum()))
        fd_n = float(np.asarray(mc._final_distance(out_n, engine_norej.xr).sum()))
        np.testing.assert_allclose(ratios_f[li], fd_r / fd_n, rtol=1e-9)


def test_build_engine_jax_synthesis_matches_scipy():
    """synthesis='jax' (in-graph DARE/dlqr/acker on the CPU backend) must
    reproduce the scipy gains to fp64 accuracy — the engines then produce
    identical rollouts."""
    sim, mpc_p, fail, debris = _small_configs()
    settings = admm.ADMMSettings(max_iter=500)
    e_sp = discrete.build_engine(sim, mpc_p, fail, debris, settings=settings,
                                 dtype=jnp.float64, synthesis="scipy")
    e_jx = discrete.build_engine(sim, mpc_p, fail, debris, settings=settings,
                                 dtype=jnp.float64, synthesis="jax")
    for name in ("Kpf", "Kif", "K_total", "K_i"):
        np.testing.assert_allclose(
            np.asarray(getattr(e_sp, name)), np.asarray(getattr(e_jx, name)),
            rtol=1e-8, atol=1e-10, err_msg=name)
    # QP cost embeds QN; constraint matrix embeds K — compare problem data
    np.testing.assert_allclose(np.asarray(e_sp.prob.Pbar),
                               np.asarray(e_jx.prob.Pbar), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(e_sp.prob.A0bar),
                               np.asarray(e_jx.prob.A0bar), rtol=1e-7, atol=1e-9)
