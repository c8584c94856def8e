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


def _build_small_engine(T_final):
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
    settings = admm.ADMMSettings(max_iter=500)
    return discrete.build_engine(sim, mpc_p, fail, debris, settings=settings,
                                 dtype=jnp.float64)


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
