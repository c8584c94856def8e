"""Monte-Carlo scenario sweeps: the reference's serial MC loops as sharded programs.

``run_sweep`` collapses loops like `test/disturbRejComp.py:77-100` (2000 serial
closed-loop sims) and `test/saved_runs/success_rates_test.py:64-75` (300 sims)
into chunked, jitted, mesh-sharded batched rollouts with in-graph stat
reduction (only O(1) scalars leave the device per chunk), plus NumPy-side
accumulation, checkpoint, and resume.

Statistical note: the reference re-seeds ``numpy.random`` with a constant
inside every simulation call (`trajectorySimulate.py:28`), which makes its MC
"trials" identical replays. This framework draws independent noise per
scenario from split PRNG keys — the study designs (paired reject/no-reject
with common random numbers; success-rate counting) are preserved, with real
randomness.
"""

from __future__ import annotations

import functools
import json
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mpc_arpo_project_tpu.rollout import discrete
from mpc_arpo_project_tpu.parallel import mesh as mesh_lib


class SweepStats(NamedTuple):
    """Per-chunk reduced statistics (device scalars)."""

    n: jnp.ndarray  # scenarios in chunk
    n_success: jnp.ndarray
    sum_final_dist: jnp.ndarray  # sum over scenarios of terminal distance to xr
    sum_i_term: jnp.ndarray
    n_mpc: jnp.ndarray  # controller-usage step counts
    n_failsafe: jnp.ndarray
    n_deadbeat: jnp.ndarray
    sum_iters: jnp.ndarray  # total ADMM iterations


def _final_distance(out: discrete.RolloutOut, xr: jnp.ndarray) -> jnp.ndarray:
    """Distance of the state at i_term-1 from the target — the
    disturbance-rejection metric (`test/disturbRejComp.py:89-94` uses
    ``x_true_pcw[:, i_term-1] - xr`` over all 4 states)."""
    T1, B = out.x_true.shape[0], out.x_true.shape[1]
    idx = jnp.clip(out.i_term - 1, 0, T1 - 1)
    xf = jnp.take_along_axis(
        out.x_true, idx[None, :, None].astype(jnp.int32), axis=0
    )[0]
    return jnp.linalg.norm(xf - xr[None, :], axis=1)


def chunk_stats(engine, noise_seq: jnp.ndarray) -> SweepStats:
    """Rollout one scenario chunk and reduce to scalars (jit-friendly).

    Accepts either a DiscreteEngine (noise_seq: (T, B, 4)) or a
    ContinuousEngine (noise_seq: held draws (n_draws, B, 2))."""
    from mpc_arpo_project_tpu.rollout import continuous as cont

    B = noise_seq.shape[1]
    if isinstance(engine, cont.ContinuousEngine):
        out = cont.rollout(engine, noise_seq)
        xr = engine.base.xr
        x_hist, i_term = out.x_true_ticks, out.i_term_sub // engine.n_sub
        iters = out.iters.sum().astype(jnp.int32)
    else:
        out = discrete.rollout(engine, noise_seq)
        xr = engine.xr
        x_hist, i_term = out.x_true, out.i_term
        iters = out.iters.sum().astype(jnp.int32)
    T1 = x_hist.shape[0]
    idx = jnp.clip(i_term - 1, 0, T1 - 1)
    xf = jnp.take_along_axis(x_hist, idx[None, :, None].astype(jnp.int32), axis=0)[0]
    fd = jnp.linalg.norm(xf - xr[None, :], axis=1)
    codes = out.ctrl_seq  # (T, B)
    return SweepStats(
        n=jnp.asarray(B, dtype=jnp.int32),
        n_success=out.success.sum().astype(jnp.int32),
        sum_final_dist=fd.sum(),
        sum_i_term=i_term.sum().astype(jnp.int32),
        n_mpc=(codes == 1).sum().astype(jnp.int32),
        n_failsafe=(codes == 2).sum().astype(jnp.int32),
        n_deadbeat=(codes == 3).sum().astype(jnp.int32),
        sum_iters=iters,
    )


def sharded_stats_fn(engine: discrete.DiscreteEngine, mesh):
    """Jitted chunk_stats with the batch axis sharded over the mesh.

    The reductions inside ``chunk_stats`` become XLA collectives (psum over
    ICI/DCN); engine arrays are replicated. Returns f(noise_seq) -> SweepStats.
    """
    noise_sh = mesh_lib.batch_sharding(mesh, batch_axis=1)
    repl = mesh_lib.replicated(mesh)
    eng_sh = jax.tree.map(lambda _: repl, engine)
    return jax.jit(
        lambda e, ns: chunk_stats(e, ns),
        in_shardings=(eng_sh, noise_sh),
        out_shardings=repl,
    )


class SweepState(NamedTuple):
    """Host-side accumulated sweep state (checkpointable)."""

    done_scenarios: int
    acc: dict  # accumulated python floats/ints


def _acc_update(acc: Optional[dict], st: SweepStats) -> dict:
    vals = {k: float(np.asarray(v)) for k, v in st._asdict().items()}
    if acc is None:
        return vals
    return {k: acc[k] + vals[k] for k in vals}


def run_sweep(
    engine: discrete.DiscreteEngine,
    total: int,
    chunk: int,
    key: jax.Array,
    mesh=None,
    checkpoint_path: Optional[str] = None,
) -> dict:
    """Run ``total`` scenarios in chunks of ``chunk``, resumable.

    Checkpointing (SURVEY §5.4): after every chunk the accumulated stats and
    progress index are written to ``checkpoint_path`` (JSON); an interrupted
    sweep restarted with the same arguments resumes from the last chunk. The
    PRNG key for chunk i is ``fold_in(key, i)``, so resume is deterministic.
    """
    if mesh is None:
        mesh = mesh_lib.make_mesh()

    from mpc_arpo_project_tpu.rollout import continuous as cont

    is_cont = isinstance(engine, cont.ContinuousEngine)
    multiproc = jax.process_count() > 1
    repl = mesh_lib.replicated(mesh)
    if multiproc:
        # Multi-controller mode: locally-committed arrays cannot cross into a
        # global sharding, so (a) the engine — identical on every process — is
        # re-placed as globally-replicated jax.Arrays, and (b) the noise is
        # generated INSIDE jit with a sharded out_sharding, so each process
        # materializes only its own shard (threefry is counter-based, so the
        # global array is identical to the single-process one).
        engine = jax.device_put(jax.tree.map(np.asarray, engine), repl)
    f = sharded_stats_fn(engine, mesh)
    noise_sh = mesh_lib.batch_sharding(mesh, batch_axis=1)
    eng_sh = jax.tree.map(lambda _: repl, engine)
    gen_fn = cont.make_noise_draws if is_cont else discrete.make_noise_sequence
    gen = jax.jit(
        lambda e, kd: gen_fn(e, jax.random.wrap_key_data(kd), chunk),
        in_shardings=(eng_sh, repl),
        out_shardings=noise_sh,
    )

    start = 0
    acc = None
    if checkpoint_path and os.path.exists(checkpoint_path):
        with open(checkpoint_path) as fh:
            ck = json.load(fh)
        if ck.get("total") == total and ck.get("chunk") == chunk:
            start = ck["next_chunk"]
            acc = ck["acc"]

    n_chunks = (total + chunk - 1) // chunk
    for ci in range(start, n_chunks):
        # chunks always run full width for shape stability; a ragged final
        # chunk just contributes extra valid MC scenarios (all counts use the
        # actually-executed n)
        ck_key = jax.random.fold_in(key, ci)
        if multiproc:
            noise_seq = gen(engine, np.asarray(jax.random.key_data(ck_key)))
        elif is_cont:
            noise_seq = cont.make_noise_draws(engine, ck_key, chunk)
        else:
            noise_seq = discrete.make_noise_sequence(engine, ck_key, chunk)
        st = f(engine, noise_seq)
        acc = _acc_update(acc, st)
        if checkpoint_path and jax.process_index() == 0:
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {"total": total, "chunk": chunk, "next_chunk": ci + 1, "acc": acc},
                    fh,
                )
            os.replace(tmp, checkpoint_path)

    n = acc["n"]
    return {
        "n": int(n),
        "success_rate": acc["n_success"] / n,
        "mean_final_dist": acc["sum_final_dist"] / n,
        "mean_i_term": acc["sum_i_term"] / n,
        "ctrl_usage": {
            "mpc": acc["n_mpc"],
            "failsafe": acc["n_failsafe"],
            "deadbeat": acc["n_deadbeat"],
        },
        "total_admm_iters": acc["sum_iters"],
    }


def success_rate_study(
    sim, mpc, fail, debris, n_runs: int, chunk: int, key, mesh=None, **engine_kw
) -> dict:
    """The success-rate MC (`test/saved_runs/success_rates_test.py:64-75`),
    batched: N offset-free noisy runs, count successes."""
    engine = discrete.build_engine(sim, mpc, fail, debris, **engine_kw)
    return run_sweep(engine, n_runs, chunk, key, mesh=mesh)


def disturbance_rejection_study_fused(
    sim,
    mpc,
    fail,
    debris,
    noise_lengths,
    runs_per_setting: int,
    key,
    mesh=None,
    **engine_kw,
):
    """The disturbance-rejection study (`test/disturbRejComp.py:74-108`) as
    ONE batched program: noise hold-length becomes per-scenario noise *data*
    (``make_noise_sequence_multi``) and the offset-free switch a per-scenario
    ``is_reject`` array, so the full (lengths x runs x 2 arms) grid runs under
    a single engine build and a single compile — vs. 2 x len(noise_lengths)
    engine builds (~20 s each) for the per-setting path. Common random
    numbers across arms as in :func:`disturbance_rejection_study`.

    Returns (noise_lengths, dist_ratios).
    """
    import dataclasses

    L = len(noise_lengths)
    R = runs_per_setting
    sim_rej = dataclasses.replace(sim, isReject=True)
    engine = discrete.build_engine(sim_rej, mpc, fail, debris, **engine_kw)
    hold = np.repeat(np.asarray(noise_lengths, dtype=np.int64), R)  # (L*R,)
    noise_half = discrete.make_noise_sequence_multi(engine, key, hold)
    noise_seq = jnp.concatenate([noise_half, noise_half], axis=1)  # (T, 2LR, 4)
    dt = engine.sig_diag.dtype
    is_rej = jnp.concatenate(
        [jnp.ones(L * R, dtype=dt), jnp.zeros(L * R, dtype=dt)]
    )

    if mesh is None:
        mesh = mesh_lib.make_mesh()
    noise_sh = mesh_lib.batch_sharding(mesh, batch_axis=1)
    arg_sh = mesh_lib.batch_sharding(mesh, batch_axis=0)
    repl = mesh_lib.replicated(mesh)
    eng_sh = jax.tree.map(lambda _: repl, engine)

    @functools.partial(
        jax.jit,
        in_shardings=(eng_sh, noise_sh, arg_sh),
        out_shardings=repl,
    )
    def run(e, ns, rej):
        out = discrete.rollout(e, ns, is_reject_b=rej)
        fd = _final_distance(out, e.xr)  # (2LR,)
        return fd.reshape(2, L, R).sum(axis=-1)  # (2, L) sums over runs

    sums = np.asarray(run(engine, noise_seq, is_rej))
    ratios = sums[0] / np.maximum(sums[1], 1e-12)
    return np.asarray(noise_lengths), ratios


def disturbance_rejection_study(
    sim_norej,
    sim_rej,
    mpc,
    fail,
    debris,
    noise_lengths,
    runs_per_setting: int,
    key,
    mesh=None,
    **engine_kw,
):
    """The offset-free vs plain-MPC comparison (`test/disturbRejComp.py:74-108`):
    for each noise hold-length, the ratio of mean final distances
    (reject / no-reject), with common random numbers across the two arms.

    Returns (noise_lengths, dist_ratios) ready for the reference's plot.
    """
    import dataclasses

    ratios = []
    for i, nl in enumerate(noise_lengths):
        noise = dataclasses.replace(sim_rej.noise, noise_length=int(nl))
        s_rej = dataclasses.replace(sim_rej, noise=noise)
        s_norej = dataclasses.replace(sim_norej, noise=noise)
        k = jax.random.fold_in(key, i)
        e_rej = discrete.build_engine(s_rej, mpc, fail, debris, **engine_kw)
        e_norej = discrete.build_engine(s_norej, mpc, fail, debris, **engine_kw)
        # common random numbers: same noise for both arms
        noise_seq = discrete.make_noise_sequence(e_rej, k, runs_per_setting)
        if mesh is None:
            m = mesh_lib.make_mesh()
        else:
            m = mesh
        f_rej = sharded_stats_fn(e_rej, m)
        f_norej = sharded_stats_fn(e_norej, m)
        st_rej = f_rej(e_rej, noise_seq)
        st_norej = f_norej(e_norej, noise_seq)
        ratios.append(
            float(np.asarray(st_rej.sum_final_dist))
            / max(float(np.asarray(st_norej.sum_final_dist)), 1e-12)
        )
    return np.asarray(noise_lengths), np.asarray(ratios)
