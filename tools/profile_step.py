"""Per-op attribution of the closed-loop step cost on the live TPU.

Round-3 follow-up to the BENCH_MAX_ITER cap decomposition in BASELINE.md:
that measurement showed ~67-70 ms/step of chunk-count-independent cost at
B=1024 but could not say how it splits between the eig-solve prologue
(slot sort + (B,K,K) tinv gathers), the every-step Woodbury refresh, the
scan-carry blends, and the non-solver step work (UKF/constraints/plant).
This tool answers that with a device trace: run the flagship bench rollout,
capture a jax.profiler perfetto trace over a few MID-trajectory segments
(where debris activity and the dead/alive mix are representative), and
aggregate device-track op durations by name prefix.

Usage: python tools/profile_step.py [--batch 1024] [--segs 2] [--start-seg 6]
Writes the raw trace under /tmp/jxprof and prints an aggregated table.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--segs", type=int, default=2, help="segments to trace")
    ap.add_argument("--start-seg", type=int, default=6,
                    help="first traced segment (10 steps each)")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from mpc_arpo_project_tpu.ops import admm
    from mpc_arpo_project_tpu.rollout import discrete
    import importlib
    bench = importlib.import_module("bench")

    os.environ.setdefault("BENCH_BATCH", str(args.batch))
    # reuse bench.py's flagship config construction by copying its body is
    # overkill; build the same objects directly
    from mpc_arpo_project_tpu.config import (
        SimConditions, MPCParams, FailsafeParams, Noise, Debris,
    )
    v_ecr = 50000.0 * np.ones(5)
    v_ecr[-2] *= -1
    v_ecr[-1] = 0.0
    mpc = MPCParams(
        8e2 * np.diag([0.2**2, 10**2, 3.8**2, 900.0]),
        1000**2 * np.eye(2),
        5**2 * np.eye(5),
        v_ecr,
        {"Nx": 50, "Nc": 5, "Nb": 5},
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
        2.5, 10 * np.pi / 180, 1.5, 1.107e-3, 0.5, True,
        (0.2, 45.0), Noise((0.75, 0.75), 50), False, T_final=150.0,
    )
    settings = admm.ADMMSettings(
        max_iter=4000, solve_mode="eig", check_every=25,
        stall_exit_chunks=12, stall_tighten_chunks=24,
    )
    engine = discrete.build_engine(sim, mpc, fail, debris, settings=settings,
                                   dtype=jnp.float32)
    B = args.batch
    key = jax.random.key(0)
    noise_seq = discrete.make_noise_sequence(engine, key, B)

    seg = 10
    tracing = {"on": False}
    logdir = "/tmp/jxprof"
    os.system(f"rm -rf {logdir}")

    lo = args.start_seg * seg
    hi = lo + args.segs * seg

    def progress(done, total, carry):
        np.asarray(carry.i_term[0])  # sync
        if done == lo and not tracing["on"]:
            jax.profiler.start_trace(logdir, create_perfetto_trace=True)
            tracing["on"] = True
        elif done == hi and tracing["on"]:
            jax.profiler.stop_trace()
            tracing["on"] = False
            print(f"traced segments [{lo},{hi}) steps", file=sys.stderr)

    # first full run compiles; the traced window rides the second run
    out = discrete.rollout_chunked(engine, noise_seq, seg=seg)
    out.i_term.block_until_ready()
    print("warmup done", file=sys.stderr)
    ns2 = discrete.make_noise_sequence(engine, jax.random.fold_in(key, 1), B)
    jax.block_until_ready(ns2)
    discrete.rollout_chunked(engine, ns2, seg=seg, progress=progress)
    if tracing["on"]:
        jax.profiler.stop_trace()

    traces = glob.glob(f"{logdir}/**/*.json.gz", recursive=True) + glob.glob(
        f"{logdir}/**/*perfetto*", recursive=True)
    print("trace files:", traces, file=sys.stderr)
    if not traces:
        print("NO TRACE PRODUCED — profiler unsupported on this backend?")
        return
    path = sorted(traces, key=os.path.getsize)[-1]
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    # keep device-track complete events; host tracks are named with 'python'
    # or thread metadata. Heuristic: aggregate ALL X events by pid name.
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    per_track = collections.defaultdict(float)
    per_op = collections.defaultdict(float)
    per_op_n = collections.defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e.get("pid"), "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        per_track[pname] += dur
        if "TPU" in pname or "tpu" in pname or "device" in pname.lower():
            name = e.get("name", "?")
            per_op[name] += dur
            per_op_n[name] += 1
    n_steps = args.segs * seg
    print("\n== total X-event ms by process track ==")
    for k, v in sorted(per_track.items(), key=lambda kv: -kv[1]):
        print(f"  {v:10.1f} ms  {k}")
    print(f"\n== device ops over {n_steps} steps (ms total / ms per step) ==")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]
    for name, v in rows:
        print(f"  {v:9.1f} ms  {v / n_steps:7.2f} ms/step  x{per_op_n[name]:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
