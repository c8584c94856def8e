"""Merge sharded status_mix outputs into one summary per arm.

    python tools/merge_shards.py /tmp/oracle_s*.json

Shards are bit-identical column slices of the unsharded draw matrix
(status_mix.py --shard i/N), so counts, successes, and alive steps sum
exactly; mixes and rates are recomputed from the summed counts.
"""

import json
import sys

import numpy as np


def main(paths):
    merged = {}
    meta = None
    for p in paths:
        with open(p) as fh:
            s = json.load(fh)
        if meta is None:
            meta = {k: s[k] for k in ("config", "sigma", "max_iter", "seed")}
        for name, arm in s["arms"].items():
            m = merged.setdefault(name, {
                "arm": name, "solve_mode": arm["solve_mode"],
                "dtype": arm["dtype"], "stall": arm["stall"],
                "wall_s": 0.0, "alive_steps": 0, "counts": {},
                "n_success": 0, "runs": 0, "i_term_sum": 0.0,
                "ctrl_usage": {"mpc": 0, "failsafe": 0, "deadbeat": 0},
                "shards": 0,
            })
            n_runs = (s["shard"]["hi"] - s["shard"]["lo"]) if s.get("shard") \
                else s["runs"]
            m["wall_s"] += arm["wall_s"]
            m["alive_steps"] += arm["alive_steps"]
            m["n_success"] += arm["n_success"]
            m["runs"] += n_runs
            m["i_term_sum"] += arm["mean_i_term"] * n_runs
            m["shards"] += 1
            for k, v in arm["counts"].items():
                m["counts"][k] = m["counts"].get(k, 0) + v
            for k, v in arm["ctrl_usage"].items():
                m["ctrl_usage"][k] += v
    for m in merged.values():
        alive = max(m["alive_steps"], 1)
        m["mix"] = {k: round(v / alive, 4) for k, v in m["counts"].items()}
        m["success_rate"] = m["n_success"] / max(m["runs"], 1)
        m["mean_i_term"] = m.pop("i_term_sum") / max(m["runs"], 1)
    out = {**meta, "merged_from": len(paths), "arms": merged}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:])
