"""Re-animate archived runs (reference `test/animations_results.py`):
loads ``RunObjs/Run*.pkl`` archives and exports animations.

    python examples/animate_results.py [--glob 'RunObjs/Run*.pkl']
"""

import argparse
import glob as globmod
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--glob", default="RunObjs/Run*.pkl")
    ap.add_argument("--out-dir", default="RunFigs")
    args = ap.parse_args()

    from mpc_arpo_project_tpu.utils.archive import load_run
    from mpc_arpo_project_tpu.viz import animate_trajectory

    paths = sorted(globmod.glob(args.glob))
    if not paths:
        print(f"no archives match {args.glob}")
        return
    for p in paths:
        sim, run, debris = load_run(p)
        stem = os.path.splitext(os.path.basename(p))[0]
        out = os.path.join(args.out_dir, f"{stem}.gif")
        animate_trajectory(sim, run, debris, out_path=out)
        print(f"{p} -> {out}")


if __name__ == "__main__":
    main()
