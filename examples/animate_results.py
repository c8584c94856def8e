"""Re-animate archived runs (reference `test/animations_results.py`):
loads ``RunObjs/Run*.pkl`` archives and exports animations — GIF by default,
or the interactive HTML scene (camera follow/rotate/zoom + live strip
charts, the VPython-parity renderer) with --html.

    python examples/animate_results.py [--glob 'RunObjs/Run*.pkl'] [--html]
"""

import argparse
import glob as globmod
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--glob", default="RunObjs/Run*.pkl")
    ap.add_argument("--out-dir", default="RunFigs")
    ap.add_argument("--html", action="store_true",
                    help="export the interactive HTML scene instead of a GIF")
    args = ap.parse_args()

    from mpc_arpo_project_tpu.utils.archive import load_run
    from mpc_arpo_project_tpu.viz import animate_trajectory, export_html

    paths = sorted(globmod.glob(args.glob))
    if not paths:
        print(f"no archives match {args.glob}")
        return
    for p in paths:
        sim, run, debris = load_run(p)
        stem = os.path.splitext(os.path.basename(p))[0]
        if args.html:
            out = export_html(sim, run, debris,
                              out_path=os.path.join(args.out_dir, f"{stem}.html"))
        else:
            out = os.path.join(args.out_dir, f"{stem}.gif")
            animate_trajectory(sim, run, debris, out_path=out)
        print(f"{p} -> {out}")


if __name__ == "__main__":
    main()
