"""Benchmark report: tabulate our TAP-Vid results against published baselines.

Role parity with reference run_eval_report.py:35-113: reads the evaluator's
pandas pickles, renames columns, appends the published competitor numbers
(hardcoded exactly as in run_eval_report.py:72-88) and prints org-mode tables.
"""

import argparse
import logging
from pathlib import Path

import numpy as np
import pandas as pd

from mft_tpu.config import load_config

logger = logging.getLogger(__name__)

COLUMNS = {
    "average_jaccard": "AJ",
    "average_pts_within_thresh": "<D_avg",
    "occlusion_accuracy": "OA",
    "average_prec": "prec_avg",
}

# published numbers (x100) from the reference report generator
BASELINES_STRIDED = {
    "TAP-Net": {"AJ": 38.4, "<D_avg": 53.1, "OA": 82.3},
    "PIPs": {"AJ": 42.0, "<D_avg": 59.4, "OA": 82.1},
    "OmniMotion": {"AJ": 51.7, "<D_avg": 67.5, "OA": 85.3},
    "TAPIR": {"AJ": 61.3, "<D_avg": 72.3, "OA": 87.6},
    "CoTracker": {"AJ": 64.8, "<D_avg": 79.1, "OA": 88.7},
}
BASELINES_FIRST = {
    "TAP-Net": {"AJ": 33.0, "<D_avg": 48.6, "OA": 78.8},
    "TAPIR": {"AJ": 56.2, "<D_avg": 70.0, "OA": 86.5},
    "CoTracker": {"AJ": 60.6, "<D_avg": 75.4, "OA": 89.3},
}


def tracker_row(export_dir, name, query_mode):
    suffix = "-strided" if query_mode == "strided" else ""
    path = Path(export_dir) / name / "eval" / f"tapvid-eval{suffix}.pklz"
    if not path.exists():
        return None
    df = pd.read_pickle(path)
    means = df.drop(columns=["seq"], errors="ignore").mean()
    return {short: round(float(means[long]) * 100, 1)
            for long, short in COLUMNS.items() if long in means}


def report(tracker_names, export_dir, query_modes=("first", "strided"),
           latex=False):
    from tabulate import tabulate

    out = []
    for query_mode in query_modes:
        rows = dict(BASELINES_STRIDED if query_mode == "strided"
                    else BASELINES_FIRST)
        for name in tracker_names:
            row = tracker_row(export_dir, name, query_mode)
            if row is not None:
                rows[f"{name} (ours)"] = row
        df = pd.DataFrame.from_dict(rows, orient="index")
        table = tabulate(df, headers="keys", tablefmt="orgtbl",
                         floatfmt=".1f")
        out.append(f"* TAP-Vid-DAVIS {query_mode} (x100, 256x256 protocol)\n{table}")
        if latex:
            # LaTeX rows for our trackers (reference tapvid_eval_stuff.py:240)
            from mft_tpu.eval.metrics import latex_table
            suffix = "-strided" if query_mode == "strided" else ""
            for name in tracker_names:
                path = Path(export_dir) / name / "eval" / f"tapvid-eval{suffix}.pklz"
                if path.exists():
                    means = pd.read_pickle(path).drop(
                        columns=["seq"], errors="ignore").mean()
                    out.append(f"* LaTeX {name} {query_mode}\n"
                               + latex_table(means.to_dict()))
    text = "\n\n".join(out)
    print(text)
    return text


def main():
    parser = argparse.ArgumentParser(description="TAP-Vid report")
    parser.add_argument("--trackers", nargs="+", default=["configs/MFT_cfg.py"])
    parser.add_argument("--export", default="export")
    parser.add_argument("--mode", choices=["first", "strided", "both"],
                        default="both")
    parser.add_argument("--latex", action="store_true",
                        help="also emit LaTeX table rows")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    names = [load_config(p).name for p in args.trackers]
    modes = ["first", "strided"] if args.mode == "both" else [args.mode]
    report(names, args.export, modes, latex=args.latex)


if __name__ == "__main__":
    main()
