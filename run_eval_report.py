#!/usr/bin/env python
"""Run tracker -> evaluate -> report on TAP-Vid in one command.

Role parity with reference run_eval_report.py:107-113.
"""

import argparse
import logging

from mft_tpu.config import load_config
from mft_tpu.eval import runner, evaluate, report


def main():
    parser = argparse.ArgumentParser(description="TAP-Vid run + eval + report")
    parser.add_argument("--trackers", nargs="+", default=["configs/MFT_cfg.py"])
    parser.add_argument("--dataset",
                        default="dataset_configs/tapvid_davis_256x256_512x512.py")
    parser.add_argument("--export", default="export")
    parser.add_argument("--cache", default="flow_cache")
    parser.add_argument("--mode", choices=["first", "strided", "both"],
                        default="both")
    parser.add_argument("--cont", action="store_true")
    parser.add_argument("--skip_run", action="store_true",
                        help="only evaluate + report existing predictions")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    if not args.skip_run:
        run_args = runner.get_parser().parse_args(
            ["--trackers", *args.trackers, "--dataset", args.dataset,
             "--export", args.export, "--cache", args.cache,
             "--mode", args.mode] + (["--cont"] if args.cont else []))
        runner.run(run_args)

    eval_args = evaluate.get_parser().parse_args(
        ["--trackers", *args.trackers, "--dataset", args.dataset,
         "--export", args.export, "--mode", args.mode])
    evaluate.run(eval_args)

    names = [load_config(p).name for p in args.trackers]
    modes = ["first", "strided"] if args.mode == "both" else [args.mode]
    report.report(names, args.export, modes)


if __name__ == "__main__":
    main()
