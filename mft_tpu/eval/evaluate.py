"""TAP-Vid evaluator: score prediction pickles against ground truth.

Role parity with reference MFT/runners/eval_MFT_tapvid.py:69-161: re-reads
the runner's {seq}-{mode}.pklz predictions, binarizes occlusion at 0.5,
computes the TAP-Vid metrics with fake (pixel-free) video decoding, and
stores per-sequence pandas pickles ``tapvid-eval[-strided].pklz``.
"""

import argparse
import logging
import pickle
from pathlib import Path

import numpy as np
import pandas as pd

from mft_tpu.config import load_config
from mft_tpu.eval.metrics import compute_tapvid_metrics
from mft_tpu.eval.tapvid import create_tapvid_dataset

logger = logging.getLogger(__name__)

OCCLUSION_THRESHOLD = 0.5  # eval-time binarization (eval_MFT_tapvid.py:107)


def evaluate_tracker(result_dir, dataset_conf, query_mode):
    """-> pandas DataFrame of per-sequence metrics for one query mode."""
    rows = {}
    for pickle_path in dataset_conf.pickles:
        dataset = create_tapvid_dataset(pickle_path, [query_mode],
                                        dataset_conf.scaling, fake_video=True)
        for seq in dataset:
            name = seq["video_name"]
            pred_path = Path(result_dir) / f"{name}-{query_mode}.pklz"
            if not pred_path.exists():
                logger.warning("missing predictions for %s", pred_path.name)
                continue
            with open(pred_path, "rb") as f:
                pred = pickle.load(f)

            gt = seq["data"][query_mode]
            H = gt["video"].shape[2]
            W = gt["video"].shape[3]
            scale = np.array([256.0 / W, 256.0 / H]).reshape(1, 1, 1, 2)
            gt_tracks = gt["target_points"] * scale
            # query points stay in final-resolution coords: only the t
            # component is consumed by the metrics (eval_MFT_tapvid.py:91-92)
            query_points = gt["query_points"][0].astype(np.int64)

            metrics = compute_tapvid_metrics(
                query_points[None],
                gt["occluded"],
                gt_tracks,
                pred["occluded"] > OCCLUSION_THRESHOLD,
                pred["tracks"],
                query_mode,
            )
            row = {k: float(np.mean(v)) for k, v in metrics.items()}
            row["seq"] = name
            rows[len(rows)] = row
    df = pd.DataFrame.from_dict(rows, orient="index")
    return df


def run(args):
    dataset_conf = load_config(args.dataset)
    for tracker_cfg_path in args.trackers:
        cfg = load_config(tracker_cfg_path)
        result_dir = Path(args.export) / cfg.name / "results"
        for query_mode in (["first", "strided"] if args.mode == "both"
                           else [args.mode]):
            df = evaluate_tracker(result_dir, dataset_conf, query_mode)
            suffix = "-strided" if query_mode == "strided" else ""
            eval_dir = Path(args.export) / cfg.name / "eval"
            eval_dir.mkdir(parents=True, exist_ok=True)
            out_path = eval_dir / f"tapvid-eval{suffix}.pklz"
            df.to_pickle(out_path)
            means = df.drop(columns=["seq"], errors="ignore").mean()
            logger.info("%s %s:\n%s", cfg.name, query_mode, means.to_string())
    return 0


def get_parser():
    parser = argparse.ArgumentParser(description="evaluate TAP-Vid predictions")
    parser.add_argument("--trackers", nargs="+", default=["configs/MFT_cfg.py"])
    parser.add_argument("--dataset",
                        default="dataset_configs/tapvid_davis_256x256_512x512.py")
    parser.add_argument("--export", default="export")
    parser.add_argument("--mode", choices=["first", "strided", "both"],
                        default="both")
    return parser


def _main():
    logging.basicConfig(level=logging.INFO)
    run(get_parser().parse_args())



def main():
    import os
    from mft_tpu.utils.various import with_debugger
    entry = _main if not os.environ.get("MFT_TPU_DEBUG") else with_debugger(_main)
    entry()


if __name__ == "__main__":
    main()
