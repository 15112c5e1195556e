"""TAP-Vid evaluation stack: datasets, metrics, benchmark runner, report.

Role parity with reference MFT/evaluation/ + MFT/runners/ + run_eval_report.py.
"""

from mft_tpu.eval.metrics import compute_tapvid_metrics
from mft_tpu.eval.tapvid import (
    sample_queries_first,
    sample_queries_strided,
    resize_video,
    create_tapvid_dataset,
)

__all__ = [
    "compute_tapvid_metrics",
    "sample_queries_first",
    "sample_queries_strided",
    "resize_video",
    "create_tapvid_dataset",
]
