"""TAP-Vid METRIC-level parity: full reference pipeline vs full mft-tpu
pipeline (runner -> evaluator -> AJ/<delta_avg/OA) on a synthetic pickle with
shared converted weights. See tools/tapvid_parity.py and docs/TAPVID_PARITY.md.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

try:
    sys.path.insert(0, "/root/reference")
    from MFT.MFT import MFT as _RefMFT  # noqa: F401
    HAVE_REF = True
except Exception:
    HAVE_REF = False

pytestmark = [
    pytest.mark.skipif(not HAVE_REF, reason="reference repo not importable"),
    pytest.mark.slow,  # two full pipelines with real RAFT (~3-6 min)
]


@pytest.mark.parametrize("weights", ["random", "trained-like"])
def test_tapvid_metrics_match_reference(tmp_path, weights):
    from tools.tapvid_parity import run_parity, KEY_METRICS

    # occl_gain + occluded_gt keep predicted AND GT visibility varied, so
    # AJ / OA / jaccard TP-FP-FN and the 0.5 binarization are compared at
    # non-degenerate values (not pinned at 0.00 like plain random init);
    # trained-like exercises the converter under non-trivial norm affine
    # params + running stats end-to-end (VERDICT r2 item 7)
    report, worst, ref, _ = run_parity(tmp_path, T=5, H=128, W=128,
                                       n_tracks=6, finite_deltas=(1, 2),
                                       iters=3, occl_gain=8.0,
                                       occluded_gt=True,
                                       trained_like=weights == "trained-like")
    # identical predictions through identical protocol code paths: the
    # headline metrics must agree to well under one point (x100 scale)
    assert worst < 0.5, f"metric divergence {worst:.3f}\n{report}"
    for qm, df in ref.items():
        vals = df.drop(columns=["seq"], errors="ignore").mean()
        for metric in KEY_METRICS:
            v = float(vals[metric])
            assert 0.0 < v, f"{qm}/{metric} degenerate at {v}\n{report}"
        assert float(vals["occlusion_accuracy"]) < 1.0, (
            f"{qm} occlusion accuracy saturated\n{report}")
