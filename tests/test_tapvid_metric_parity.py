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


def test_tapvid_metrics_match_reference(tmp_path):
    from tools.tapvid_parity import run_parity

    report, worst = run_parity(tmp_path, T=5, H=128, W=128, n_tracks=6,
                               finite_deltas=(1, 2), iters=3)
    # identical predictions through identical protocol code paths: the
    # headline metrics must agree to well under one point (x100 scale)
    assert worst < 0.5, f"metric divergence {worst:.3f}\n{report}"
