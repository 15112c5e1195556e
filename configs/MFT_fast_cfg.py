"""FAST MFT tracker configuration (documented non-default speed mode).

Same tracker as configs/MFT_cfg.py, plus a per-delta GRU iteration schedule:
small-delta pairs carry tiny frame-to-frame flows that converge far below
the reference's uniform 12 refinement iterations
(reference configs/flow/RAFTou_kubric_huber_split_nonoccl.py:27), so they
run fewer. The template (delta=inf) and the largest finite deltas keep the
full 12 — those are the pairs with large displacements where extra
iterations matter.

Per-pair math is EXACTLY the uniform run at that pair's count
(tests/test_iter_schedule.py); what changes vs the reference protocol is
only how many refinement steps the small-delta pairs get. The default
config (MFT_cfg.py) remains the reference-parity mode; use this one when
throughput matters more than the last fraction of accuracy.

Pair-iteration budget: 12+12+10+8+6+5+4 = 57 vs the uniform 7x12 = 84
(~32% less GRU recurrence per frame).
"""

from pathlib import Path

import numpy as np

from mft_tpu.config import Config, load_config
from mft_tpu.tracker import MFT

_HERE = Path(__file__).parent


def get_config():
    conf = Config()
    conf.tracker_class = MFT
    conf.flow_config = load_config(_HERE / "flow" / "raftou_default.py")
    conf.deltas = [np.inf, 1, 2, 4, 8, 16, 32]
    conf.occlusion_threshold = 0.02
    conf.flow_iters_schedule = {np.inf: 12, 1: 4, 2: 5, 4: 6, 8: 8,
                                16: 10, 32: 12}
    conf.name = Path(__file__).stem
    return conf
