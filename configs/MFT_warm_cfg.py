"""FAST+WARM MFT tracker configuration (documented non-default speed mode).

Everything from configs/MFT_fast_cfg.py (per-delta GRU iteration schedule),
plus template-pair warm starting: the delta=inf pair's RAFT iterations are
initialized from the previous frame's selected flow instead of zero — the
reference's own video warm-start mechanism (MFT/RAFT/core/raft.py flow_init,
downsampled as MFT/raft.py:98-101) applied to the one MFT pair whose left
frame never changes. flow(template->t-1) is within one frame of motion of
flow(template->t), so the warm-started pair converges in far fewer GRU
iterations (5 here vs the reference's 12); on long sequences a
large-displacement template pair also gets an init that 12 zero-start
iterations may never reach.

Pair-iteration budget: 5+12+10+8+6+5+4 = 50 vs fast's 57 vs uniform 84.

The default config (MFT_cfg.py) remains the reference-parity mode: zero
init, uniform 12 iterations.
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
    conf.flow_iters_schedule = {np.inf: 5, 1: 4, 2: 5, 4: 6, 8: 8,
                                16: 10, 32: 12}
    conf.warm_start_inf = True
    conf.name = Path(__file__).stem
    return conf
