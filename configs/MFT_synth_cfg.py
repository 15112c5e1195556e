"""MFT tracker configuration backed by the committed trained-like weights.

Reference protocol (configs/MFT_cfg.py in serycjon/MFT): log-spaced deltas
{inf,1,2,4,8,16,32}, occlusion threshold 0.02 — but the flow backend loads
weights/raftou_synth.msgpack (see configs/flow/raftou_synth.py) instead of
falling back to random init.
"""

from pathlib import Path

import numpy as np

from mft_tpu.config import Config, load_config
from mft_tpu.tracker import MFT

_HERE = Path(__file__).parent


def get_config():
    conf = Config()
    conf.tracker_class = MFT
    conf.flow_config = load_config(_HERE / "flow" / "raftou_synth.py")
    conf.deltas = [np.inf, 1, 2, 4, 8, 16, 32]
    conf.occlusion_threshold = 0.02
    conf.name = Path(__file__).stem
    return conf
