"""Default MFT tracker configuration.

Mirrors reference configs/MFT_cfg.py: log-spaced deltas {inf,1,2,4,8,16,32},
occlusion threshold 0.02, RAFT-OU flow backend.
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
    conf.name = Path(__file__).stem
    return conf
