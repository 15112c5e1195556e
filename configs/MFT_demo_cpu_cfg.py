"""CPU-runnable demo tracker configuration (BASELINE.json configs[0]).

A reduced-delta, reduced-iteration variant of MFT_cfg so the bundled demo
runs end to end without TPU hardware in reasonable time: deltas {inf,1,2,4}
and 4 GRU iterations. Selection/chaining semantics are identical to the
default config — only the cost/quality knobs differ (SURVEY.md §5:
the delta set is the documented cost/quality knob, reference
configs/MFT_cfg.py:15).
"""

from pathlib import Path

import numpy as np

from mft_tpu.config import Config
from mft_tpu.models.raft import RAFTFlow
from mft_tpu.tracker import MFT


def get_config():
    flow = Config()
    flow.of_class = RAFTFlow
    flow.raft_params = {"occlusion_module": "separate_with_uncertainty",
                        "small": False,
                        # explicit: CPU demo stays on the f32 exact path
                        "compute_dtype": "float32"}
    flow.model = None  # random init unless a checkpoint is supplied
    flow.flow_iters = 4
    flow.name = "raftou_demo_cpu"

    conf = Config()
    conf.tracker_class = MFT
    conf.flow_config = flow
    conf.deltas = [np.inf, 1, 2, 4]
    conf.occlusion_threshold = 0.02
    conf.name = Path(__file__).stem
    return conf
