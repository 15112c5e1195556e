"""Default RAFT-OU flow configuration.

Mirrors reference configs/flow/RAFTou_kubric_huber_split_nonoccl.py: big RAFT
with separate occlusion+uncertainty heads, 12 iterations, flowouX16 cache.
The trained checkpoint is not distributed (same as the reference); point
``conf.model`` at a reference .pth (auto-converted) or a flax .msgpack.
"""

from pathlib import Path

from mft_tpu.config import Config
from mft_tpu.models.raft import RAFTFlow


def get_config():
    conf = Config()
    conf.of_class = RAFTFlow
    conf.raft_params = {
        "occlusion_module": "separate_with_uncertainty",
        "small": False,
    }
    conf.model = "checkpoints/raftou_kubric.msgpack"
    conf.flow_iters = 12
    conf.flow_cache_dir = Path("flow_cache/raftou_default/")
    conf.flow_cache_ext = ".flowouX16.pkl"
    conf.name = Path(__file__).stem
    return conf
