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
        # Production numerics made EXPLICIT (not inherited from the 'auto'
        # default): bf16 on the MXU, covered by the measured drift bound
        # (docs/PERFORMANCE.md, tools/tpu_drift.py — single-step EPE mean
        # < 0.25 px, eval-occlusion flips < 2 % at any chain length, gated
        # by tests/test_tpu_drift.py on TPU). Set "float32" for the exact
        # reference-parity path at ~2x the conv cost.
        "compute_dtype": "bfloat16",
    }
    conf.model = "checkpoints/raftou_kubric.msgpack"
    conf.flow_iters = 12
    conf.flow_cache_dir = Path("flow_cache/raftou_default/")
    conf.flow_cache_ext = ".flowouX16.pkl"
    conf.name = Path(__file__).stem
    return conf
