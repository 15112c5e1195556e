"""RAFT-OU flow configuration with the committed trained-like weights.

Same architecture/protocol as raftou_default.py (mirrors reference
configs/flow/RAFTou_kubric_huber_split_nonoccl.py), but ``model`` points at
the in-repo msgpack trained on self-generated synthetic scenes
(tools/gen_synth_data.py + tools/train_synth.py — the reference's training
recipe, train_params.txt:2-15, collapsed to one joint stage because neither
the reference checkpoint nor its datasets are distributed). These weights
are NOT the reference operating point; they exist so every accuracy
artifact (drift bound, TAP-Vid parity, mode cost) runs on a model whose
sigma/occlusion fields have converged structure instead of random init.
Provenance + validation margin: docs/TRAINING.md.
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
        "compute_dtype": "bfloat16",  # see raftou_default.py
    }
    conf.model = str(Path(__file__).resolve().parents[2]
                     / "weights" / "raftou_synth.msgpack")
    conf.flow_iters = 12
    conf.flow_cache_dir = Path("flow_cache/raftou_synth/")
    conf.flow_cache_ext = ".flowouX16.pkl"
    conf.name = Path(__file__).stem
    return conf
