"""TAP-Vid-DAVIS dataset config: the reference's headline protocol
(resize to 256x256, then run the tracker at 512x512).

Mirrors dataset_configs/pkl-tapvid-davis-256x256_512x512.py. The dataset
pickle location comes from the local environment settings.
"""

from pathlib import Path

from mft_tpu.config import Config
from mft_tpu.environment import env_settings


def get_config():
    conf = Config()
    conf.pickles = [env_settings().tapvid_davis_dir]
    conf.scaling = "256x256_512x512"
    conf.name = Path(__file__).stem
    return conf
