"""Host-side IO: flowou codecs, video capture, tiered flow cache.

Role parity with reference MFT/utils/io.py. The codec FILE FORMATS are
byte-compatible with the reference (.flowou.png / .flowou2.png /
.flowouX16.pkl / .flowouX32.pkl / .stepan16), while the in-memory API is
channel-last (H, W, ...) numpy, matching the rest of this framework.
"""

from mft_tpu.io.flowou_codecs import read_flowou, write_flowou
from mft_tpu.io.cache import FlowCache
from mft_tpu.io.video import (
    GeneralVideoCapture,
    get_video_frames,
    get_video_length,
    VideoWriter,
)

__all__ = [
    "read_flowou", "write_flowou", "FlowCache",
    "GeneralVideoCapture", "get_video_frames", "get_video_length",
    "VideoWriter",
]
